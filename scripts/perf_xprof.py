"""Capture a jax.profiler trace of a callable and print per-HLO-op device times,
parsed straight out of the XSpace protobuf (tensorboard-plugin-profile's
xplane_pb2). Used to diagnose composition pathologies the slope-timing probes
can't see inside one jit program.

Usage: python scripts/perf_xprof.py <case>    # case in {convnorm, block, unet, swin}
"""
import glob
import os
import shutil
import sys
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

TRACE_DIR = "/tmp/xprof_trace"


def parse_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError("no xplane.pb produced")
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    per_op = defaultdict(float)
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps / 1e9  # -> ms
    return per_op, sorted(paths)[-1]


def report(per_op, top=30):
    total = sum(per_op.values())
    print(f"total device-event time {total:.2f} ms (sum over lines; overlaps double-count)")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:8.3f} ms  {name[:110]}")
    # async copy/slice starts overlap compute (double-counted above); the
    # synchronous op classes below are the real serial timeline
    sync = {k: v for k, v in per_op.items()
            if "-start" not in k and "-done" not in k and not k.startswith(("jit_", "0", "1", "2", "3"))}
    print(f"\n== synchronous ops only (total {sum(sync.values()):.2f} ms) ==")
    for name, ms in sorted(sync.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:8.3f} ms  {name[:130]}")


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "convnorm"
    B, S = 6, 96
    if case in ("unet", "packedunet"):
        B = int(os.environ.get("XPROF_B", "18"))
    rng = np.random.RandomState(0)

    if case in ("convnorm", "block"):
        from monai_tpu.networks.blocks.dynunet_block import UnetrBasicBlock

        blk = UnetrBasicBlock(3, 1, 24, 3, 1, ("instance", {"affine": True}), True,
                              rngs=nnx.Rngs(0))
        graphdef, state = nnx.split(blk)
        state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            state)
        m = nnx.merge(graphdef, state)
        rb = m.layer
        x = jnp.asarray(rng.rand(B, S, S, S, 1).astype(np.float32)).astype(jnp.bfloat16)
        if case == "convnorm":
            fn = jax.jit(lambda z: rb.norm1(rb.conv1(z)))
        else:
            fn = jax.jit(lambda z: rb(z))
    elif case == "sw":
        # the exact bench unet_sw workload: batch-4 volumes through the
        # SlidingWindowInferer (one jit program: gather + 72-window forward +
        # separable stitch), bf16 predictor with f32 in/out casts
        import bench as benchmod

        predictor, fwd, state_bf16, plain_fwd = benchmod.build_unet_predictor()
        from monai_tpu.inferers import SlidingWindowInferer

        inferer = SlidingWindowInferer(roi_size=(96, 96, 96), sw_batch_size=18,
                                       overlap=0.25, mode="gaussian")
        x = jnp.asarray(rng.rand(4, 1, 224, 224, 112).astype(np.float32))
        fn = lambda z: inferer(z, predictor)  # noqa: E731
    elif case == "swin":
        from monai_tpu.networks.nets import SwinUNETR

        net = SwinUNETR(in_channels=1, out_channels=14, feature_size=24, spatial_dims=3,
                        rngs=nnx.Rngs(0))
        graphdef, state = nnx.split(net)
        state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            state)
        x = jnp.asarray(rng.rand(B, 1, S, S, S).astype(np.float32)).astype(jnp.bfloat16)
        fn = jax.jit(lambda z: nnx.merge(graphdef, state)(z))
    elif case == "train":
        # the exact bench train step (bench.py bench_unet_train): batch-4 96^3,
        # value_and_grad(DiceCE) + adamw, donated params/opt state
        import optax

        from monai_tpu.losses import DiceCELoss
        from monai_tpu.networks.nets import UNet

        net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
                   channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
                   rngs=nnx.Rngs(0))
        from monai_tpu.networks.utils import cast_params_to_compute

        graphdef, params, rest = nnx.split(net, nnx.Param, ...)
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)
        loss_fn = DiceCELoss(to_onehot_y=True, softmax=True)

        def step_fn(params, opt_state, x, y):
            def loss(p):
                p16 = cast_params_to_compute(p)
                logits = nnx.merge(graphdef, p16, rest)(x.astype(jnp.bfloat16))
                return loss_fn(logits, y)

            l, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax as _o

            return _o.apply_updates(params, updates), opt_state, l

        step = jax.jit(step_fn)
        TB = int(os.environ.get("XPROF_TRAIN_B", "4"))
        xb = jnp.asarray(rng.rand(TB, 1, S, S, S).astype(np.float32))
        yb = jnp.asarray((rng.rand(TB, 1, S, S, S) > 0.5).astype(np.float32))

        state_box = {"p": params, "o": opt_state}

        def fn(_z):
            p, o, l = step(state_box["p"], state_box["o"], xb, yb)
            state_box["p"], state_box["o"] = p, o
            return l

        x = jnp.zeros((1,), jnp.float32)
    else:  # unet | packedunet (the bench sliding-window executor, pack_tail=True)
        from monai_tpu.networks.nets import UNet

        net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
                   channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
                   rngs=nnx.Rngs(0))
        graphdef, state = nnx.split(net)
        state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            state)
        x = jnp.asarray(rng.rand(B, 1, S, S, S).astype(np.float32)).astype(jnp.bfloat16)
        if case == "packedunet":
            from monai_tpu.networks.nets.packed_unet import packed_unet_forward

            fn = jax.jit(lambda z: packed_unet_forward(
                nnx.merge(graphdef, state), z, pack_tail=True, pack_level0=False))
        else:
            fn = jax.jit(lambda z: nnx.merge(graphdef, state)(z))

    r = fn(x)
    float(jax.device_get(jnp.ravel(r)[0]))
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(2):
            r = fn(x)
        float(jax.device_get(jnp.ravel(r)[0]))
    per_op, path = parse_xspace(TRACE_DIR)
    print("parsed", path)
    report(per_op)


if __name__ == "__main__":
    main()
