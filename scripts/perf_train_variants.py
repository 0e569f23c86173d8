"""A/B the bench UNet training step's implicated mechanisms on the real chip.

Motivation (r5): BENCH_r04 unet_train_mfu = 0.0122 vs a 0.1555 roofline; the
r4 xprof trace showed layout copies ~46% of the synchronous step timeline and
the instance-norm backward materializing full-size f32 x-hat tensors. The
eval-side fix (lane-aligned window batching, bench.py unet_sw) suggests the
train step's batch=4 tensors pay the same batch-minor lane padding.

Variants measured here (steps/s at the scan timing, MFU from the lowered
single-step FLOPs):
  - batch sweep 4 / 8 / 14 / 16: lane padding of the batch-minor layouts
  - norm-bwd: raw-moment backward (current) vs autodiff-of-forward
  - lane wgrad swap on/off (MONAI_TPU_NO_LANE_WGRAD=1)

Usage: python scripts/perf_train_variants.py [quick]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import optax
from flax import nnx

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")


def build_step(batch, channels_last=False, pack_tail=False, remat=False):
    from monai_tpu.losses import DiceCELoss
    from monai_tpu.networks.nets import UNet
    from monai_tpu.networks.nets.packed_unet import packed_unet_forward
    from monai_tpu.networks.utils import cast_params_to_compute

    net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
               channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
               rngs=nnx.Rngs(0))
    graphdef, params, rest = nnx.split(net, nnx.Param, ...)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    loss_fn = DiceCELoss(to_onehot_y=True, softmax=True, channels_last=channels_last)

    def step_fn(params, opt_state, x, y):
        def loss(p):
            p16 = cast_params_to_compute(p)
            net2 = nnx.merge(graphdef, p16, rest)
            xb16 = x.astype(jnp.bfloat16)
            if pack_tail:
                logits = packed_unet_forward(net2, xb16, pack_tail=True,
                                             pack_level0=False,
                                             channels_last=channels_last)
            elif channels_last:
                # TPU-native boundary: run the internal channels-last model and
                # keep the loss channels-last — no full-size logits transposes
                logits = net2.model(xb16)
            else:
                logits = net2(xb16)
            return loss_fn(logits, y)
        loss_f = jax.checkpoint(loss) if remat else loss
        l, grads = jax.value_and_grad(loss_f)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    shape = (batch, 96, 96, 96, 1) if channels_last else (batch, 1, 96, 96, 96)
    x = jax.random.uniform(jax.random.key(0), shape, jnp.float32)
    y = (jax.random.uniform(jax.random.key(1), shape) > 0.5).astype(jnp.float32)
    return step_fn, params, opt_state, x, y


def measure(batch, label, channels_last=False, pack_tail=False, remat=False):
    step_fn, params, opt_state, x, y = build_step(batch, channels_last, pack_tail, remat)
    try:
        cost = jax.jit(step_fn).lower(params, opt_state, x, y).cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    if not flops:
        # axon's lowered cost_analysis can come back empty; use the bench's
        # measured per-step count (BENCH_r04 unet_train_flops_per_step_g at
        # batch 4) scaled by batch. Packed-tail variants execute ~8x MACs on
        # the 2-channel tail but MFU must credit useful work (bench.py policy).
        flops = 137.1e9 / 4.0 * batch

    K = 6

    @jax.jit
    def chunk(params, opt_state, xs, ys):
        def body(carry, bxy):
            p, o = carry
            p, o, l = step_fn(p, o, bxy[0], bxy[1])
            return (p, o), l
        (params, opt_state), ls = jax.lax.scan(body, (params, opt_state), (xs, ys))
        return params, opt_state, jnp.sum(ls)

    def sync(v):
        # axon tunnel: block_until_ready does NOT wait for remote execution —
        # a scalar device_get is the only real barrier (bench.py _sync)
        return float(jax.device_get(jnp.ravel(v)[0]))

    xs = jnp.stack([x] * K)
    ys = jnp.stack([y] * K)
    params, opt_state, l = chunk(params, opt_state, xs, ys)
    sync(l)
    t0 = time.perf_counter()
    for _ in range(3):
        params, opt_state, l = chunk(params, opt_state, xs, ys)
    sync(l)
    dt = (time.perf_counter() - t0) / (3 * K)
    peak = 197e12
    mfu = flops / dt / peak if flops else 0.0
    print(f"{label:44s} batch={batch:2d} {1/dt:7.2f} steps/s {batch/dt:7.1f} patches/s "
          f"mfu={mfu:.4f} ({dt*1e3:.1f} ms/step)", flush=True)
    return 1 / dt, mfu


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    if mode == "quick":
        for b in (4, 16):
            measure(b, "raw-moment norm bwd (current)")
    elif mode == "cl":
        for b in (8, 16):
            measure(b, "channels-last step + CL loss", channels_last=True)
    elif mode == "packed":
        measure(16, "packed-tail + CL loss", channels_last=True, pack_tail=True)
        measure(16, "packed-tail + CF loss", channels_last=False, pack_tail=True)
    elif mode == "remat":
        measure(32, "remat whole-loss b32", remat=True)
        measure(64, "remat whole-loss b64", remat=True)
    elif mode == "b32":
        measure(32, "batch 32 standard")
        measure(32, "batch 32 packed-tail + CL", channels_last=True, pack_tail=True)
    elif mode == "b64":
        measure(64, "batch 64 remat packed CL", channels_last=True, pack_tail=True, remat=True)
    else:
        for b in (4, 8, 14, 16):
            measure(b, "raw-moment norm bwd (current)")
