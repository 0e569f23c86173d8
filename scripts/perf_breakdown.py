"""Per-stage breakdown of the north-star sliding-window UNet eval (VERDICT r2 #1a).

Times each stage with chained-K execution inside ONE jit so the ~30ms dispatch RPC
of the tunneled backend is amortised out, and reports:
  - dispatch RPC round-trip
  - full SW eval (batch-1 and batch-4 volumes)
  - window gather only
  - network forward only (the 18-window batch)
  - stitch (weighted scatter-add + normalise) only
  - per-level conv/norm/act cost at the exact UNet level shapes

Run: python scripts/perf_breakdown.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def timeit(fn, *args, n=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*args))
    return (time.perf_counter() - t0) / n


def chained(fn, x, K=8, n=3):
    """Time fn amortised over K chained applications inside one jit."""

    @jax.jit
    def run(x):
        acc = 0.0
        for _ in range(K):
            y = fn(x)
            s = jnp.mean(y.astype(jnp.float32))
            acc = acc + s
            x = x + 0.0 * s.astype(x.dtype)  # data dependence, no extra traffic
        return acc

    sync(run(x))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(run(x))
    per_call = (time.perf_counter() - t0) / n
    return per_call / K


def main():
    from monai_tpu.data.utils import dense_patch_slices
    from monai_tpu.inferers import SlidingWindowInferer
    from monai_tpu.inferers.utils import compute_scan_interval
    from monai_tpu.networks.nets import UNet

    out = {}

    # 0) dispatch RPC
    @jax.jit
    def triv(x):
        return x + 1.0

    z = jnp.zeros((8, 128), jnp.float32)
    out["dispatch_ms"] = timeit(triv, z, n=10) * 1e3

    # network setup (same as bench.py)
    net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
               channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
               rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(net)
    state_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        state)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    def predictor(w):
        return fwd(state_bf16, w.astype(jnp.bfloat16)).astype(jnp.float32)

    vol_shape, roi, overlap = (224, 224, 112), (96, 96, 96), 0.25
    interval = compute_scan_interval(vol_shape, roi, 3, (overlap,) * 3)
    num_windows = len(dense_patch_slices(vol_shape, roi, interval, return_slice=False))
    out["num_windows"] = num_windows
    inferer = SlidingWindowInferer(roi_size=roi, sw_batch_size=num_windows, overlap=overlap,
                                   mode="gaussian")

    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(1, 1, *vol_shape).astype(np.float32))
    vol4 = jnp.asarray(rng.rand(4, 1, *vol_shape).astype(np.float32))

    # 1) full eval
    out["full_b1_ms"] = timeit(lambda v: inferer(v, predictor), vol, n=5) * 1e3
    out["full_b4_ms"] = timeit(lambda v: inferer(v, predictor), vol4, n=3) * 1e3

    # 2) forward only, batch-18 windows (chained)
    win = jnp.asarray(rng.rand(num_windows, 1, *roi).astype(np.float32))

    def f_fwd(w):
        return predictor(w)

    out["forward18_ms"] = chained(f_fwd, win, K=6, n=3) * 1e3

    # forward in bf16 end-to-end (no f32 cast of output)
    def f_fwd_bf16(w):
        return fwd(state_bf16, w)

    win_bf = win.astype(jnp.bfloat16)
    out["forward18_bf16io_ms"] = chained(f_fwd_bf16, win_bf, K=6, n=3) * 1e3

    # 3) gather only: 18 dynamic slices from the volume
    starts = np.asarray([[s[0] for s in sl] for sl in
                         dense_patch_slices(vol_shape, roi, interval, return_slice=False)],
                        dtype=np.int32)
    starts_j = jnp.asarray(starts)

    def f_gather(v):
        def g(st):
            return jax.lax.dynamic_slice(v, (0, 0, st[0], st[1], st[2]), (1, 1) + roi)
        return jax.vmap(g)(starts_j)

    out["gather_ms"] = chained(f_gather, vol, K=8, n=3) * 1e3

    # 4) stitch only: weighted scatter of 18 fake predictions + normalise
    from monai_tpu.data.utils import compute_importance_map
    imp = jnp.asarray(compute_importance_map(roi, mode="gaussian", sigma_scale=0.125,
                                             dtype=np.float32))
    preds = jnp.asarray(rng.rand(num_windows, 1, 2, *roi).astype(np.float32))

    def f_stitch(p):
        out_img = jnp.zeros((1, 2) + vol_shape, jnp.float32)
        weighted = p * imp[None, None, None]

        def body(i, acc):
            st = starts_j[i]
            idx = (0, 0, st[0], st[1], st[2])
            cur = jax.lax.dynamic_slice(acc, idx, (1, 2) + roi)
            return jax.lax.dynamic_update_slice(acc, cur + weighted[i], idx)

        return jax.lax.fori_loop(0, num_windows, body, out_img)

    out["stitch_ms"] = chained(f_stitch, preds, K=4, n=3) * 1e3

    # 5) per-level blocks: ResidualUnit-shaped stacks at each level (batch 18)
    from monai_tpu.networks.blocks.convolutions import ResidualUnit
    levels = [  # (spatial, cin, cout, stride) — down path of the bench UNet
        (96, 1, 16, 2), (48, 16, 32, 2), (24, 32, 64, 2), (12, 64, 128, 2), (6, 128, 256, 1),
    ]
    lv = {}
    for s, ci, co, st in levels:
        ru = ResidualUnit(3, ci, co, strides=st, subunits=2, rngs=nnx.Rngs(0))
        gd, stt = nnx.split(ru)
        stt = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            stt)

        def f_ru(x, gd=gd, stt=stt):
            return nnx.merge(gd, stt)(x)

        x = jnp.asarray(rng.rand(num_windows, s, s, s, ci).astype(np.float32)).astype(jnp.bfloat16)
        t = chained(f_ru, x, K=8, n=3) * 1e3
        # FLOPs: subunit convs (2) + 1x1-or-3x3 residual conv
        so = s // st
        fl = 2 * (so ** 3) * 27 * (ci * co + co * co) + 2 * (so ** 3) * (27 if st > 1 else 1) * ci * co
        fl *= num_windows
        lv[f"L{s}_{ci}->{co}"] = {"ms": round(t, 3), "gflops": round(fl / 1e9, 1),
                                  "mfu_pct": round(fl / (t / 1e3) / 197e12 * 100, 2)}
    out["levels"] = lv

    # 6) bare conv at the two shallow shapes, conv vs conv+norm+act split
    from monai_tpu.networks.blocks.convolutions import Convolution
    for s, c in [(48, 16), (24, 32)]:
        x = jnp.asarray(rng.rand(num_windows, s, s, s, c).astype(np.float32)).astype(jnp.bfloat16)
        conv_only = Convolution(3, c, c, conv_only=True, rngs=nnx.Rngs(0))
        full = Convolution(3, c, c, rngs=nnx.Rngs(0))
        for tag, m in [("conv", conv_only), ("conv_norm_act", full)]:
            gd, stt = nnx.split(m)
            stt = jax.tree_util.tree_map(
                lambda q: q.astype(jnp.bfloat16) if hasattr(q, "dtype") and q.dtype == jnp.float32 else q,
                stt)

            def f(xx, gd=gd, stt=stt):
                return nnx.merge(gd, stt)(xx)

            t = chained(f, x, K=8, n=3) * 1e3
            fl = 2 * (s ** 3) * 27 * c * c * num_windows
            out[f"{tag}_{s}x{c}_ms"] = round(t, 3)
            out[f"{tag}_{s}x{c}_mfu_pct"] = round(fl / (t / 1e3) / 197e12 * 100, 2)

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
