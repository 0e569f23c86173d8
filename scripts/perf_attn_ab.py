"""A/B on the real chip: XLA materializing window attention vs the Pallas fused
kernel (ops/pallas_window_attention.py), at the SwinUNETR bench stage shapes.

Shapes per stage for 96^3 ROI, window 7^3 (N=343), feature 24, B ROIs in the
sliding-window batch:
  stage1: 48^3 -> pad 49^3 -> 343 windows/ROI, H=3
  stage2: 24^3 -> pad 28^3 ->  64 windows/ROI, H=6
  stage3: 12^3 -> pad 14^3 ->   8 windows/ROI, H=12
  stage4:  6^3 -> pad  7^3 ->   1 window /ROI, H=24
head_dim is 8 at every stage. Two-K slope timing.

Run: python scripts/perf_attn_ab.py [rois=6]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from monai_tpu.ops.pallas_window_attention import _fwd_pallas, _xla_window_attention, _pick_wb

ROIS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
N, D = 343, 8


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(fn, *args, K1=1, K2=3, n=3):
    def chain(K):
        @jax.jit
        def run(*a):
            acc = jnp.float32(0)
            a = list(a)
            for _ in range(K):
                y = fn(*a)
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                a[0] = a[0] + 0.0 * s.astype(a[0].dtype)
            return acc
        return run

    r1, r2 = chain(K1), chain(K2)
    _sync(r1(*args)); _sync(r2(*args))
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2(*args)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (K2 - K1)


for name, wpr, h, masked in [("stage1", 343, 3, True), ("stage2", 64, 6, True),
                             ("stage3", 8, 12, True), ("stage4", 1, 24, False)]:
    B = ROIS * wpr
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, h, N, D).astype(np.float32)).astype(jnp.bfloat16) * 0.35
    k = jnp.asarray(rng.randn(B, h, N, D).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, h, N, D).astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.asarray(rng.randn(h, N, N).astype(np.float32)) * 0.1
    mask = (jnp.asarray((rng.rand(wpr, N, N) > 0.5).astype(np.float32)) * -100.0
            if masked else None)

    t_x = slope(lambda q: _xla_window_attention(q, k, v, bias, mask), q)
    t_p = slope(lambda q: _fwd_pallas(q, k, v, bias, mask), q)
    y1 = jax.jit(lambda q: _xla_window_attention(q, k, v, bias, mask))(q)
    y2 = jax.jit(lambda q: _fwd_pallas(q, k, v, bias, mask))(q)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
    wb = _pick_wb(B, wpr if masked else 1, N)
    print(f"{name}: B={B} H={h} wb={wb}  xla {t_x*1e3:.2f} ms  pallas {t_p*1e3:.2f} ms "
          f"({t_x/t_p:.2f}x)  maxerr {err:.4f}", flush=True)
