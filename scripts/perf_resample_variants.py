"""Probe separable-resample contraction variants on the real chip (r3: the bf16
path measured SLOWER than f32 HIGHEST — find the layout that wins).

Shapes = bench_transform_resample: (1,224,224,112) <-> (1,267,267,89).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from monai_tpu.ops.separable import interp_matrix

dn, up = (224, 224, 112), (267, 267, 89)
Ws_up = [interp_matrix(dn[d], up[d], dn[d] / up[d], 0.0, 1, "zeros", False) for d in range(3)]
Ws_dn = [interp_matrix(up[d], dn[d], up[d] / dn[d], 0.0, 1, "zeros", False) for d in range(3)]


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(make, K1=1, K2=5, n=3):
    r1, r2 = make(K1), make(K2)
    _sync(r1()); _sync(r2())
    t1, t2 = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1()); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2()); t2.append(time.perf_counter() - t0)
    return (min(t2) - min(t1)) / (K2 - K1) / 2  # per resample (up+down per K)


def variant_tensordot(dtype, prec):
    Wu = [jnp.asarray(W).astype(dtype) for W in Ws_up]
    Wd = [jnp.asarray(W).astype(dtype) for W in Ws_dn]

    def one(x, Ws):
        for d in range(3):
            x = jnp.moveaxis(jnp.tensordot(Ws[d], x, axes=(1, d + 1), precision=prec), 0, d + 1)
        return x

    def make(K):
        @jax.jit
        def run(x):
            for _ in range(K):
                y = one(x, Wu)
                x = one(y, Wd)
            return x
        x0 = jnp.zeros((1, *dn), dtype)
        return lambda: run(x0)
    return make


def variant_minor_matmul(dtype, prec):
    """Always contract the MINOR axis: moveaxis d+1 -> -1, matmul with W.T, result
    stays minor; cycle so after 3 steps axes are restored."""
    Wu = [jnp.asarray(W.T).astype(dtype) for W in Ws_up]
    Wd = [jnp.asarray(W.T).astype(dtype) for W in Ws_dn]

    def make(K):
        @jax.jit
        def run(x):
            for _ in range(K):
                h = x
                for Wt in Wu:
                    # contract current axis-1 by rotating it to minor first
                    h = jnp.moveaxis(h, 1, -1) @ Wt  # (c, s2, s3, out_d)
                # after 3 rotations axis order restored: (c, d0', d1', d2')
                g = h
                for Wt in Wd:
                    g = jnp.moveaxis(g, 1, -1) @ Wt
                x = g
            return x
        x0 = jnp.zeros((1, *dn), dtype)
        return lambda: run(x0)
    return make


def variant_einsum3(dtype, prec):
    Wu = [jnp.asarray(W).astype(dtype) for W in Ws_up]
    Wd = [jnp.asarray(W).astype(dtype) for W in Ws_dn]

    def make(K):
        @jax.jit
        def run(x):
            for _ in range(K):
                y = jnp.einsum("za,yb,xc,nabc->nzyx", *Wu, x, precision=prec)
                x = jnp.einsum("za,yb,xc,nabc->nzyx", *Wd, y, precision=prec)
            return x
        x0 = jnp.zeros((1, *dn), dtype)
        return lambda: run(x0)
    return make


nbytes = {"f32": 4, "bf16": 2}
for name, fn in [("tensordot", variant_tensordot), ("minor-mm", variant_minor_matmul),
                 ("einsum3", variant_einsum3)]:
    for dt_name, dtype, prec in [("f32", jnp.float32, jax.lax.Precision.HIGHEST),
                                 ("bf16", jnp.bfloat16, jax.lax.Precision.DEFAULT)]:
        try:
            dt = slope(fn(dtype, prec))
            byt = (int(np.prod(dn)) + int(np.prod(up))) * nbytes[dt_name]
            print(f"{name:10s} {dt_name:5s} {dt*1e3:7.3f} ms/resample  {byt/dt/1e9:6.1f} GB/s")
        except Exception as e:
            print(f"{name:10s} {dt_name:5s} ERROR {str(e)[:120]}")
