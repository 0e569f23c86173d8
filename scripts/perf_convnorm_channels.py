"""Which channel counts trigger the conv->norm layout pathology at 96^3?
conv(CI->CO) + instance norm, barrier off, CO in {8,16,24,32,48,64}; plus the
barrier variant for each. Decides the gate in ops/layout.py.

Run: python scripts/perf_convnorm_channels.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

B, S = 6, 96


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(fn, x, K1=1, K2=3, n=3):
    def chain(K):
        @jax.jit
        def run(x):
            acc = jnp.float32(0)
            z = x
            for _ in range(K):
                y = fn(z)
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                z = z + 0.0 * s.astype(z.dtype)
            return acc
        return run

    r1, r2 = chain(K1), chain(K2)
    _sync(r1(x)); _sync(r2(x))
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2(x)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (K2 - K1)


def norm(y):
    axes = tuple(range(1, y.ndim - 1))
    n_sp = int(np.prod([y.shape[d] for d in axes]))
    s = jnp.sum(y, axis=axes, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=axes)
    m = s / n_sp
    v = jnp.maximum(s2 / n_sp - m * m, 0.0)
    shp = (y.shape[0],) + (1,) * (y.ndim - 2) + (y.shape[-1],)
    return ((y.astype(jnp.float32) - m.reshape(shp)) * jax.lax.rsqrt(v + 1e-5).reshape(shp)
            ).astype(y.dtype)


rng = np.random.RandomState(0)
for CO in (8, 16, 24, 32, 48, 64):
    CI = CO
    x = jnp.asarray(rng.rand(B, S, S, S, CI).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, CI, CO).astype(np.float32)).astype(jnp.bfloat16) * 0.05
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def conv(z, w=w, dn=dn):
        return jax.lax.conv_general_dilated(z, w, (1, 1, 1), "SAME", dimension_numbers=dn)

    t0 = slope(lambda z: norm(conv(z)), x)
    t1 = slope(lambda z: norm(jax.lax.optimization_barrier(conv(z))), x)
    print(f"CO={CO}: conv+norm {t0*1e3:.2f} ms | +barrier {t1*1e3:.2f} ms", flush=True)
