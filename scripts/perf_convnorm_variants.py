"""Attack the conv->instance-norm composition pathology at (6, 96^3, CO=24):
the conv alone is ~0.4 ms and a clean norm should be ~1 ms (3 HBM passes), but
the composed program measures ~14.8 ms (layout copies + materialized f32, see
perf_xprof.py). Try formulations that give XLA a way out:

  fresh      norm on a default-layout input (no conv) — baseline for the norm itself
  current    conv -> fast_instance_norm
  reshape2d  conv -> reshape (B, S^3, C) -> norm over axis 1
  barrier    conv -> optimization_barrier -> norm
  matmul     moments via ones-vector dot_general (MXU does the reduce)
  bf16red    moments accumulated by XLA's native bf16->f32 reduce, no explicit converts
  convact    conv -> leakyrelu only (no norm) — is ANY consumer slow, or just reduces?

Run: python scripts/perf_convnorm_variants.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

B, S, CI, CO = 6, 96, 1, 24


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


rng = np.random.RandomState(0)
x1 = jnp.asarray(rng.rand(B, S, S, S, CI).astype(np.float32)).astype(jnp.bfloat16)
x24 = jnp.asarray(rng.rand(B, S, S, S, CO).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.rand(3, 3, 3, CI, CO).astype(np.float32)).astype(jnp.bfloat16) * 0.1
dn = jax.lax.conv_dimension_numbers(x1.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))


def conv(z):
    return jax.lax.conv_general_dilated(z, w, (1, 1, 1), "SAME", dimension_numbers=dn)


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


def norm2d(y):
    b, c = y.shape[0], y.shape[-1]
    y2 = y.reshape(b, -1, c)
    return norm(y2).reshape(y.shape)


def norm_matmul(y):
    b, c = y.shape[0], y.shape[-1]
    y2 = y.reshape(b, -1, c)
    n_sp = y2.shape[1]
    ones = jnp.ones((n_sp,), jnp.bfloat16)
    stacked = jnp.stack([y2, y2 * y2], 0)  # bf16 squares: rel err ~0.4%, f32 accum
    mom = jax.lax.dot_general(stacked, ones, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (2, b, c)
    m = mom[0] / n_sp
    v = jnp.maximum(mom[1] / n_sp - m * m, 0.0)
    shp = (b, 1, c)
    out = ((y2.astype(jnp.float32) - m.reshape(shp)) * jax.lax.rsqrt(v + 1e-5).reshape(shp))
    return out.astype(y.dtype).reshape(y.shape)


cases = [
    ("fresh", lambda z: norm(z + 1.0), x24),
    ("current", lambda z: norm(conv(z)), x1),
    ("reshape2d", lambda z: norm2d(conv(z)), x1),
    ("barrier", lambda z: norm(jax.lax.optimization_barrier(conv(z))), x1),
    ("matmul", lambda z: norm_matmul(conv(z)), x1),
    ("convact", lambda z: jax.nn.leaky_relu(conv(z)), x1),
    ("convnormact", lambda z: jax.nn.leaky_relu(norm(conv(z))), x1),
    ("reshape2d_act", lambda z: jax.nn.leaky_relu(norm2d(conv(z))), x1),
]
for name, fn, inp in cases:
    try:
        t = slope(fn, inp)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: ERR {str(e)[:140]}", flush=True)
