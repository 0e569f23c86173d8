"""Instance-norm strategy probe on the real chip: the r3 trace showed the
per-channel stats reduce at C=2..16 is ~half the UNet forward. Candidates:

  groupnorm   nnx.GroupNorm(groups=C) (the old factory path)
  lane128     reshape (B, total/128, 128) reduce + lane fold (fast_norm r3 draft)
  plainred    two spatial reduces in f32, no reshape
  matmul      stats via dot_general with a ones vector (MXU does the reduction)
  matmul2     one dot for both moments: einsum on stacked [x, x^2] channels

Shapes: the bench UNet's norm sites. Two-K slope timing.
Run: python scripts/perf_norm_probe.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

SHAPES = [
    (18, 48, 48, 48, 16),
    (18, 96, 96, 96, 2),    # the CO=2 output-tail norm site (no norm after final conv
                            # in UNet, but nets with out-tail norms hit this)
    (18, 24, 24, 24, 32),
]


def gn_ref(x, eps=1e-5):
    return nnx.GroupNorm(num_features=x.shape[-1], num_groups=x.shape[-1], epsilon=eps,
                         use_bias=False, use_scale=False, rngs=nnx.Rngs(0))(x)


def plainred(x, eps=1e-5):
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    m = xf.mean(axis=axes, keepdims=True)
    v = jnp.maximum((xf * xf).mean(axis=axes, keepdims=True) - m * m, 0.0)
    return ((xf - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def lane128(x, eps=1e-5):
    from monai_tpu.networks.layers.fast_norm import fast_instance_norm

    return fast_instance_norm(x, eps=eps)


def matmul(x, eps=1e-5):
    b, c = x.shape[0], x.shape[-1]
    n_sp = int(np.prod(x.shape[1:-1]))
    flat = x.reshape(b, n_sp, c)
    ones = jnp.ones((n_sp,), jnp.float32)
    s = jnp.einsum("bsc,s->bc", flat, ones, preferred_element_type=jnp.float32)
    s2 = jnp.einsum("bsc,s->bc", (flat.astype(jnp.float32) * flat.astype(jnp.float32)),
                    ones, preferred_element_type=jnp.float32)
    m = (s / n_sp).reshape(b, *(1,) * (x.ndim - 2), c)
    v = jnp.maximum((s2 / n_sp).reshape(m.shape) - m * m, 0.0)
    return ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def matmul2(x, eps=1e-5):
    b, c = x.shape[0], x.shape[-1]
    n_sp = int(np.prod(x.shape[1:-1]))
    flat = x.reshape(b, n_sp, c).astype(jnp.float32)
    both = jnp.concatenate([flat, flat * flat], axis=-1)  # (b, s, 2c)
    ones = jnp.ones((n_sp,), jnp.float32)
    ss = jnp.einsum("bsc,s->bc", both, ones, preferred_element_type=jnp.float32)
    m = (ss[:, :c] / n_sp).reshape(b, *(1,) * (x.ndim - 2), c)
    v = jnp.maximum((ss[:, c:] / n_sp).reshape(m.shape) - m * m, 0.0)
    return ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def slope(fn, x, K1=4, K2=12, n=4):
    def chain(K):
        @jax.jit
        def run(x):
            acc = jnp.float32(0)
            for _ in range(K):
                y = fn(x)
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                x = x + 0.0 * s.astype(x.dtype)
            return acc
        return run

    r1, r2 = chain(K1), chain(K2)
    float(r1(x)); float(r2(x))
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); float(r1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(x)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (K2 - K1)


def main():
    rng = np.random.RandomState(0)
    for shape in SHAPES:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(jnp.bfloat16)
        nbytes = x.size * 2
        print(f"shape {shape}  ({nbytes/1e6:.1f} MB bf16)")
        for name, fn in [("groupnorm", gn_ref), ("plainred", plainred),
                         ("lane128", lane128), ("matmul", matmul), ("matmul2", matmul2)]:
            try:
                dt = slope(fn, x)
                # traffic: read x + write y (normalize pass) + stats read
                print(f"  {name:10s} {dt*1e3:8.3f} ms   {2*nbytes/dt/1e9:7.1f} GB/s (rw)")
            except Exception as e:
                print(f"  {name:10s} FAIL {str(e)[:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
