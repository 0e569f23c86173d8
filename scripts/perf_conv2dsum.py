"""A/B: 3D 3x3x3 conv vs sum-of-three-2D-convs formulation at UNet shallow shapes.
Two-K slope timing. Usage: python scripts/perf_conv2dsum.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def slope(fn, x, K1=2, K2=8, n=3):
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
    float(r1(x)); float(r2(x))
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); float(r1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(x)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (K2 - K1)


for B, S, C in [(18, 48, 16), (18, 96, 16), (18, 24, 32)]:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, S, S, C).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.rand(3, 3, 3, C, C).astype(np.float32) - 0.5) * 0.2).astype(jnp.bfloat16)
    fl = 2 * B * S**3 * 27 * C * C
    dn3 = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def conv3d(z):
        return jax.lax.conv_general_dilated(z, w, (1, 1, 1), "SAME", dimension_numbers=dn3)

    dn2 = jax.lax.conv_dimension_numbers((B * S, S, S, C), (3, 3, C, C),
                                         ("NHWC", "HWIO", "NHWC"))

    def conv2dsum(z):
        zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dz in range(3):
            sl = jax.lax.slice(zp, (0, dz, 0, 0, 0), (B, dz + S, S, S, C))
            pl = sl.reshape(B * S, S, S, C)
            y = jax.lax.conv_general_dilated(pl, w[dz], (1, 1), "SAME", dimension_numbers=dn2)
            acc = y if acc is None else acc + y
        return acc.reshape(B, S, S, S, C)

    # numerics check once
    a = np.asarray(jax.jit(conv3d)(x), np.float32)
    b = np.asarray(jax.jit(conv2dsum)(x), np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    t3 = slope(conv3d, x)
    t2 = slope(conv2dsum, x)
    print(f"S={S} C={C}: conv3d {t3*1e3:.2f} ms ({fl/t3/PEAK*100:.1f}%) | "
          f"2dsum {t2*1e3:.2f} ms ({fl/t2/PEAK*100:.1f}%) | rel err {err:.1e}", flush=True)
