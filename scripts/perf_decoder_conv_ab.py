"""A/B at the SwinUNETR decoder's pathological shapes (96^3 spatial, 24-48 ch):
XLA 3D conv vs sum-of-three-2D-convs vs the Pallas conv3d kernel vs convT options.

The swin breakdown (scripts/perf_swin_breakdown.py) showed encoder1 (96^3 CO=24)
at 76 ms and decoder1 (48->96) at 111 ms for batch 6 — 2.4-4.6 TFLOP/s, i.e.
~10x below the CO/128 lane ceiling. This probe isolates the conv formulations.

Run: python scripts/perf_decoder_conv_ab.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

PEAK = 197e12


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


def run_case(B, S, CI, CO):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, S, S, CI).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, CI, CO).astype(np.float32)).astype(jnp.bfloat16) * 0.05
    fl = 2 * B * S**3 * 27 * CI * CO
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def conv3d(x):
        return jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=dn)

    dn2 = jax.lax.conv_dimension_numbers((B * S, S, S, CI), (3, 3, CI, CO), ("NHWC", "HWIO", "NHWC"))

    def conv2dsum(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dz in range(3):
            sl = jax.lax.slice(xp, (0, dz, 0, 0, 0), (B, dz + S, S, S, CI))
            pl = sl.reshape(B * S, S, S, CI)
            y = jax.lax.conv_general_dilated(pl, w[dz], (1, 1), "SAME", dimension_numbers=dn2)
            acc = y if acc is None else acc + y
        return acc.reshape(B, S, S, S, CO)

    out = {"shape": f"B{B} {S}^3 {CI}->{CO}"}
    t = slope(conv3d, x)
    out["conv3d_ms"] = round(t * 1e3, 2)
    out["conv3d_mfu"] = round(fl / t / PEAK * 100, 2)
    t = slope(conv2dsum, x)
    out["conv2dsum_ms"] = round(t * 1e3, 2)
    out["conv2dsum_mfu"] = round(fl / t / PEAK * 100, 2)
    try:
        from monai_tpu.ops.pallas_conv3d import _conv3d_pallas_impl  # may not exist by this name
    except Exception:
        _conv3d_pallas_impl = None
    # numerics check
    y1 = jax.jit(conv3d)(x)
    y2 = jax.jit(conv2dsum)(x)
    out["maxerr"] = round(float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))), 4)
    print(out, flush=True)


def run_convT(B, S, CI, CO):
    """ConvTranspose 2^3 stride 2 (the UnetrUpBlock upsample), S -> 2S."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, S, S, CI).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(2, 2, 2, CI, CO).astype(np.float32)).astype(jnp.bfloat16) * 0.05
    fl = 2 * B * (2 * S) ** 3 * CI * CO  # each output voxel gets exactly one tap

    def convt(x):
        return jax.lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                                      dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def d2s(x):
        # equivalent: pointwise conv to 8*CO then depth-to-space
        wm = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(CI, 8 * CO)
        y = x @ wm  # (B,S,S,S,8*CO)
        y = y.reshape(B, S, S, S, 2, 2, 2, CO)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
        return y.reshape(B, 2 * S, 2 * S, 2 * S, CO)

    o = {"convT": f"B{B} {S}->{2*S} {CI}->{CO}"}
    t = slope(convt, x)
    o["lax_convT_ms"] = round(t * 1e3, 2)
    o["lax_convT_mfu"] = round(fl / t / PEAK * 100, 2)
    t = slope(d2s, x)
    o["d2s_ms"] = round(t * 1e3, 2)
    o["d2s_mfu"] = round(fl / t / PEAK * 100, 2)
    y1 = jax.jit(convt)(x)
    y2 = jax.jit(d2s)(x)
    o["maxerr"] = round(float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))), 4)
    print(o, flush=True)


if __name__ == "__main__":
    B = 6
    run_case(B, 96, 24, 24)   # encoder1 conv2 / decoder1 conv2
    run_case(B, 96, 48, 24)   # decoder1 conv1 (post-concat)
    run_case(B, 96, 1, 24)    # encoder1 conv1
    run_case(B, 48, 48, 24)   # decoder2 region
    run_convT(B, 48, 24, 24)  # decoder1 upsample
