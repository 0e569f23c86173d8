"""Probe: can feature_group_count fold the window batch into channels at the
lane-starved UNet levels (CO<=16/32), so every tensor is (1, D, H, W, B*C)
lane-dense and instance norm becomes a clean per-channel reduce?

The pathology being attacked (perf_xprof.py packedunet, B=72): XLA picks
batch-minor layouts {0,4,3,2,1} for CO=16 conv outputs -> 72->128 lane padding
inflates every L0 tensor 1.78x (7.1x at B=18) and the instance-norm moment
reduces + applies run at ~50-300 GB/s effective, ~12 ms of a 30.7 ms forward.

Cases at (B=72, 48^3, CI=16 -> CO=16, 3^3 SAME, then instance-norm+prelu):
  plain        conv NDHWC B=72 + fast_instance_norm      (today's path)
  grouped      conv (1,48^3,72*16) fgc=72, tiled weights + per-channel norm
  groupednorm  grouped conv, stats only (is the apply or the conv the win?)

Run: python scripts/perf_grouped_conv.py [B]

MEASURED (v5e, B=72, 2026-08-19 — this closes the line):
  conv plain                  4.816 ms    22.86 TF/s (11.60% MFU)
  conv grouped               10.846 ms    10.15 TF/s ( 5.15% MFU)
  plain conv+norm+act         1.708 ms    64.45 TF/s (32.72% MFU)   <- synthetic loop
  grouped conv+norm+act     148.945 ms     0.74 TF/s ( 0.38% MFU)
  grouped == plain: True (numerics fine; performance is the dead end)

DEAD END: XLA lowers feature_group_count=72 3D convs ~2.2x slower than the
plain batched conv, and the per-channel norm over the folded (1,48^3,72*16)
tensor is catastrophic (149 ms) — the fused-norm epilogue XLA builds for the
batched layout does not exist for the folded one. Do NOT retry channel-folding.
The same run shows the REAL lever: the synthetic conv+norm+act loop at the
exact L0 shape hits 32.7% MFU — XLA's codegen is fine when the window batch is
a multiple of 128 lanes; the fix that landed is lane-aligned volume batching in
the sliding-window dispatch (bench.py VB=14 -> 252 windows ~= 2*128), which
took the bench 58 -> 120.5 vols/s (unet_mfu 0.050 -> 0.104).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 72
S, C = 48, 16


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(fn, x, K1=1, K2=5, n=3):
    def chain(K):
        @jax.jit
        def run(z):
            acc = jnp.float32(0)
            for _ in range(K):
                y = fn(z)
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                z = z + 0.0 * s.astype(z.dtype)
            return acc
        return lambda: run(x)
    r1, r2 = chain(K1), chain(K2)
    _sync(r1()), _sync(r2())
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2()); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (K2 - K1)


def norm_prelu(y, axes, c_axis_size, alpha=0.25, eps=1e-5):
    m = jnp.mean(y.astype(jnp.float32), axis=axes, keepdims=True)
    m2 = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=axes, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m), 0.0) + eps)
    z = ((y.astype(jnp.float32) - m) * inv).astype(y.dtype)
    return jnp.where(z > 0, z, alpha * z)


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.rand(3, 3, 3, C, C).astype(np.float32) * 0.1, jnp.bfloat16)
    x5 = jnp.asarray(rng.rand(B, S, S, S, C).astype(np.float32), jnp.bfloat16)
    xg = jnp.asarray(np.moveaxis(np.asarray(x5, np.float32), 0, -2)
                     .reshape(1, S, S, S, B * C), jnp.bfloat16)
    wg = jnp.asarray(np.tile(np.asarray(w, np.float32), (1, 1, 1, 1, B)), jnp.bfloat16)

    def conv_plain(z):
        return jax.lax.conv_general_dilated(
            z, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def conv_grouped(z):
        return jax.lax.conv_general_dilated(
            z, wg, (1, 1, 1), "SAME", feature_group_count=B,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def plain_full(z):
        return norm_prelu(conv_plain(z), axes=(1, 2, 3), c_axis_size=C)

    def grouped_full(z):
        return norm_prelu(conv_grouped(z), axes=(1, 2, 3), c_axis_size=B * C)

    gf = 2 * B * S**3 * 27 * C * C / 1e9
    for name, fn, xx in [("conv plain", conv_plain, x5), ("conv grouped", conv_grouped, xg),
                         ("plain conv+norm+act", plain_full, x5),
                         ("grouped conv+norm+act", grouped_full, xg)]:
        dt = slope(fn, xx)
        print(f"{name:24s} {dt*1e3:8.3f} ms   {gf/dt/1e3:6.2f} TF/s ({gf/dt/197e3*100:5.2f}% MFU)",
              flush=True)

    # numerics check (f32, small)
    wsm = jnp.asarray(rng.rand(3, 3, 3, C, C).astype(np.float32))
    xs = jnp.asarray(rng.rand(3, 8, 8, 8, C).astype(np.float32))
    ys = jax.lax.conv_general_dilated(xs, wsm, (1, 1, 1), "SAME",
                                      dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    xsg = jnp.moveaxis(xs, 0, -2).reshape(1, 8, 8, 8, 3 * C)
    wsg = jnp.tile(wsm, (1, 1, 1, 1, 3))
    ysg = jax.lax.conv_general_dilated(xsg, wsg, (1, 1, 1), "SAME", feature_group_count=3,
                                       dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ysg = jnp.moveaxis(ysg.reshape(1, 8, 8, 8, 3, C)[0], -2, 0)
    print("grouped == plain:", bool(jnp.allclose(ys, ysg, atol=1e-4)))


if __name__ == "__main__":
    main()
