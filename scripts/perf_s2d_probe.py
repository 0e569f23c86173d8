"""A/B probe: plain XLA 3D conv vs space-to-depth packed dense conv.

s2d(2) maps x (B, D,H,W, C) -> (B, D/2,H/2,W/2, 8C); a fine 3x3x3 stride-1 SAME
conv becomes a coarse 3x3x3 conv with dense (8C, 8C) weights built from the fine
(27, C, C) weights (exactly one (T, a_in) per (t, a_out) per dim). 8x the MACs,
but the 128-lane MXU is fully used instead of 16/128.

Run: python scripts/perf_s2d_probe.py <S> <C> [B]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

S = int(sys.argv[1]) if len(sys.argv) > 1 else 48
C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
B = int(sys.argv[3]) if len(sys.argv) > 3 else 18
PEAK = 197e12


def pack_weights(w):
    """w (3,3,3,CI,CO) fine -> (3,3,3, 8CI, 8CO) coarse dense (numpy, host)."""
    CI, CO = w.shape[3], w.shape[4]
    wp = np.zeros((3, 3, 3, 8 * CI, 8 * CO), w.dtype)
    # per-dim maps: for fine tap t (-1..1) and out parity ao: T = floor((ao+t)/2),
    # ai = (ao+t) % 2
    for tz in (-1, 0, 1):
        for ty in (-1, 0, 1):
            for tx in (-1, 0, 1):
                for aoz in (0, 1):
                    for aoy in (0, 1):
                        for aox in (0, 1):
                            Tz, aiz = (aoz + tz) // 2, (aoz + tz) % 2
                            Ty, aiy = (aoy + ty) // 2, (aoy + ty) % 2
                            Tx, aix = (aox + tx) // 2, (aox + tx) % 2
                            ai = ((aiz * 2 + aiy) * 2 + aix)
                            ao = ((aoz * 2 + aoy) * 2 + aox)
                            wp[Tz + 1, Ty + 1, Tx + 1,
                               ai * CI:(ai + 1) * CI, ao * CO:(ao + 1) * CO] += \
                                w[tz + 1, ty + 1, tx + 1]
    return wp


def s2d(x):
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, D // 2, H // 2, W // 2, 8 * C)


def d2s(x):
    B, D, H, W, C8 = x.shape
    C = C8 // 8
    x = x.reshape(B, D, H, W, 2, 2, 2, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, 2 * D, 2 * H, 2 * W, C)


def main():
    rng = np.random.RandomState(0)
    x = rng.rand(B, S, S, S, C).astype(np.float32) - 0.5
    w = (rng.rand(3, 3, 3, C, C).astype(np.float32) - 0.5) * 0.2
    wp = pack_weights(w)

    xd = jnp.asarray(x).astype(jnp.bfloat16)
    wd = jnp.asarray(w).astype(jnp.bfloat16)
    wpd = jnp.asarray(wp).astype(jnp.bfloat16)
    fl = 2 * B * S**3 * 27 * C * C

    dn = jax.lax.conv_dimension_numbers(xd.shape, wd.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def conv_plain(x):
        return jax.lax.conv_general_dilated(x, wd, (1, 1, 1), "SAME", dimension_numbers=dn)

    pshape = (B, S // 2, S // 2, S // 2, 8 * C)
    dnp = jax.lax.conv_dimension_numbers(pshape, wpd.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def conv_packed_full(x):  # includes s2d/un-s2d transposes
        xp = s2d(x)
        yp = jax.lax.conv_general_dilated(xp, wpd, (1, 1, 1), "SAME", dimension_numbers=dnp)
        return d2s(yp)

    def conv_packed_core(xp):  # packed-resident (s2d amortised across a block)
        return jax.lax.conv_general_dilated(xp, wpd, (1, 1, 1), "SAME", dimension_numbers=dnp)

    # numerics check (f32 on this backend)
    y0 = np.asarray(jax.jit(conv_plain)(jnp.asarray(x).astype(jnp.bfloat16)), np.float32)
    y1 = np.asarray(jax.jit(conv_packed_full)(jnp.asarray(x).astype(jnp.bfloat16)), np.float32)
    err = np.max(np.abs(y0 - y1)) / (np.max(np.abs(y0)) + 1e-9)
    print(f"rel err plain vs packed: {err:.2e}", flush=True)

    def timed(fn, arg, K=8, n=3):
        @jax.jit
        def run(a):
            z = a
            for _ in range(K):
                z = fn(z)
            return jnp.ravel(z)[0].astype(jnp.float32)

        float(run(arg))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(run(arg))
            ts.append(time.perf_counter() - t0)
        # subtract dispatch via K-scaling: t = d + K*per; use second measurement at 2K
        return min(ts) / K

    tp = timed(conv_plain, xd)
    tf = timed(conv_packed_full, xd)
    xpd = jnp.asarray(s2d(x)).astype(jnp.bfloat16)
    tc = timed(conv_packed_core, xpd)
    d = 0.030  # nominal dispatch; report raw too
    for tag, t in [("plain", tp), ("packed_full", tf), ("packed_core", tc)]:
        t_true = t - d / 8
        print(f"{tag}: raw {t*1e3:.3f} ms  (dispatch-corr {t_true*1e3:.3f} ms, "
              f"useful mfu {fl/t_true/PEAK*100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
