"""Bisect the real down0 pathology: the synthetic s1-conv+norm+act loop at
(72,48^3,16) runs ~1.7 ms (perf_grouped_conv.py) but the composed UNet spends
~12 ms in L0 norm reduce/apply fusions (perf_xprof.py packedunet). Hypothesis:
the (B,96^3,1) C=1 entry tensor admits no good layout, XLA anchors batch-minor
{0,4,3,2,1} there, and the choice propagates through every L0 tensor.

Variants of the full down0 residual unit (entry s2 conv 1->16 + IN + PReLU +
s1 conv 16->16 + IN + PReLU + 1^3-s2 residual conv + add), input (B,1,96,96,96)
NCDHW bf16 like the real executor:

  real      exactly the module composition (transpose -> convs channels-last)
  s2d       entry conv as space-to-depth (B,48^3,8) + 2^3 conv CI=8 (identical
            reduction set; kills the C=1 tensor)
  s2dfull   s2d + ALSO the residual conv from the s2d tensor (no C=1 anywhere)

Run: python scripts/perf_down0_bisect.py [B]

MEASURED (v5e, B=72, 2026-08-19):
  s2dfull vs real max|diff| = 5.04 (bf16 rounding scale on O(1e3) activations)
  real      8.799 ms
  s2dfull   9.388 ms

DEAD END: space-to-depth packing of the C=1 entry tensor neither matches
numerics cheaply nor beats the plain composition (9.4 vs 8.8 ms) — killing the
C=1 tensor does not change XLA's batch-minor layout choice for the CO=16 level.
The layout tax is paid only when the window batch is far from a multiple of
128; the landed fix is lane-aligned dispatch batching (see perf_grouped_conv.py
and bench.py VB=14). Do not retry s2d entry packing for eval.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, "/root/repo/scripts")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 72
S = 96
C = 16


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(fn, x, K1=1, K2=4, n=3):
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


from monai_tpu.networks.layers.fast_norm import fast_instance_norm


def prelu(z, alpha):
    return jnp.where(z > 0, z, alpha.astype(z.dtype) * z)


def main():
    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.rand(3, 3, 3, 1, C).astype(np.float32) * 0.2, jnp.bfloat16)
    w2 = jnp.asarray(rng.rand(3, 3, 3, C, C).astype(np.float32) * 0.05, jnp.bfloat16)
    wr = jnp.asarray(rng.rand(1, 1, 1, 1, C).astype(np.float32) * 0.2, jnp.bfloat16)
    a1 = jnp.asarray([0.25], jnp.float32)
    a2 = jnp.asarray([0.25], jnp.float32)
    x = jnp.asarray(rng.rand(B, 1, S, S, S).astype(np.float32), jnp.bfloat16)

    dn = ("NDHWC", "DHWIO", "NDHWC")

    def real(z):
        h = jnp.transpose(z, (0, 2, 3, 4, 1))  # channels-last (B,96^3,1)
        y = jax.lax.conv_general_dilated(h, w1, (2, 2, 2), "SAME", dimension_numbers=dn)
        y = prelu(fast_instance_norm(y), a1)
        y = jax.lax.conv_general_dilated(y, w2, (1, 1, 1), "SAME", dimension_numbers=dn)
        y = prelu(fast_instance_norm(y), a2)
        res = jax.lax.conv_general_dilated(h, wr, (2, 2, 2), "VALID", dimension_numbers=dn)
        return y + res

    # entry conv via space-to-depth: x (B,96^3) -> (B,48^3,8); a stride-2 3^3
    # conv's 27 taps live in the 2^3 coarse neighborhood of packed cells, so a
    # VALID 2^3 conv over the (front-padded) packed tensor has the identical
    # reduction set with CI=8
    def s2d_pack(z):
        v = z[:, 0]  # (B,96,96,96)
        v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, 1)))  # SAME halo for 3^3/s2
        # (B,98,98,98) -> coarse (B,49,49,49, 2,2,2): cell (c,p) = fine 2c+p
        v = v.reshape(B, 49, 2, 49, 2, 49, 2).transpose(0, 1, 3, 5, 2, 4, 6)
        return v.reshape(B, 49, 49, 49, 8)

    def w1_packed():
        # W'[(kd,kh,kw coarse 2^3), (pd,ph,pw parity 8), co] from w1[3,3,3,1,co]:
        # fine tap f = 2k + p - 1 in {-1,0,1}+... for output o, fine pos 2o-1+t,
        # t in 0..2; packed input cell index o + k (k in 0..1), parity p:
        # fine = 2(o+k)+p - 2 ... align: 2o-1+t = 2(o+k)+p-2  =>  t = 2k+p-1... wait
        # with the pad of 1, packed cell c=o+k holds fine index 2(o+k)+p-1; tap
        # t=fine-(2o-1) = 2k+p. t in 0..2 -> (k,p) in {(0,0),(0,1),(1,0)}.
        wp = np.zeros((2, 2, 2, 8, C), np.float32)
        w1n = np.asarray(w1, np.float32)
        for kd in range(2):
            for kh in range(2):
                for kw in range(2):
                    for pd in range(2):
                        for ph in range(2):
                            for pw in range(2):
                                td, th, tw = 2 * kd + pd, 2 * kh + ph, 2 * kw + pw
                                if td < 3 and th < 3 and tw < 3:
                                    p = pd * 4 + ph * 2 + pw
                                    wp[kd, kh, kw, p, :] = w1n[td, th, tw, 0, :]
        return jnp.asarray(wp, jnp.bfloat16)

    w1p = w1_packed()
    # residual 1^3 stride-2 conv reads fine (2o,2o,2o) = packed cell o parity 0
    wrp = np.zeros((1, 1, 1, 8, C), np.float32)
    # fine index 2o -> padded fine 2o+1 -> cell o... padded v[f]=x[f-1]:
    # x[2o] = v[2o+1] = cell o (since 2o+1 = 2*o + 1), parity (1,1,1) -> p=7
    wrp[0, 0, 0, 7, :] = np.asarray(wr, np.float32)[0, 0, 0, 0, :]
    wrp = jnp.asarray(wrp, jnp.bfloat16)

    def s2d(z, res_from_packed=False):
        hp = s2d_pack(z)  # (B,49,49,49,8)
        y = jax.lax.conv_general_dilated(hp, w1p, (1, 1, 1), "VALID", dimension_numbers=dn)
        y = prelu(fast_instance_norm(y), a1)
        y = jax.lax.conv_general_dilated(y, w2, (1, 1, 1), "SAME", dimension_numbers=dn)
        y = prelu(fast_instance_norm(y), a2)
        if res_from_packed:
            res = jax.lax.conv_general_dilated(hp[:, 1:, 1:, 1:], wrp, (1, 1, 1), "VALID",
                                               dimension_numbers=dn)
        else:
            h = jnp.transpose(z, (0, 2, 3, 4, 1))
            res = jax.lax.conv_general_dilated(h, wr, (2, 2, 2), "VALID", dimension_numbers=dn)
        return y + res

    y0 = real(x)
    y1 = s2d(x, res_from_packed=True)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    print(f"s2dfull vs real max|diff| = {err:.4f} (bf16 rounding scale)")

    for name, fn in [("real", real), ("s2dfull", lambda z: s2d(z, True))]:
        dt = slope(fn, x)
        print(f"{name:10s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
