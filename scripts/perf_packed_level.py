"""Per-conv time inventory of the bench UNet + packed-equivalent A/Bs (r3 lever).

Times every conv of UNet (16,32,64,128,256)x(2,2,2,2) res_units=2 at batch 18
bf16 individually (two-K slope, RPC-free), then the space-to-depth packed
equivalent for the lane-starved ones. Decision rule: packing a conv whose fine
achieved-MFU is m wins iff inflation x m < packed-achieved ~0.69 (measured
12^3x128 XLA). Run: python scripts/perf_packed_level.py [B=18]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 18
PEAK = 197e12
DTYPE = jnp.bfloat16
rng = np.random.RandomState(0)


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(make, K1=2, K2=8, n=3):
    r1, r2 = make(K1), make(K2)
    _sync(r1()); _sync(r2())
    t1, t2 = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1()); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2()); t2.append(time.perf_counter() - t0)
    return (min(t2) - min(t1)) / (K2 - K1)


def arr(*shape):
    return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(DTYPE)


def time_conv(s_in, ci, co, k=3, stride=1, transposed=False):
    x = arr(B, s_in, s_in, s_in, ci)
    w = arr(k, k, k, ci, co)

    def make(K):
        @jax.jit
        def run(x=x, w=w):
            acc = jnp.float32(0)
            h = x
            for _ in range(K):
                if transposed:
                    y = lax.conv_transpose(h, w, (stride,) * 3, "SAME",
                                           dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                else:
                    y = lax.conv_general_dilated(h, w, (stride,) * 3, "SAME",
                                                 dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                h = h + 0.0 * s.astype(h.dtype)
            return acc
        return lambda: run()

    if transposed:
        flops = B * 2 * s_in**3 * k**3 * ci * co  # on input grid
    else:
        out_sp = s_in // stride
        flops = B * 2 * out_sp**3 * k**3 * ci * co
    dt = slope(make)
    return dt, flops


# ---- fine inventory: (name, s_in, ci, co, k, stride, transposed, count)
FINE = [
    ("dn0.conv1 96->48 1->16   s2", 96, 1, 16, 3, 2, False, 1),
    ("dn0.conv2 48    16->16     ", 48, 16, 16, 3, 1, False, 1),
    ("dn0.res   96->48 1->16   s2", 96, 1, 16, 3, 2, False, 1),
    ("dn1.conv1 48->24 16->32  s2", 48, 16, 32, 3, 2, False, 1),
    ("dn1.conv2 24    32->32     ", 24, 32, 32, 3, 1, False, 1),
    ("dn1.res   48->24 16->32  s2", 48, 16, 32, 3, 2, False, 1),
    ("dn2.conv1 24->12 32->64  s2", 24, 32, 64, 3, 2, False, 1),
    ("dn2.conv2 12    64->64     ", 12, 64, 64, 3, 1, False, 1),
    ("dn2.res   24->12 32->64  s2", 24, 32, 64, 3, 2, False, 1),
    ("dn3.conv1 12->6  64->128 s2", 12, 64, 128, 3, 2, False, 1),
    ("dn3.conv2 6     128->128   ", 6, 128, 128, 3, 1, False, 1),
    ("dn3.res   12->6  64->128 s2", 12, 64, 128, 3, 2, False, 1),
    ("bot.conv1 6     128->256   ", 6, 128, 256, 3, 1, False, 1),
    ("bot.conv2 6     256->256   ", 6, 256, 256, 3, 1, False, 1),
    ("up3.convT 6->12  384->64 s2", 6, 384, 64, 3, 2, True, 1),
    ("up3.ru    12    64->64     ", 12, 64, 64, 3, 1, False, 1),
    ("up2.convT 12->24 128->32 s2", 12, 128, 32, 3, 2, True, 1),
    ("up2.ru    24    32->32     ", 24, 32, 32, 3, 1, False, 1),
    ("up1.convT 24->48 64->16  s2", 24, 64, 16, 3, 2, True, 1),
    ("up1.ru    48    16->16     ", 48, 16, 16, 3, 1, False, 1),
    ("up0.convT 48->96 32->2   s2", 48, 32, 2, 3, 2, True, 1),
    ("up0.ru    96    2->2       ", 96, 2, 2, 3, 1, False, 1),
]

tot = 0.0
rows = []
for name, s, ci, co, k, st, tr, n in FINE:
    dt, fl = time_conv(s, ci, co, k, st, tr)
    tot += dt * n
    rows.append((name, dt, fl))
    print(f"{name}  {dt*1e3:7.3f} ms  {fl/dt/PEAK*100:6.2f}% MFU")
print(f"{'TOTAL conv time':28s}  {tot*1e3:7.3f} ms   (forward18 measured ~33 ms)")

# ---- packed equivalents of the top lane-starved ops
print("\n-- packed equivalents --")
PACKED = [
    # dn0.conv2 fine 48^3 16->16  => coarse 24^3 128->128 k3 (8x MACs);
    # up1.ru has the identical shape
    ("P dn0.conv2 24  128->128 k3   (8.0x)", 24, 128, 128, 3, 1, False),
    # up1.convT 64->16 => packed-in(p2 of 48-grid? in is 24-grid fine) ->
    # packed-out k2 s1 64->128 at 24^3 (2.37x MACs)
    ("P up1.convT 24  64->128  k2  (2.37x)", 24, 64, 128, 2, 1, False),
    # up0.convT 32->2 => packed-out k2 s1 32->16 at 48^3 (2.37x, CO still 16)
    ("P up0.convT 48  32->16   k2  (2.37x)", 48, 32, 16, 2, 1, False),
    # ... with packed input too (p2: 24^3 x 256 in) and p4-packed out (128ch)
    ("P2 up0.convT 24 256->128 k2 (37.9x)", 24, 256, 128, 2, 1, False),
    # up0.ru fine 96^3 2->2 => coarse 48^3 16->16 k3 (8x MACs)
    ("P up0.ru    48  16->16   k3   (8.0x)", 48, 16, 16, 3, 1, False),
    # ... p=4 pack: 24^3 128->128 k2 (37.9x MACs)
    ("P2 up0.ru   24  128->128 k2  (37.9x)", 24, 128, 128, 2, 1, False),
    # dn0.conv1 96->48 1->16 s2 => packed-out: k5 s4 1->128 at 24^3 (4.6x)
    ("P dn0.conv1 96->24 1->128 k5s4 (4.6x)", 96, 1, 128, 5, 4, False),
    # dn1.conv1 fine s2 16->32 => packed-in(24^3x128) packed-out(12^3x256) k3 s2 (8x)
    ("P dn1.conv1 24->12 128->256 k3s2 (8x)", 24, 128, 256, 3, 2, False),
]
for name, s, ci, co, k, st, tr in PACKED:
    dt, fl = time_conv(s, ci, co, k, st, tr)
    print(f"{name}  {dt*1e3:7.3f} ms  {fl/dt/PEAK*100:6.2f}% MFU")

# s2d/d2s costs at the two interface shapes
def s2d_cost(s, c):
    x = arr(B, s, s, s, c)

    def make(K):
        @jax.jit
        def run(x=x):
            acc = jnp.float32(0)
            h = x
            for _ in range(K):
                n, d, hh, w, cc = h.shape
                p = h.reshape(n, d // 2, 2, hh // 2, 2, w // 2, 2, cc)
                p = p.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(n, d // 2, hh // 2, w // 2, 8 * cc)
                q = p.reshape(n, d // 2, hh // 2, w // 2, 2, 2, 2, cc)
                q = q.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(n, d, hh, w, cc)
                s_ = jnp.ravel(q)[0].astype(jnp.float32)
                acc += s_
                h = q + 0.0 * s_.astype(h.dtype)
            return acc
        return lambda: run()
    return slope(make)


for s, c in [(48, 16), (96, 2), (24, 128)]:
    dt = s2d_cost(s, c)
    byt = 4 * B * s**3 * c * 2
    print(f"s2d+d2s roundtrip {s}^3x{c:3d}   {dt*1e3:7.3f} ms  {byt/dt/1e9:6.1f} GB/s")
