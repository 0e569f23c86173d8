"""Pallas TPU kernel for 3x3x3 stride-1 SAME 3D convolution (channels-last).

Why: XLA's conv3d lowering is launch/tiling-bound at the small-spatial, high-channel
shapes that dominate the deep levels of 3D UNets and latent diffusion/VAE nets.
This kernel rebuilds the conv as ONE large-contraction matmul per depth plane:

    xcol (M/P, 27*128) @ W_blockdiag (27*128, P*CO)

with P = 128 // CI spatial positions packed per 128-lane row and the weights
expanded block-diagonally (W_big[t, u*CI+ci, v*CO+co] = w[t,ci,co] * delta_uv), so
every structural dim is 128-aligned: full k-tiles, full output lanes. The kw (width)
taps are pre-shifted into three input copies at the XLA level so all in-kernel tap
reads are whole-row (sublane) offsets. xcol lives only in VMEM.

Measured on v5e (K=64 chained timing, RPC-corrected, batch-18 volumes):

    shape           XLA conv3d      this kernel
    48^3 x 16ch     3.23 ms (4.3%)  7.07 ms (2.0%)   <- XLA wins (shallow levels)
    24^3 x 32ch     0.55 ms (13%)   1.45 ms (4.8%)
    12^3 x 64ch     0.134 ms (26%)  0.248 ms (14%)
    12^3 x 128ch    0.203 ms (69%)  0.370 ms (38%)
    6^3  x 128ch    0.102 ms (17%)  0.083 ms (21%)   <- only pallas win (+19%)
    3^3  x 256ch    0.058 ms (15%)  0.075 ms (12%)

Verdict: XLA's conv emitter, measured honestly with amortised dispatch, is the
faster path at every shape that matters (it performs the same im2col restructuring
internally with a better software pipeline); the one winning regime (6^3 x >=128ch)
is <1% of UNet runtime. The kernel is therefore OPT-IN (MONAI_TPU_PALLAS_CONV=1)
and kept as the scaffold for future Mosaic tuning; the default conv path stays
lax.conv_general_dilated. Numerics: exact match to the XLA conv in f32; bf16
differs only by accumulate rounding.

Scope: kernel 3^3, stride 1, dilation 1, SAME padding — res-unit convs. Everything
else falls back to lax.conv_general_dilated. Backward uses the XLA path via
jax.custom_vjp (flipped-kernel conv for dx, correlation for dw).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["conv3d_3x3_same", "use_pallas_conv"]

_VMEM_LIMIT = 100 * 1024 * 1024


def use_pallas_conv() -> bool:
    """OPT-IN: set MONAI_TPU_PALLAS_CONV=1 to enable on TPU (see module docstring:
    XLA's conv emitter measured faster at production shapes, so default is off)."""
    if os.environ.get("MONAI_TPU_PALLAS_CONV", "0") != "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _pallas_wins(n, d, h, w, ci, co) -> bool:
    """Shape heuristic from v5e measurements: the packed-matmul kernel beats XLA's
    conv emitter at small spatial extents with channels >= 64; XLA wins on the
    large shallow planes (its pipelined emitter amortises better there)."""
    if ci < 64 or ci > 512 or co > 512:
        return False
    if h != w:  # measured square-plane regime only; be conservative
        return False
    return h <= 8 and d <= 8  # only the 6^3 x >=128ch regime measured a win


def _supported(x_shape, w_shape) -> bool:
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    kd, kh, kw, ci, co = w_shape
    if (kd, kh, kw) != (3, 3, 3):
        return False
    n, d, h, w, cix = x_shape
    if cix != ci or d < 1:
        return False
    p = max(1, 128 // ci)
    wp = -(-(w + 2) // p) * p
    m4 = h * wp // p
    lc = p * ci
    if (m4 * 27 * lc * 2) > 12 * 1024 * 1024:  # xcol VMEM budget
        return False
    return True


@functools.lru_cache(maxsize=64)
def _build_call(n, d, h, w, ci, co, db, dtype_name):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    P = max(1, 128 // ci)
    LC = P * ci
    Wp = -(-(w + 2) // P) * P
    M = h * Wp
    M4 = M // P
    PR = (h + 2) * Wp
    PR4 = PR // P
    JO = P * co

    def kernel(c0, c1, c2, h0, h1, h2, wref, out, xcol):
        copies = (c0, c1, c2)
        halos = (h0, h1, h2)
        for d_loc in range(db):
            for kd in range(3):
                dd = d_loc + kd
                for kw_ in range(3):
                    src = copies[kw_][0, dd] if dd < db else halos[kw_][0, dd - db]
                    for kh in range(3):
                        t = kd * 9 + kh * 3 + kw_
                        off = kh * (Wp // P)
                        xcol[:, t * LC:(t + 1) * LC] = src[off:off + M4, :]
            acc = jnp.dot(xcol[:], wref[:], preferred_element_type=jnp.float32)
            out[0, d_loc] = acc.astype(out.dtype)

    interpret = os.environ.get("MONAI_TPU_PALLAS_INTERPRET") == "1"  # CPU testing
    return pl.pallas_call(
        kernel, grid=(n, d // db),
        in_specs=[pl.BlockSpec((1, db, PR4, LC), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM) for _ in range(3)] +
                 [pl.BlockSpec((1, 2, PR4, LC), lambda i, j: (i, (j * db + db) // 2, 0, 0),
                               memory_space=pltpu.VMEM) for _ in range(3)] +
                 [pl.BlockSpec((27 * LC, JO), lambda i, j: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, db, M4, JO), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, M4, JO), dtype),
        scratch_shapes=[pltpu.VMEM((M4, 27 * LC), dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def _conv3d_pallas_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    d_orig = x.shape[1]
    if d_orig % 2 == 1:
        # the halo BlockSpec addresses planes in steps of 2, so the depth-block
        # size must be even — pad one zero plane and trim the extra output
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    n, d, h, ww, ci = x.shape
    co = w.shape[-1]
    P = max(1, 128 // ci)
    LC = P * ci
    Wp = -(-(ww + 2) // P) * P
    PR4 = (h + 2) * Wp // P
    db = next(b for b in (4, 2) if d % b == 0)

    copies = []
    for kw_ in range(3):
        # copy_kw[w'] := x[w' + kw - 1], zero-padded to width Wp
        pad_l = max(0, 1 - kw_)
        start = max(0, kw_ - 1)
        take = min(ww - start, Wp - pad_l)
        c = x[:, :, :, start:start + take, :]
        c = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (pad_l, Wp - pad_l - take), (0, 0)))
        copies.append(c.reshape(n, d + 2, PR4, LC))
    wflat = w.reshape(27, ci, co)
    eye = jnp.eye(P, dtype=w.dtype)
    wbig = jnp.einsum("uv,tic->tuivc", eye, wflat).reshape(27 * LC, P * co)
    call = _build_call(n, d, h, ww, ci, co, db, x.dtype.name)
    y = call(copies[0], copies[1], copies[2], copies[0], copies[1], copies[2], wbig)
    return y.reshape(n, d, h, Wp, co)[:, :d_orig, :, :ww, :]


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.custom_vjp
def conv3d_3x3_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """3D conv, kernel 3^3, stride 1, SAME; channels-last NDHWC / DHWIO.

    Pallas forward on TPU when the shape is in the kernel's winning regime
    (`_pallas_wins`); XLA otherwise. Gradients always use XLA convolutions, so
    this is a drop-in replacement under jit and grad.
    """
    return _conv3d_impl(x, w)


def _conv3d_impl(x, w):
    n, d, h, ww, ci = x.shape
    co = w.shape[-1]
    if use_pallas_conv() and _supported(x.shape, w.shape) and _pallas_wins(n, d, h, ww, ci, co):
        try:
            return _conv3d_pallas_fwd(x, w)
        except Exception:  # pragma: no cover - lowering unavailable on this backend
            return _xla_conv(x, w)
    return _xla_conv(x, w)


def _conv3d_fwd_rule(x, w):
    return _conv3d_impl(x, w), (x, w)


def _conv3d_bwd_rule(res, g):
    x, w = res
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = jax.lax.conv_general_dilated(
        g, w_flip, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    dw = jax.lax.conv_general_dilated(
        x.transpose(4, 1, 2, 3, 0),
        g.transpose(1, 2, 3, 0, 4),
        (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).transpose(1, 2, 3, 0, 4)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_3x3_same.defvjp(_conv3d_fwd_rule, _conv3d_bwd_rule)
