"""Fused separable affine resample as a single Pallas TPU kernel.

This is the "fused lazy-resample Pallas kernel" of BASELINE.md (the TPU-native
re-think of monai/csrc/resample/pushpull_cuda.cu for the dominant axis-aligned
case: Spacing / Resize / Zoom / flips-with-scale).

Design: tile the output along Z; DMA the matching input z-slab HBM->VMEM; contract
z first (one banded MXU matmul), then the y- and x-interpolation matmuls per output
plane — all in VMEM, output written once.

MEASURED RESULT (v5e-1, 1x224x224x112 f32 -> 267x267x89 Spacing, order 1, HIGHEST
precision): this kernel 3.2 ms (14.9 GB/s in+out) vs the XLA einsum path
(ops/separable.py) 1.0 ms (46 GB/s). The einsum path wins: the op is MXU-compute-
bound at f32 HIGHEST (not HBM-bound as the kernel's design assumed), XLA already
fuses the three contractions efficiently, and the kernel's per-tile z-slabs overlap
(sz/(tz*scale) ~ 2.5x redundant HBM reads). Per the round-2 plan, the XLA einsum
path therefore REMAINS THE DEFAULT lazy-flush fast path; this kernel is kept as a
verified-correct alternative (exact vs the einsum path on all supported
orders/bounds) and as the scaffold for a future bf16 variant where the bandwidth
argument holds. The general (rotated) affine keeps the XLA gather path in
ops/resample.py — an arbitrary-gather Pallas kernel has no advantage on TPU (no
vector-gather unit); the MXU weight-matrix decomposition is where the hardware win
is, and it lives in ops/separable.py.

Restrictions: channel-first 3D input, diagonal affine (use ops/separable.py
``is_separable``), interpolation orders {0, 1, 3} and bounds zeros/border/reflection
(all encoded in the host-built per-axis weight matrices), float32 compute.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .separable import interp_matrix

__all__ = ["pallas_separable_resample_3d", "pallas_resample_available"]

_LANE = 128
_SUBLANE = 8


def pallas_resample_available(img, out_shape: Sequence[int]) -> bool:
    """Cheap feasibility check: 3D, fits the VMEM slab budget, on a TPU backend."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if img.ndim != 4 or len(out_shape) != 3:
        return False
    return True


def _band_params(W: np.ndarray, tz: int) -> tuple[np.ndarray, int]:
    """Per-z-tile input-slab offsets and the static slab size for a banded weight
    matrix W (n_out, n_in): rows of one output tile touch a contiguous input band."""
    n_out, n_in = W.shape
    nz = -(-n_out // tz)
    offs = np.zeros(nz, dtype=np.int32)
    span = 1
    nz_cols = [np.nonzero(W[i])[0] for i in range(n_out)]
    for t in range(nz):
        rows = range(t * tz, min((t + 1) * tz, n_out))
        cols = [nz_cols[i] for i in rows if nz_cols[i].size]
        if not cols:
            offs[t] = 0
            continue
        lo = min(int(c[0]) for c in cols)
        hi = max(int(c[-1]) for c in cols)
        offs[t] = lo
        span = max(span, hi - lo + 1)
    # round the slab up (sublane multiple) and clamp offsets so slabs stay in range
    span = min(n_in, -(-span // _SUBLANE) * _SUBLANE)
    offs = np.minimum(offs, max(n_in - span, 0))
    return offs, span


def _make_kernel(sz: int, tz: int, yin: int, xin: int, yout: int, xout: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(zoff_ref, wzb_ref, wy_ref, wx_ref, img_ref, out_ref, slab, sem):
        c = pl.program_id(0)
        t = pl.program_id(1)
        z0 = zoff_ref[t]
        # HBM -> VMEM: only the z-slab this output tile needs
        dma = pltpu.make_async_copy(img_ref.at[c, pl.ds(z0, sz)], slab, sem)
        dma.start()
        dma.wait()
        wzb = wzb_ref[0]  # (TZ, SZ) band weights, precomputed host-side
        # z-pass FIRST as ONE MXU matmul on the collapsed slab: (TZ, SZ) @ (SZ, Yin*Xin).
        # Contracting z before y/x means the per-plane matmuls below run exactly once
        # per output plane (no slab-overlap redundancy).
        zred = jnp.dot(wzb, slab[:].reshape(sz, yin * xin),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (TZ, Yin*Xin)
        for i in range(tz):
            plane = zred[i].reshape(yin, xin)
            # y-pass then x-pass on the MXU for this output plane
            row = jnp.dot(wy_ref[:], plane,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)        # (Yout, Xin)
            out_ref[0, i] = jnp.dot(row, wx_ref[:].T,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)  # (Yout, Xout)

    return kernel


_RUN_CACHE: dict = {}


def _build_call(c: int, zin: int, yin: int, xin: int, zout: int, yout: int, xout: int,
                sz: int, tz: int, nz: int, interpret: bool,
                yout_crop: int, xout_crop: int,
                zoff: np.ndarray, wzb_all: np.ndarray, wy: np.ndarray, wx: np.ndarray,
                key: tuple):
    """Jitted pad+kernel+crop closure with the interpolation weights baked in as
    constants (a remote-tunnel TPU pays a host->device round trip per argument)."""
    cached = _RUN_CACHE.get(key)
    if cached is not None:
        return cached
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_kernel(sz, tz, yin, xin, yout, xout)
    zout_pad = nz * tz
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # zoff
        grid=(c, nz),
        in_specs=[
            pl.BlockSpec((1, tz, sz), lambda ci, ti, *_: (ti, 0, 0)),  # per-tile z-band
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wy (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wx (full)
            pl.BlockSpec(memory_space=pltpu.ANY),   # img stays in HBM
        ],
        out_specs=pl.BlockSpec((1, tz, yout, xout), lambda ci, ti, *_: (ci, ti, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((sz, yin, xin), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, zout_pad, yout, xout), jnp.float32),
        interpret=interpret,
    )

    zoff_c = jnp.asarray(zoff)
    wzb_c = jnp.asarray(wzb_all)
    wy_c = jnp.asarray(wy)
    wx_c = jnp.asarray(wx)

    # ONE dispatch per resample: pad + kernel + crop fused in a single jit with the
    # weights as baked constants
    @jax.jit
    def run(img):
        ypad = yin - img.shape[2]
        xpad = xin - img.shape[3]
        img = img.astype(jnp.float32)
        if ypad or xpad:
            img = jnp.pad(img, ((0, 0), (0, 0), (0, ypad), (0, xpad)))
        out = call(zoff_c, wzb_c, wy_c, wx_c, img)
        return out[:, :zout, :yout_crop, :xout_crop]

    _RUN_CACHE[key] = run
    if len(_RUN_CACHE) > 64:
        _RUN_CACHE.pop(next(iter(_RUN_CACHE)))
    return run


def pallas_separable_resample_3d(img: Any, matrix: np.ndarray, out_shape: Sequence[int],
                                 order: int = 1, bound: str = "zeros",
                                 align_corners: bool = False, tz: int = 8,
                                 interpret: bool | None = None,
                                 vmem_budget: int = 10 * 2**20) -> Any:
    """Fused resample of channel-first (C, Z, Y, X) ``img`` by a diagonal affine.

    Numerically equal to ops/separable.py separable_affine_resample (same host-built
    weight matrices) and to ops/resample.py grid_pull for diagonal affines.
    Returns None when the configuration doesn't fit the kernel (caller falls back).
    """
    m = np.asarray(matrix, dtype=np.float64)
    if img.ndim != 4 or len(out_shape) != 3 or m.shape != (4, 4):
        return None
    C, zin, yin, xin = (int(s) for s in img.shape)
    zout, yout, xout = (int(s) for s in out_shape)
    Ws = [interp_matrix(int(img.shape[1 + d]), int(out_shape[d]), float(m[d, d]),
                        float(m[d, 3]), order, bound, align_corners) for d in range(3)]
    zoff, sz = _band_params(Ws[0], tz)

    # lane/sublane alignment: DMA slabs need the last dim 128-aligned and the
    # second-minor 8-aligned; pad x/y with zeros (weight matrices padded to match,
    # so padded cells contribute exactly 0) and crop the output
    def up(n, k):
        return -(-n // k) * k

    xin_p, xout_p = up(xin, _LANE), up(xout, _LANE)
    yin_p, yout_p = up(yin, _SUBLANE), up(yout, _SUBLANE)
    # VMEM budget: slab + x-pass + output tile
    vmem_needed = 4 * (sz * yin_p * xin_p + sz * yin_p * xout_p + 2 * tz * yout_p * xout_p)
    if vmem_needed > vmem_budget:
        return None
    nz = -(-zout // tz)
    wz_pad = np.zeros((nz * tz, zin), dtype=np.float32)
    wz_pad[:zout] = Ws[0]
    # per-tile z-band matrices (TZ, SZ), gathered host-side so the kernel never
    # dynamic-slices the lane dimension
    wzb_all = np.stack([wz_pad[t * tz:(t + 1) * tz, zoff[t]:zoff[t] + sz] for t in range(nz)])
    wy_p = np.zeros((yout_p, yin_p), dtype=np.float32)
    wy_p[:yout, :yin] = Ws[1]
    wx_p = np.zeros((xout_p, xin_p), dtype=np.float32)
    wx_p[:xout, :xin] = Ws[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = (C, zin, yin, xin, zout, yout, xout,
           float(m[0, 0]), float(m[1, 1]), float(m[2, 2]),
           float(m[0, 3]), float(m[1, 3]), float(m[2, 3]),
           order, bound, align_corners, tz, bool(interpret))
    run = _build_call(C, zin, yin_p, xin_p, zout, yout_p, xout_p, sz, tz, nz, bool(interpret),
                      yout, xout, zoff, wzb_all, wy_p, wx_p, key)
    out = run(jnp.asarray(img))
    if np.issubdtype(np.dtype(str(img.dtype)), np.floating) and out.dtype != img.dtype:
        out = out.astype(img.dtype)
    return out
