"""Separable (axis-aligned) affine resampling as dense matmuls.

TPU-first optimization: the dominant medical resampling ops — Spacing, Resize, Zoom,
flips with scaling — have *diagonal* affine maps.  A diagonal resample factorizes into
one 1-D interpolation per axis:  out = W_d @ (W_h @ (W_w @ x))  where each ``W`` is an
(out_size, in_size) interpolation-weight matrix.  On TPU these are dense matmuls that
run on the MXU — replacing the 2^D-corner gather path (HBM-bound, scalarizing) with
pure systolic-array FLOPs.  This is the fused flush target the reference implements in
CUDA (monai/csrc/resample/) re-thought for the hardware.

Weight matrices are built host-side per (n_in, n_out, scale, offset, order, bound) and
LRU-cached; under jit they become compile-time constants.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.backend import is_jax

__all__ = ["interp_matrix", "separable_affine_resample", "is_separable"]


def _cubic_w(t: np.ndarray) -> list[np.ndarray]:
    a = -0.75
    d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t

    def w_near(d):
        return ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0

    def w_far(d):
        return ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a

    return [w_far(d0), w_near(d1), w_near(d2), w_far(d3)]


@lru_cache(maxsize=512)
def interp_matrix(n_in: int, n_out: int, scale: float, offset: float, order: int, bound: str,
                  align_corners: bool = False) -> np.ndarray:
    """Dense (n_out, n_in) 1-D interpolation matrix for in_coord = scale*out + offset.

    Coordinates are float64; exact .5-tie voxels may differ from a float32 gather path —
    inherent floating-point tie-breaking, not a correctness issue.
    """
    coords = scale * np.arange(n_out, dtype=np.float64) + offset
    W = np.zeros((n_out, n_in), dtype=np.float32)

    def place(idx, w):
        """Accumulate weight w at input index idx with boundary handling."""
        if bound == "zeros":
            valid = (idx >= 0) & (idx <= n_in - 1)
            idx = np.clip(idx, 0, n_in - 1)
            w = w * valid
        elif bound == "border":
            idx = np.clip(idx, 0, n_in - 1)
        else:  # reflection
            if n_in == 1:
                idx = np.zeros_like(idx)
            elif align_corners:
                period = 2 * (n_in - 1)
                idx = np.remainder(idx, period)
                idx = np.where(idx >= n_in - 1, period - idx, idx)
            else:
                period = 2 * n_in
                idx = np.remainder(idx, period)
                idx = np.where(idx >= n_in, period - 1 - idx, idx)
            idx = np.clip(idx, 0, n_in - 1)
        np.add.at(W, (np.arange(n_out), idx.astype(np.int64)), w.astype(np.float32))

    if order == 0:
        if bound == "border":
            c = np.clip(coords, 0.0, n_in - 1)
        elif bound == "reflection":
            # reflect continuous coordinate first (matches grid_pull order-0 semantics)
            c = coords
            if n_in > 1:
                if align_corners:
                    period = 2.0 * (n_in - 1)
                    c = np.remainder(c, period)
                    c = np.where(c >= n_in - 1, period - c, c)
                else:
                    period = 2.0 * n_in
                    c = np.remainder(c + 0.5, period)
                    c = np.where(c >= n_in, period - c, c) - 0.5
            c = np.clip(c, 0.0, n_in - 1)
        else:
            c = coords
        r = np.floor(c + 0.5)
        if bound == "zeros":
            valid = (r >= 0) & (r <= n_in - 1)
            r = np.clip(r, 0, n_in - 1)
            np.add.at(W, (np.arange(n_out), r.astype(np.int64)), valid.astype(np.float32))
        else:
            r = np.clip(r, 0, n_in - 1)
            np.add.at(W, (np.arange(n_out), r.astype(np.int64)), np.ones(n_out, dtype=np.float32))
        return W

    if order == 1:
        c = coords
        if bound == "border":
            c = np.clip(c, 0.0, n_in - 1)
        elif bound == "reflection" and n_in > 1:
            if align_corners:
                period = 2.0 * (n_in - 1)
                c = np.remainder(c, period)
                c = np.where(c >= n_in - 1, period - c, c)
            else:
                period = 2.0 * n_in
                c = np.remainder(c + 0.5, period)
                c = np.where(c >= n_in, period - c, c) - 0.5
                c = np.clip(c, 0.0, n_in - 1)
        f = np.floor(c)
        t = c - f
        place(f.astype(np.int64), 1.0 - t)
        place(f.astype(np.int64) + 1, t)
        return W

    if order == 3:
        f = np.floor(coords)
        t = coords - f
        ws = _cubic_w(t)
        for k, w in zip((-1, 0, 1, 2), ws):
            place(f.astype(np.int64) + k, w)
        return W

    raise ValueError(f"unsupported order {order}")


def is_separable(matrix: np.ndarray, atol: float = 1e-6) -> bool:
    """True if the linear part is diagonal (axis-aligned scaling, no rotation/shear)."""
    m = np.asarray(matrix, dtype=np.float64)
    d = m.shape[0] - 1
    L = m[:d, :d]
    off = L - np.diag(np.diag(L))
    return bool(np.all(np.abs(off) <= atol) and np.allclose(m[d, :d], 0, atol=atol)
                and np.isclose(m[d, d], 1, atol=atol))


def separable_affine_resample(img: Any, matrix: np.ndarray, out_shape: Sequence[int],
                              order: int = 1, bound: str = "zeros",
                              align_corners: bool = False) -> Any:
    """Resample channel-first ``img`` with a diagonal affine via per-axis matmuls."""
    m = np.asarray(matrix, dtype=np.float64)
    D = len(out_shape)
    in_shape = img.shape[1:]
    ns = jnp if is_jax(img) else np
    x = img
    orig_dtype = img.dtype
    # bf16 fast path: a bf16 input keeps the matmuls in bf16 at DEFAULT precision
    # (full-rate MXU, half the HBM bytes) with f32 accumulation per contraction;
    # f32/f64 inputs keep the parity-exact f32 HIGHEST path.
    bf16_path = is_jax(img) and x.dtype == jnp.bfloat16
    compute_dtype = (jnp.bfloat16 if bf16_path else jnp.float32) if is_jax(img) else np.float32
    x = x.astype(compute_dtype)
    for d in range(D):
        scale = float(m[d, d])
        offset = float(m[d, D])
        W = interp_matrix(int(in_shape[d]), int(out_shape[d]), scale, offset, order, bound,
                          align_corners)
        # contract input axis d+1 (after channel): out[..., i, ...] = sum_j W[i,j] x[..., j, ...]
        if ns is jnp:
            if bf16_path:
                Wd = jnp.asarray(W).astype(jnp.bfloat16)
                y = jax.lax.dot_general(Wd, x, (((1,), (d + 1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                x = ns.moveaxis(y.astype(jnp.bfloat16), 0, d + 1)
            else:
                x = ns.moveaxis(ns.tensordot(jnp.asarray(W), x, axes=(1, d + 1),
                                             precision=jax.lax.Precision.HIGHEST), 0, d + 1)
        else:
            x = ns.moveaxis(ns.tensordot(W, x, axes=(1, d + 1)), 0, d + 1)
    if np.issubdtype(np.dtype(str(orig_dtype)), np.floating):
        x = x.astype(orig_dtype)
    return x
