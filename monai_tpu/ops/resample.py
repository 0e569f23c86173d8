"""N-D grid resampling (pull/push) — the framework's hottest kernel.

TPU-native replacement for the reference's C++/CUDA pushpull resampler
(monai/csrc/resample/pushpull_cpu.cpp, pushpull_cuda.cu; bound via
monai/networks/layers/spatial_transforms.py:35 grid_pull / grid_push) and for torch
``grid_sample`` (used by monai/transforms/spatial/functional.py:161-173).

Design: gather-based separable interpolation written against the numpy/jax.numpy shared
subset, so one implementation serves the host pipeline (numpy) and jitted device code
(XLA fuses the 2^D corner gathers + weighted sum).  ``grid_push`` is the adjoint (splat)
implemented with scatter-add; together they give exact custom gradients.

Coordinate convention: ``grid`` holds **voxel coordinates of the input** (not normalized
[-1, 1] like torch); the affine helpers below produce output-voxel → input-voxel maps.

Supported: interpolation order 0 (nearest), 1 (linear), 3 (cubic, Keys spline a=-0.5 —
matching torch 'bicubic'); padding modes zeros / border / reflection.
"""
from __future__ import annotations

import itertools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.backend import is_jax, xp

__all__ = ["grid_pull", "grid_push", "grid_count", "affine_grid", "affine_resample", "resolve_mode"]

_ORDER = {"nearest": 0, 0: 0, "bilinear": 1, "linear": 1, "trilinear": 1, 1: 1,
          "bicubic": 3, "cubic": 3, 3: 3}


def resolve_mode(mode: Any) -> int:
    """Map a mode name/order to an integer spline order."""
    if mode in _ORDER:
        return _ORDER[mode]
    raise ValueError(f"Unsupported interpolation mode: {mode!r}")


def _reflect(idx, n, align_corners: bool = False):
    """Reflect continuous coordinates (torch 'reflection' padding).

    align_corners=False: reflect about -0.5 and n-0.5; True: about 0 and n-1."""
    ns = xp(idx)
    if n == 1:
        return ns.zeros_like(idx)
    if align_corners:
        period = 2.0 * (n - 1)
        x = ns.remainder(idx, period)
        x = ns.where(x >= (n - 1), period - x, x)
        return ns.clip(x, 0.0, float(n - 1))
    x = idx + 0.5
    period = 2.0 * n
    x = ns.remainder(x, period)
    x = ns.where(x >= n, period - x, x)
    return ns.clip(x - 0.5, 0.0, float(n - 1))


def _prep_coords(coords, size: int, padding_mode: str, align_corners: bool = False):
    """Apply boundary handling to continuous coords along one dim.

    Returns (coords, inside_mask_or_None)."""
    ns = xp(coords)
    if padding_mode == "reflection":
        return _reflect(coords, size, align_corners), None
    if padding_mode == "border":
        return ns.clip(coords, 0.0, float(size - 1)), None
    # zeros: keep coords; mask handled per-corner
    return coords, True


def _reflect_tap(idx, n, align_corners: bool, ns):
    """Reflect integer tap indices into range (used by cubic, per-tap boundary)."""
    if n == 1:
        return ns.zeros_like(idx)
    if align_corners:
        period = 2 * (n - 1)
        x = ns.remainder(idx, period)
        return ns.where(x >= n - 1, period - x, x)
    period = 2 * n
    x = ns.remainder(idx, period)
    return ns.where(x >= n, period - 1 - x, x)


def _cubic_weights(t, ns):
    """Keys cubic convolution weights for fractional offset t in [0,1), a=-0.75
    (torch's bicubic coefficient).

    Returns weights for taps at offsets (-1, 0, 1, 2)."""
    a = -0.75
    # distances of the 4 taps from the sample point
    d0 = 1.0 + t   # tap at floor-1
    d1 = t         # tap at floor
    d2 = 1.0 - t   # tap at floor+1
    d3 = 2.0 - t   # tap at floor+2

    def w_near(d):
        return ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0

    def w_far(d):
        return ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a

    return [w_far(d0), w_near(d1), w_near(d2), w_far(d3)]


def grid_pull(input: Any, grid: Any, interpolation: Any = 1, bound: str = "zeros",
              align_corners: bool = False):
    """Sample ``input`` at continuous voxel coordinates ``grid``.

    Args:
        input: ``(C, *in_spatial)`` array.
        grid: ``(*out_spatial, D)`` voxel coordinates into ``in_spatial``.
        interpolation: 0 / 1 / 3 or mode name.
        bound: 'zeros' | 'border' | 'reflection'.
        align_corners: affects only the reflection boundary convention.

    Returns ``(C, *out_spatial)``.
    """
    order = resolve_mode(interpolation)
    ns = xp(input)
    D = grid.shape[-1]
    in_spatial = input.shape[1:]
    if len(in_spatial) != D:
        raise ValueError(f"grid last dim {D} != input spatial rank {len(in_spatial)}")
    C = input.shape[0]
    out_spatial = grid.shape[:-1]

    compute_dtype = ns.float32 if input.dtype not in (ns.float64,) else input.dtype
    grid = grid.astype(compute_dtype)
    inp = input.astype(compute_dtype)
    flat_in = inp.reshape(C, -1)
    strides = np.ones(D, dtype=np.int64)
    for d in range(D - 2, -1, -1):
        strides[d] = strides[d + 1] * in_spatial[d + 1]

    coords = [grid[..., d] for d in range(D)]

    if order == 0:
        idxs, masks = [], []
        for d in range(D):
            c, _ = _prep_coords(coords[d], in_spatial[d], bound, align_corners)
            r = ns.floor(c + 0.5)
            if bound == "zeros":
                masks.append((r >= 0) & (r <= in_spatial[d] - 1))
            idxs.append(ns.clip(r, 0, in_spatial[d] - 1).astype(ns.int32))
        flat_idx = sum(idxs[d] * int(strides[d]) for d in range(D))
        vals = ns.take(flat_in, flat_idx.reshape(-1), axis=1).reshape((C,) + tuple(out_spatial))
        if bound == "zeros" and masks:
            m = masks[0]
            for mm in masks[1:]:
                m = m & mm
            vals = vals * m.astype(vals.dtype)
        return vals.astype(input.dtype) if input.dtype != vals.dtype else vals

    if order == 1:
        base, frac = [], []
        for d in range(D):
            c, _ = _prep_coords(coords[d], in_spatial[d], bound, align_corners)
            f = ns.floor(c)
            base.append(f.astype(ns.int32))
            frac.append((c - f).astype(compute_dtype))
        out = None
        for corner in itertools.product((0, 1), repeat=D):
            w = None
            flat_idx = None
            mask = None
            for d, c_d in enumerate(corner):
                idx_d = base[d] + c_d
                w_d = frac[d] if c_d == 1 else (1.0 - frac[d])
                if bound == "zeros":
                    m_d = (idx_d >= 0) & (idx_d <= in_spatial[d] - 1)
                    mask = m_d if mask is None else (mask & m_d)
                idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                w = w_d if w is None else w * w_d
                contrib = idx_d * int(strides[d])
                flat_idx = contrib if flat_idx is None else flat_idx + contrib
            vals = ns.take(flat_in, flat_idx.reshape(-1), axis=1).reshape((C,) + tuple(out_spatial))
            if mask is not None:
                w = w * mask.astype(w.dtype)
            term = vals * w[None]
            out = term if out is None else out + term
        return out.astype(input.dtype) if np.issubdtype(np.dtype(input.dtype), np.floating) else out

    if order == 3:
        # torch bicubic semantics: fractional weights from the *unclamped* coordinate,
        # boundary handling applied per tap index (clip / reflect / zero-mask).
        base, weights = [], []
        for d in range(D):
            c = coords[d]
            f = ns.floor(c)
            t = (c - f).astype(compute_dtype)
            base.append(f.astype(ns.int32))
            weights.append(_cubic_weights(t, ns))
        out = None
        for corner in itertools.product((-1, 0, 1, 2), repeat=D):
            w = None
            flat_idx = None
            mask = None
            for d, c_d in enumerate(corner):
                idx_d = base[d] + c_d
                w_d = weights[d][c_d + 1]
                if bound == "zeros":
                    m_d = (idx_d >= 0) & (idx_d <= in_spatial[d] - 1)
                    mask = m_d if mask is None else (mask & m_d)
                    idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                elif bound == "reflection":
                    idx_d = _reflect_tap(idx_d, in_spatial[d], align_corners, ns)
                    idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                else:  # border
                    idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                w = w_d if w is None else w * w_d
                contrib = idx_d * int(strides[d])
                flat_idx = contrib if flat_idx is None else flat_idx + contrib
            vals = ns.take(flat_in, flat_idx.reshape(-1), axis=1).reshape((C,) + tuple(out_spatial))
            if mask is not None:
                w = w * mask.astype(w.dtype)
            term = vals * w[None]
            out = term if out is None else out + term
        return out.astype(input.dtype) if np.issubdtype(np.dtype(input.dtype), np.floating) else out

    raise ValueError(f"Unsupported interpolation order {order}")


def grid_push(input: Any, grid: Any, shape: Sequence[int], interpolation: Any = 1, bound: str = "zeros",
              align_corners: bool = False):
    """Splat ``input`` values at voxel coordinates ``grid`` into a ``(C, *shape)`` output.

    The adjoint of :func:`grid_pull` (reference: grid_push, spatial_transforms.py:159).
    Only the jax backend supports efficient scatter-add; numpy uses ``np.add.at``.
    """
    order = resolve_mode(interpolation)
    ns = xp(input)
    D = grid.shape[-1]
    C = input.shape[0]
    out_spatial = tuple(int(s) for s in shape)
    compute_dtype = ns.float32 if input.dtype not in (ns.float64,) else input.dtype
    inp = input.reshape(C, -1).astype(compute_dtype)
    npix = int(np.prod(out_spatial))
    strides = np.ones(D, dtype=np.int64)
    for d in range(D - 2, -1, -1):
        strides[d] = strides[d + 1] * out_spatial[d + 1]
    coords = [grid[..., d].reshape(-1) for d in range(D)]

    if order == 0:
        corners_iter = [(0,) * D]
    elif order == 1:
        corners_iter = list(itertools.product((0, 1), repeat=D))
    else:
        corners_iter = list(itertools.product((-1, 0, 1, 2), repeat=D))

    base, frac, cweights = [], [], []
    for d in range(D):
        c, _ = _prep_coords(coords[d], out_spatial[d], bound, align_corners)
        if order == 0:
            f = ns.floor(c + 0.5)
            base.append(f.astype(ns.int32))
            frac.append(None)
        else:
            f = ns.floor(c)
            base.append(f.astype(ns.int32))
            frac.append((c - f).astype(compute_dtype))
    if order == 3:
        cweights = [_cubic_weights(frac[d], ns) for d in range(D)]

    if is_jax(input):
        out = jnp.zeros((C, npix), dtype=compute_dtype)
    else:
        out = np.zeros((C, npix), dtype=compute_dtype)

    for corner in corners_iter:
        w = None
        flat_idx = None
        mask = None
        for d, c_d in enumerate(corner):
            idx_d = base[d] + c_d
            if order == 0:
                w_d = 1.0
            elif order == 1:
                w_d = frac[d] if c_d == 1 else (1.0 - frac[d])
            else:
                w_d = cweights[d][c_d + 1]
            m_d = (idx_d >= 0) & (idx_d <= out_spatial[d] - 1)
            mask = m_d if mask is None else (mask & m_d)
            idx_d = ns.clip(idx_d, 0, out_spatial[d] - 1)
            if w is None:
                w = w_d if not isinstance(w_d, float) else None
            else:
                w = w * w_d if not isinstance(w_d, float) else w
            contrib = idx_d * int(strides[d])
            flat_idx = contrib if flat_idx is None else flat_idx + contrib
        if w is None:
            w = ns.ones_like(coords[0])
        w = w * mask.astype(compute_dtype)
        contrib_vals = inp * w[None]
        if is_jax(input):
            out = out.at[:, flat_idx].add(contrib_vals)
        else:
            np.add.at(out, (slice(None), flat_idx), contrib_vals)
    return out.reshape((C,) + out_spatial)


def grid_count(grid: Any, shape: Sequence[int], interpolation: Any = 1, bound: str = "zeros"):
    """Splat ones — the normalization map for grid_push (reference: grid_count)."""
    ns = xp(grid)
    ones = ns.ones((1,) + tuple(grid.shape[:-1]), dtype=ns.float32).reshape(1, -1)
    flat_grid = grid.reshape(-1, grid.shape[-1])
    return grid_push(ones.reshape(1, -1), flat_grid, shape, interpolation, bound)[0]


def affine_grid(matrix: Any, out_shape: Sequence[int]):
    """Build a voxel-coordinate sampling grid from an output→input affine map.

    ``matrix`` is (D+1, D+1) (homogeneous); returns grid of shape (*out_shape, D) with
    grid[idx] = (matrix @ [idx, 1])[:D].
    """
    ns = jnp if is_jax(matrix) else np
    D = len(out_shape)
    m = matrix.astype(ns.float32 if ns is jnp else np.float64)
    ranges = [np.arange(s, dtype=np.float32) for s in out_shape]
    mesh = np.meshgrid(*ranges, indexing="ij")  # list of (out_shape)
    mesh = np.stack(mesh, axis=-1)  # (*out_shape, D)
    if ns is jnp:
        mesh = jnp.asarray(mesh)
    # grid = mesh @ A^T + b
    A = m[:D, :D]
    b = m[:D, D]
    grid = ns.tensordot(mesh, A.T, axes=1) + b
    return grid


def affine_resample(img: Any, matrix: Any, out_shape: Sequence[int], mode: Any = 1,
                    padding_mode: str = "zeros", align_corners: bool = False):
    """Resample channel-first ``img`` with output-voxel→input-voxel affine ``matrix``.

    This is the fused flush target of the lazy-resampling engine (the reference composes
    pending affines then calls one grid_sample — monai/transforms/lazy/functional.py:196).
    """
    grid = affine_grid(matrix if is_jax(img) else np.asarray(matrix, dtype=np.float64), tuple(out_shape))
    if is_jax(img) and not is_jax(grid):
        grid = jnp.asarray(grid)
    return grid_pull(img, grid, interpolation=mode, bound=padding_mode, align_corners=align_corners)


# jit-compiled TPU path for batched affine resample (used by dataloader device offload)
@jax.jit
def _affine_resample_jit(img, grid):
    return grid_pull(img, grid, interpolation=1, bound="zeros")


def grid_grad(input: Any, grid: Any, interpolation: Any = 1, bound: str = "zeros",
              align_corners: bool = False):
    """Spatial gradient of ``grid_pull`` w.r.t. the sampling coordinates
    (reference: monai/networks/layers/spatial_transforms.py grid_grad / csrc pushpull).

    Each output point depends only on its own grid coordinate, so the per-point
    Jacobian is obtained from one reverse-mode pass per channel.

    Args:
        input: ``(C, *in_spatial)`` array.
        grid: ``(*out_spatial, D)`` voxel coordinates.

    Returns ``(C, *out_spatial, D)``.
    """
    import jax

    def per_channel(inp_c):
        return jax.grad(lambda g: jnp.sum(grid_pull(inp_c[None], g, interpolation,
                                                    bound, align_corners)))(grid)

    return jax.vmap(per_channel)(jnp.asarray(input))
