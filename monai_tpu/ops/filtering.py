"""Bilateral / guided high-dimensional filtering.

TPU-native replacement for the reference's C++/CUDA filters
(monai/csrc/filtering/bilateral/*, permutohedral/*, trainable_bilateral/*):

- ``bilateral_filter`` brute-force: window-shifted weighted sums — a static O(k^D) loop
  of elementwise ops that XLA fuses; fully differentiable (the reference needed a
  hand-written backward for its trainable variant — here autodiff gives it for free).
- ``bilateral_grid_filter`` (fast path): the splat-blur-slice bilateral grid — the
  regular-grid variant of the permutohedral lattice, which maps onto TPU (dense
  scatter/gather on a coarse grid + separable convs) far better than a hash lattice.
"""
from __future__ import annotations

import itertools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bilateral_filter", "bilateral_grid_filter", "phl_filter"]


def _gauss(x, sigma):
    return jnp.exp(-0.5 * (x / sigma) ** 2)


def bilateral_filter(img: jnp.ndarray, spatial_sigma: float = 5.0, color_sigma: float = 0.5,
                     fast_approx: bool = False, truncate: float = 2.0,
                     use_pallas: bool = False) -> jnp.ndarray:
    """Bilateral filter on (B, C, *spatial) arrays (reference:
    monai/networks/layers/filtering.py:23 BilateralFilter).

    fast_approx=True uses the bilateral-grid path (reference's PHL mode analog).
    use_pallas=True routes through the hand-written Pallas VMEM-slab kernel
    (ops/pallas_filtering.py) — numerically identical to this XLA stencil; XLA's
    own fusion is already near speed-of-light for this pattern, so the Pallas path
    is mainly a reference TPU kernel and escape hatch, not a default.
    """
    if fast_approx:
        return bilateral_grid_filter(img, spatial_sigma, color_sigma)
    if use_pallas:
        from .pallas_filtering import bilateral_filter_pallas

        out = bilateral_filter_pallas(img, spatial_sigma, color_sigma, truncate)
        if out is not None:
            return out
    img = jnp.asarray(img)
    sd = img.ndim - 2
    radius = max(int(truncate * spatial_sigma + 0.5), 1)
    offsets = list(itertools.product(range(-radius, radius + 1), repeat=sd))
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    pad = [(0, 0), (0, 0)] + [(radius, radius)] * sd
    padded = jnp.pad(img, pad, mode="edge")
    spatial = img.shape[2:]
    for off in offsets:
        w_s = math.exp(-0.5 * sum(o * o for o in off) / (spatial_sigma**2))
        slicer = [slice(None), slice(None)] + [slice(radius + o, radius + o + s)
                                               for o, s in zip(off, spatial)]
        shifted = padded[tuple(slicer)]
        w_c = _gauss(shifted - img, color_sigma)
        w = w_s * w_c
        num = num + w * shifted
        den = den + w
    return num / jnp.maximum(den, 1e-8)


def bilateral_grid_filter(img: jnp.ndarray, spatial_sigma: float = 5.0, color_sigma: float = 0.5,
                          grid_pad: int = 2) -> jnp.ndarray:
    """Splat-blur-slice bilateral grid (Chen et al.) — the TPU-friendly fast bilateral.

    Each channel is processed with its own intensity axis. Downsample rates follow the
    sigmas so the blur on the grid is a fixed small separable gaussian.
    """
    from .gaussian import gaussian_filter

    img = jnp.asarray(img)
    b, c = img.shape[:2]
    spatial = img.shape[2:]
    sd = len(spatial)
    s_rate = max(spatial_sigma, 1.0)
    c_rate = max(color_sigma, 1e-3)

    def _one(x):  # (*(spatial)) single channel
        mn = jnp.min(x)
        mx = jnp.max(x)
        rng = jnp.maximum(mx - mn, 1e-8)
        # grid sizes
        gdims = tuple(int(np.ceil(s / s_rate)) + 2 * grid_pad for s in spatial)
        gint = int(np.ceil(1.0 / c_rate)) + 2 * grid_pad
        # coordinates of each voxel in the grid
        coords = [jnp.arange(s) / s_rate + grid_pad for s in spatial]
        mesh = jnp.meshgrid(*coords, indexing="ij")
        zc = (x - mn) / rng / c_rate + grid_pad
        idxs = [jnp.round(m).astype(jnp.int32) for m in mesh] + [jnp.round(zc).astype(jnp.int32)]
        flat_idx = idxs[0]
        strides = []
        dims_all = gdims + (gint,)
        stride = 1
        for dsz in reversed(dims_all):
            strides.insert(0, stride)
            stride *= dsz
        flat_idx = sum(idx * s for idx, s in zip(idxs, strides))
        total = int(np.prod(dims_all))
        # splat data and weights
        data_grid = jnp.zeros((total,), x.dtype).at[flat_idx.reshape(-1)].add(x.reshape(-1))
        w_grid = jnp.zeros((total,), x.dtype).at[flat_idx.reshape(-1)].add(jnp.ones_like(x).reshape(-1))
        stacked = jnp.stack([data_grid, w_grid]).reshape((2,) + dims_all)
        # blur: unit-sigma separable gaussian over all grid axes
        blurred = gaussian_filter(stacked.reshape((2, -1, dims_all[-1])).reshape((2,) + dims_all),
                                  sigma=1.0)
        blurred = jnp.asarray(blurred)
        # slice: trilinear at continuous grid coords
        from .resample import grid_pull

        grid_coords = jnp.stack([m for m in mesh] + [zc], axis=-1)
        vals = grid_pull(blurred.reshape((2,) + dims_all), grid_coords, interpolation=1, bound="border")
        out = vals[0] / jnp.maximum(vals[1], 1e-8)
        return out

    flat = img.reshape((b * c,) + spatial)
    out = jax.vmap(_one)(flat)
    return out.reshape(img.shape)


# Feature-grid resolution per feature dimension: the regular grid replaces the
# hash-based permutohedral lattice (which scalarizes on TPU).  Cells are 1σ wide,
# so a feature axis can represent a dynamic range of (BINS - 2·pad)·σ before
# extreme values clamp to the boundary cell.  Grid memory is BINS^F · (C+1) f32.
_PHL_GRID_BINS = {1: 256, 2: 96, 3: 40, 4: 24, 5: 16}
_PHL_GRID_PAD = 2


def phl_filter(data: jnp.ndarray, features: jnp.ndarray, sigmas=None) -> jnp.ndarray:
    """Guided filtering with arbitrary feature vectors (reference: PHLFilter,
    monai/networks/layers/filtering.py:66; csrc/filtering/permutohedral/*).

    Matches the reference contract: ``features[:, i]`` is divided by ``sigmas[i]``
    and filtering is a unit Gaussian in the scaled feature space,
    ``W_ij = exp(-|f'_i - f'_j|² / 2)``.

    The hash-based permutohedral lattice scalarizes on TPU, so two dense paths:

    - N ≤ 4096 voxels: exact — the full Gaussian weight matrix as MXU matmuls,
      any feature dimension.
    - larger inputs, F ≤ 5 feature dims: splat-blur-slice on a regular grid over
      the scaled feature space (the regular-grid variant of the lattice; SURVEY
      §2.1).  Cells are 1σ wide; per-axis dynamic range beyond
      ``(bins - 4)·σ`` (bins per F: 256/96/40/24/16 for F=1..5) clamps to the
      boundary cell, so extreme outliers get merged — choose sigmas accordingly.
      F > 5 raises: a dense grid is the wrong tool there and the exact path's
      4096-voxel bound is the supported envelope (documented limit vs the
      reference's exact lattice).

    Unlike the reference (whose PHL backward raises NotImplementedError), both
    paths here are differentiable end-to-end via autodiff.

    data: (B, C, *spatial); features: (B, F, *spatial).
    """
    data = jnp.asarray(data)
    features = jnp.asarray(features, jnp.float32)
    b, c = data.shape[:2]
    f = features.shape[1]
    spatial = data.shape[2:]
    n = int(np.prod(spatial))
    if sigmas is not None:
        sig = jnp.asarray(sigmas, jnp.float32).reshape((1, f) + (1,) * len(spatial))
        features = features / sig
    if n <= 4096:
        # exact: weight matrix from feature distances (dense MXU matmuls)
        feat = features.reshape(b, f, n)
        d2 = ((feat[:, :, :, None] - feat[:, :, None, :]) ** 2).sum(axis=1)  # (B, N, N)
        w = jnp.exp(-0.5 * d2)
        x = data.reshape(b, c, n)
        num = jnp.einsum("bnm,bcm->bcn", w, x)
        den = jnp.einsum("bnm->bn", w)[:, None]
        return (num / jnp.maximum(den, 1e-8)).reshape(data.shape)
    if f not in _PHL_GRID_BINS:
        # high-dimensional features: the exact permutohedral lattice (sorted
        # dense formulation of the reference's hash-table lattice)
        from .permutohedral import permutohedral_filter

        return permutohedral_filter(data, features)
    return _phl_grid_filter(data, features, n)


def _gauss_band_matrix(length: int, sigma: float = 1.0, truncate: float = 4.0) -> np.ndarray:
    """(L, L) 'same'/zero-pad 1-D Gaussian correlation as a banded matrix — the
    feature grid can have up to 5 axes, beyond conv_general's DHW helpers, and a
    bins×bins matmul per axis rides the MXU anyway."""
    radius = max(int(truncate * sigma + 0.5), 1)
    taps = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2)
    taps /= taps.sum()
    w = np.zeros((length, length), np.float32)
    for off, t in zip(range(-radius, radius + 1), taps):
        w += np.diag(np.full(length - abs(off), t, np.float32), k=off)
    return w


def _phl_grid_filter(data: jnp.ndarray, scaled_features: jnp.ndarray, n: int) -> jnp.ndarray:
    """Splat-blur-slice over a regular grid in (sigma-scaled) feature space."""
    from .resample import grid_pull

    b, c = data.shape[:2]
    f = scaled_features.shape[1]
    spatial = data.shape[2:]
    bins = _PHL_GRID_BINS[f]
    pad = _PHL_GRID_PAD
    gdims = (bins,) * f
    total = bins**f
    strides = np.cumprod((gdims[1:] + (1,))[::-1])[::-1].astype(np.int32)
    blur_w = jnp.asarray(_gauss_band_matrix(bins))

    def _one(x, feat):  # x: (C, N) one batch item; feat: (F, N)
        mn = jnp.min(feat, axis=1, keepdims=True)
        g = jnp.clip(feat - mn, 0.0, bins - 1 - 2 * pad) + pad  # (F, N), 1σ cells
        idx = jnp.round(g).astype(jnp.int32)
        flat_idx = jnp.sum(idx * jnp.asarray(strides)[:, None], axis=0)  # (N,)
        vals = jnp.concatenate([x, jnp.ones((1, n), x.dtype)], axis=0)  # (C+1, N)
        grid = jnp.zeros((c + 1, total), x.dtype).at[:, flat_idx].add(vals)
        # blur: unit-sigma separable gaussian over the F feature axes
        blurred = grid.reshape((c + 1,) + gdims)
        for ax in range(1, f + 1):
            blurred = jnp.moveaxis(
                jnp.moveaxis(blurred, ax, -1) @ blur_w, -1, ax)
        # slice: multilinear read-back at the continuous feature coordinates
        out = grid_pull(blurred, g.T.reshape((n, f)), interpolation=1, bound="border")
        return out[:c] / jnp.maximum(out[c:], 1e-8)

    flat = jax.vmap(_one)(data.reshape(b, c, n), scaled_features.reshape(b, f, n))
    return flat.reshape(data.shape)
