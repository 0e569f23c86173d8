"""Differentiable spatial transform layers
(reference: monai/networks/layers/spatial_transforms.py:35 grid_pull etc.,
:439 AffineTransform; monai/networks/utils.py:243 normalize_transform, :289
to_norm_affine).

grid_pull/push/count are re-exported from ops.resample (pure-jax, differentiable by
construction — no hand-written backward needed, unlike the reference's monai._C
autograd functions). AffineTransform reproduces the torch affine_grid + grid_sample
composition exactly (validated numerically against the reference).
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import jax.numpy as jnp
from flax import nnx

from ...ops.resample import grid_count, grid_grad, grid_pull, grid_push, resolve_mode
from ...utils.misc import ensure_tuple

__all__ = ["AffineTransform", "normalize_transform", "to_norm_affine", "grid_pull", "grid_grad",
           "grid_push", "grid_count"]


def normalize_transform(shape, align_corners: bool = False,
                        zero_centered: bool = False) -> jnp.ndarray:
    """Affine mapping voxel indices to normalized [-1, 1] coords
    (reference: networks/utils.py:243)."""
    norm = jnp.asarray(shape, jnp.float64)
    if align_corners:
        norm = jnp.where(norm <= 1.0, 2.0, norm)
        diag = 2.0 / (norm if zero_centered else norm - 1.0)
        mat = jnp.diag(jnp.concatenate([diag, jnp.ones(1, jnp.float64)]))
        if not zero_centered:
            mat = mat.at[:-1, -1].set(-1.0)
    else:
        norm = jnp.where(norm <= 0.0, 2.0, norm)
        diag = 2.0 / ((norm - 1.0) if zero_centered else norm)
        mat = jnp.diag(jnp.concatenate([diag, jnp.ones(1, jnp.float64)]))
        if not zero_centered:
            mat = mat.at[:-1, -1].set(1.0 / jnp.asarray(shape, jnp.float64) - 1.0)
    return mat


def to_norm_affine(affine: jnp.ndarray, src_size, dst_size, align_corners: bool = False,
                   zero_centered: bool = False) -> jnp.ndarray:
    """Re-express a pixel-space affine in normalized coordinates
    (reference: networks/utils.py:289)."""
    src_xform = normalize_transform(src_size, align_corners, zero_centered)
    dst_xform = normalize_transform(dst_size, align_corners, zero_centered)
    inv_dst = jnp.asarray(np.linalg.inv(np.asarray(dst_xform)))
    return (src_xform[None] @ affine.astype(jnp.float64) @ inv_dst[None]).astype(jnp.float32)


class AffineTransform(nnx.Module):
    """Apply a batch of affine matrices (theta) to images
    (reference: spatial_transforms.py:439). Semantics match torch's
    ``affine_grid`` + ``grid_sample`` composition exactly."""

    def __init__(self, spatial_size: Sequence[int] | int | None = None,
                 normalized: bool = False, mode: str = "bilinear",
                 padding_mode: str = "zeros", align_corners: bool = True,
                 reverse_indexing: bool = True, zero_centered: bool | None = None):
        self.spatial_size = ensure_tuple(spatial_size) if spatial_size is not None else None
        self.normalized = normalized
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.reverse_indexing = reverse_indexing
        if zero_centered is not None and normalized:
            raise ValueError("`normalized=True` is not compatible with `zero_centered`.")
        self.zero_centered = bool(zero_centered) if zero_centered is not None else False

    def __call__(self, src: jnp.ndarray, theta: jnp.ndarray,
                 spatial_size: Sequence[int] | int | None = None) -> jnp.ndarray:
        if theta.ndim == 2:
            theta = theta[None]
        sr = src.ndim - 2
        if sr not in (2, 3):
            raise ValueError(f"Unsupported src dimension: {sr}.")
        # pad theta to square homogeneous
        if theta.shape[1] == sr:
            bottom = jnp.zeros((theta.shape[0], 1, sr + 1), theta.dtype).at[:, 0, sr].set(1.0)
            theta = jnp.concatenate([theta, bottom], axis=1)
        src_spatial = src.shape[2:]
        dst_spatial = src_spatial
        if self.spatial_size is not None:
            dst_spatial = self.spatial_size
        if spatial_size is not None:
            dst_spatial = ensure_tuple(spatial_size)

        if not self.normalized:
            theta = to_norm_affine(theta, src_spatial, dst_spatial, align_corners=False,
                                   zero_centered=self.zero_centered)
        if self.reverse_indexing:
            rev = list(range(sr - 1, -1, -1))
            theta = theta.at[:, :sr].set(theta[:, rev])
            theta = theta.at[:, :, :sr].set(theta[:, :, rev])
        b = src.shape[0]
        if theta.shape[0] == 1 and b > 1:
            theta = jnp.repeat(theta, b, axis=0)
        if theta.shape[0] != b:
            raise ValueError("affine and image batch dimension must match, got "
                             f"affine={theta.shape[0]} image={b}.")

        # torch affine_grid: base coords in (x, y[, z]) order, x = LAST spatial axis
        axes = []
        for s in dst_spatial[::-1]:
            if self.align_corners:
                axes.append(jnp.linspace(-1.0, 1.0, s))
            else:
                axes.append((jnp.arange(s) * 2 + 1) / s - 1.0)
        # mesh over output positions in natural (d1..dsr) order with xy(z) channels
        mesh = jnp.meshgrid(*axes[::-1], indexing="ij")  # each (dst_spatial)
        base = jnp.stack(mesh[::-1] + [jnp.ones(tuple(dst_spatial))], axis=-1)  # (*dst, sr+1)
        flat = base.reshape(-1, sr + 1)
        coords_xy = jnp.einsum("bij,pj->bpi", theta[:, :sr].astype(jnp.float32),
                               flat.astype(jnp.float32))  # (B, P, sr) in xy(z) order
        coords = coords_xy[..., ::-1]  # -> index (i, j[, k]) order
        # denormalize grid_sample coords to voxel indices
        scale = []
        shift = []
        for s in src_spatial:
            if self.align_corners:
                scale.append((s - 1) / 2.0)
                shift.append((s - 1) / 2.0)
            else:
                scale.append(s / 2.0)
                shift.append((s - 1) / 2.0)
        vox = coords * jnp.asarray(scale, jnp.float32) + jnp.asarray(shift, jnp.float32)
        vox = vox.reshape((b,) + tuple(dst_spatial) + (sr,))
        interp = resolve_mode(self.mode)
        outs = [grid_pull(src[i], vox[i], interpolation=interp, bound=self.padding_mode,
                          align_corners=self.align_corners) for i in range(b)]
        return jnp.stack(outs)
