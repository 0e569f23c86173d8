"""Functional forms of the spatial transforms, mirroring the reference's
``monai/transforms/spatial/functional.py`` public surface (spatial_resample :68,
orientation :187, flip :233, resize :269, rotate :343, zoom :414, rotate90 :498,
affine_func :548, convert_box_to_points :616, convert_points_to_box :666).

The class transforms in ``spatial_array.py`` own the actual affine/lazy machinery;
each function here builds the matching class once and applies it, so functional
and class paths can never drift apart. ``transform_info`` is accepted for
signature parity; trace metadata is recorded by the class transforms themselves.
"""
from __future__ import annotations

import numpy as np

from ..data.box_utils import get_boxmode
from .spatial_array import (
    Affine,
    Flip,
    Orientation,
    Resize,
    Rotate,
    Rotate90,
    SpatialResample,
    Zoom,
)

__all__ = [
    "spatial_resample", "orientation", "flip", "resize", "rotate", "zoom",
    "rotate90", "affine_func", "convert_box_to_points", "convert_points_to_box",
]


def spatial_resample(img, dst_affine=None, spatial_size=None, mode="bilinear",
                     padding_mode="border", align_corners=False, dtype_pt=np.float64,
                     lazy=False, transform_info=None):
    """Resample ``img`` onto ``dst_affine``/``spatial_size`` (reference:
    spatial/functional.py:68)."""
    t = SpatialResample(mode=mode, padding_mode=padding_mode,
                        align_corners=bool(align_corners), dtype=dtype_pt)
    if isinstance(spatial_size, int) and spatial_size == -1:
        spatial_size = None
    return t(img, dst_affine=dst_affine, spatial_size=spatial_size, lazy=lazy)


def orientation(img, original_affine=None, spatial_ornt=None, lazy=False, transform_info=None):
    """Reorient by an nibabel-style orientation transform ``spatial_ornt``
    (rows of (target_axis, flip)); reference: spatial/functional.py:187."""
    from ..data.affine_utils import inv_ornt_aff
    from ..data.meta_image import MetaImage

    if spatial_ornt is None:
        raise ValueError("spatial_ornt must be provided")
    img = MetaImage.ensure_meta(img)
    spatial_shape = img.peek_pending_shape()
    sr = len(spatial_shape)
    ornt = np.asarray(spatial_ornt, dtype=np.float64)
    # same matrix construction as the Orientation class (nib.orientations.inv_ornt_aff)
    M = inv_ornt_aff(ornt, spatial_shape)
    out_shape = [0] * sr
    for in_ax, (out_ax, _flip) in enumerate(ornt):
        out_shape[int(out_ax)] = int(spatial_shape[in_ax])
    t = Orientation(as_closest_canonical=True)  # carrier for the shared _op machinery
    extra = {"original_affine": np.asarray(
        original_affine if original_affine is not None else img.peek_pending_affine()).tolist()}
    return t._op(img, M, tuple(out_shape), mode="nearest", padding_mode="zeros",
                 lazy=lazy, extra_info=extra)


def flip(img, sp_axes=None, lazy=False, transform_info=None):
    """Flip along spatial axes (reference: spatial/functional.py:233)."""
    return Flip(spatial_axis=sp_axes)(img, lazy=lazy)


def resize(img, out_size, mode="bilinear", align_corners=False, dtype=np.float32,
           input_ndim=None, anti_aliasing=False, anti_aliasing_sigma=None,
           lazy=False, transform_info=None):
    """Resize to ``out_size`` (reference: spatial/functional.py:269)."""
    t = Resize(spatial_size=out_size, mode=mode, align_corners=bool(align_corners),
               anti_aliasing=bool(anti_aliasing), anti_aliasing_sigma=anti_aliasing_sigma,
               dtype=dtype)
    return t(img, lazy=lazy)


def rotate(img, angle, output_shape=None, mode="bilinear", padding_mode="border",
           align_corners=False, dtype=np.float32, lazy=False, transform_info=None):
    """Rotate about the center (reference: spatial/functional.py:343). ``output_shape``
    None means compute the bounding shape (keep_size=False with explicit shape is
    approximated by keep_size according to whether output_shape matches input)."""
    keep_size = output_shape is not None and tuple(output_shape) == tuple(
        img.peek_pending_shape() if hasattr(img, "peek_pending_shape") else img.shape[1:])
    t = Rotate(angle=angle, keep_size=keep_size or output_shape is None,
               mode=mode, padding_mode=padding_mode, align_corners=bool(align_corners), dtype=dtype)
    return t(img, lazy=lazy)


def zoom(img, scale_factor, keep_size=True, mode="bilinear", padding_mode="edge",
         align_corners=False, dtype=np.float32, lazy=False, transform_info=None):
    """Zoom by factor(s) (reference: spatial/functional.py:414)."""
    t = Zoom(zoom=scale_factor, mode=mode, padding_mode=padding_mode,
             align_corners=bool(align_corners), keep_size=bool(keep_size), dtype=dtype)
    return t(img, lazy=lazy)


def rotate90(img, axes=(0, 1), k=1, lazy=False, transform_info=None):
    """Rotate by 90 degrees k times in the plane ``axes`` (reference:
    spatial/functional.py:498)."""
    return Rotate90(k=k, spatial_axes=tuple(axes))(img, lazy=lazy)


def affine_func(img, affine=None, grid=None, resampler=None, sp_size=None, mode="bilinear",
                padding_mode="reflection", do_resampling=True, image_only=True,
                lazy=False, transform_info=None):
    """Apply an affine matrix about the image center (reference:
    spatial/functional.py:548). ``grid``/``resampler`` are accepted for signature
    parity; the TPU path always composes the matrix into one fused resample."""
    t = Affine(affine=affine, spatial_size=sp_size, mode=mode, padding_mode=padding_mode,
               image_only=image_only)
    if not do_resampling:
        out = img if image_only else (img, np.asarray(affine) if affine is not None else np.eye(4))
        return out
    return t(img, spatial_size=sp_size, lazy=lazy)


def convert_box_to_points(bbox, mode=None):
    """Axis-aligned boxes -> corner points, (N, 4, 2) for 2D / (N, 8, 3) for 3D
    (reference: spatial/functional.py:616)."""
    bm = get_boxmode(mode)
    corners = bm.boxes_to_corners(np.asarray(bbox))
    n = corners[0].shape[0]
    if len(corners) == 4:
        x0, y0, x1, y1 = corners
        pts = np.stack([
            np.concatenate([x0, y0], axis=1), np.concatenate([x1, y0], axis=1),
            np.concatenate([x1, y1], axis=1), np.concatenate([x0, y1], axis=1),
        ], axis=1)
    else:
        x0, y0, z0, x1, y1, z1 = corners
        pts = np.stack([
            np.concatenate([x0, y0, z0], axis=1), np.concatenate([x1, y0, z0], axis=1),
            np.concatenate([x1, y1, z0], axis=1), np.concatenate([x0, y1, z0], axis=1),
            np.concatenate([x0, y0, z1], axis=1), np.concatenate([x1, y0, z1], axis=1),
            np.concatenate([x1, y1, z1], axis=1), np.concatenate([x0, y1, z1], axis=1),
        ], axis=1)
    return pts.reshape(n, -1, pts.shape[-1])


def convert_points_to_box(points):
    """Corner points -> axis-aligned StandardMode boxes (reference:
    spatial/functional.py:666)."""
    pts = np.asarray(points)
    mins = pts.min(axis=1)
    maxs = pts.max(axis=1)
    return np.concatenate([mins, maxs], axis=1)
