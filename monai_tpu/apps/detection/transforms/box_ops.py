"""Box geometry ops for detection pipelines
(reference: monai/apps/detection/transforms/box_ops.py:62-420).

Host-side numpy (these run in the data pipeline alongside the image transforms whose
affines are also host-side numpy).
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ....utils.backend import to_numpy
from ....utils.misc import ensure_tuple, ensure_tuple_rep

__all__ = ["apply_affine_to_boxes", "zoom_boxes", "resize_boxes", "flip_boxes",
           "convert_box_to_mask", "convert_mask_to_box", "select_labels",
           "swapaxes_boxes", "rot90_boxes"]


def _spatial_dims_of(boxes: np.ndarray) -> int:
    if boxes.shape[-1] not in (4, 6):
        raise ValueError(f"boxes must have 4 or 6 columns, got {boxes.shape}.")
    return boxes.shape[-1] // 2


def apply_affine_to_boxes(boxes, affine) -> np.ndarray:
    """Transform the 2^d corners and rebox (reference: box_ops.py:62)."""
    boxes = np.asarray(to_numpy(boxes), dtype=np.float64)
    affine = np.asarray(to_numpy(affine), dtype=np.float64)
    sd = _spatial_dims_of(boxes)
    n = boxes.shape[0]
    if n == 0:
        return boxes.astype(np.float32)
    # enumerate corners: each axis picks min or max
    corners = []
    for mask in range(2 ** sd):
        pick = [(boxes[:, d + sd] if (mask >> d) & 1 else boxes[:, d]) for d in range(sd)]
        corners.append(np.stack(pick, axis=-1))
    pts = np.stack(corners, axis=1).reshape(-1, sd)  # (N * 2^d, sd)
    homo = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=-1)
    out = (homo @ affine.T)[:, :sd].reshape(n, 2 ** sd, sd)
    lo = out.min(axis=1)
    hi = out.max(axis=1)
    return np.concatenate([lo, hi], axis=-1).astype(np.float32)


def zoom_boxes(boxes, zoom) -> np.ndarray:
    """Scale per axis (reference: box_ops.py:102)."""
    boxes = np.asarray(to_numpy(boxes), dtype=np.float32)
    sd = _spatial_dims_of(boxes)
    z = np.asarray(ensure_tuple_rep(zoom, sd), dtype=np.float32)
    return boxes * np.concatenate([z, z])


def resize_boxes(boxes, src_spatial_size, dst_spatial_size) -> np.ndarray:
    """Rescale boxes for an image resize (reference: box_ops.py:129)."""
    boxes = np.asarray(to_numpy(boxes), dtype=np.float32)
    sd = _spatial_dims_of(boxes)
    src = ensure_tuple_rep(src_spatial_size, sd)
    dst = ensure_tuple_rep(dst_spatial_size, sd)
    zoom = [d / s for d, s in zip(dst, src)]
    return zoom_boxes(boxes, zoom)


def flip_boxes(boxes, spatial_size, flip_axes=None) -> np.ndarray:
    """Mirror boxes for an image flip (reference: box_ops.py:161)."""
    boxes = np.asarray(to_numpy(boxes), dtype=np.float32).copy()
    sd = _spatial_dims_of(boxes)
    spatial_size = ensure_tuple_rep(spatial_size, sd)
    if flip_axes is None:
        flip_axes = tuple(range(sd))
    flip_axes = ensure_tuple(flip_axes)
    out = boxes.copy()
    for axis in flip_axes:
        out[:, axis + sd] = spatial_size[axis] - boxes[:, axis]
        out[:, axis] = spatial_size[axis] - boxes[:, axis + sd]
    return out


def convert_box_to_mask(boxes, labels, spatial_size, bg_label: int = -1,
                        ellipse_mask: bool = False) -> np.ndarray:
    """Rasterize boxes into per-box int16 channels (reference: box_ops.py:195)."""
    boxes_np = np.asarray(to_numpy(boxes))
    labels_np = np.asarray(to_numpy(labels))
    sd = _spatial_dims_of(boxes_np) if boxes_np.size else len(ensure_tuple(spatial_size))
    spatial_size = ensure_tuple_rep(spatial_size, sd)
    if labels_np.shape[0] == 0:
        return np.full((1,) + tuple(spatial_size), bg_label, dtype=np.int16)
    if bg_label >= labels_np.min():
        raise ValueError(f"bg_label ({bg_label}) must be smaller than all foreground labels.")
    if labels_np.shape[0] != boxes_np.shape[0]:
        raise ValueError("Number of labels should equal number of boxes.")
    mask = np.full((labels_np.shape[0],) + tuple(spatial_size), bg_label, dtype=np.int16)
    bint = boxes_np.astype(np.int32)
    if np.any(bint[:, sd:] > np.asarray(spatial_size)):
        raise ValueError("Some boxes are larger than the image.")
    for b in range(bint.shape[0]):
        size = [int(bint[b, d + sd] - bint[b, d]) for d in range(sd)]
        if ellipse_mask:
            m = max(size)
            center = (m - 1) / 2.0
            grid = np.ogrid[tuple(slice(0, m) for _ in range(sd))]
            dist = sum((g - center) ** 2 for g in grid)
            block = np.where(dist <= (m / 2.0) ** 2, np.int16(labels_np[b]),
                             np.int16(bg_label))
            # squeeze the ball into the box extent with nearest sampling
            idx = [np.clip((np.arange(s) * m / s).astype(int), 0, m - 1) for s in size]
            block = block[np.ix_(*idx)]
        else:
            block = np.full(size, np.int16(labels_np[b]), dtype=np.int16)
        slicing = (b,) + tuple(slice(int(bint[b, d]), int(bint[b, d + sd])) for d in range(sd))
        mask[slicing] = block
    return mask


def convert_mask_to_box(boxes_mask, bg_label: int = -1, box_dtype=np.float32,
                        label_dtype=np.int64):
    """Tight boxes from per-box mask channels (reference: box_ops.py:275)."""
    arr = np.asarray(to_numpy(boxes_mask))
    sd = arr.ndim - 1
    boxes_list, labels_list = [], []
    for b in range(arr.shape[0]):
        fg = np.nonzero(arr[b] - bg_label)
        if fg[0].shape[0] == 0:
            continue
        box = [int(f.min()) for f in fg] + [int(f.max()) + 1 for f in fg]
        boxes_list.append(box)
        labels_list.append(arr[(b,) + tuple(f[0] for f in fg)])
    if not boxes_list:
        return (np.zeros((0, 2 * sd), dtype=box_dtype), np.zeros((0,), dtype=label_dtype))
    return (np.asarray(boxes_list, dtype=box_dtype),
            np.asarray(labels_list, dtype=label_dtype))


def select_labels(labels, keep):
    """Filter per-box label arrays by a keep mask/indices (reference: box_ops.py:328)."""
    keep_np = np.asarray(to_numpy(keep))
    single = not isinstance(labels, (list, tuple))
    items = [labels] if single else list(labels)
    out = [np.asarray(to_numpy(item))[keep_np] for item in items]
    return out[0] if single else tuple(out)


def swapaxes_boxes(boxes, axis1: int, axis2: int) -> np.ndarray:
    """Swap two spatial axes of boxes (reference: box_ops.py:357)."""
    boxes = np.asarray(to_numpy(boxes)).copy()
    sd = _spatial_dims_of(boxes)
    boxes[:, [axis1, axis2]] = boxes[:, [axis2, axis1]]
    boxes[:, [axis1 + sd, axis2 + sd]] = boxes[:, [axis2 + sd, axis1 + sd]]
    return boxes


def rot90_boxes(boxes, spatial_size, k: int = 1, axes=(0, 1)) -> np.ndarray:
    """Rotate boxes 90 degrees k times in the plane given by axes
    (reference: box_ops.py:384)."""
    boxes = np.asarray(to_numpy(boxes), dtype=np.float32)
    sd = _spatial_dims_of(boxes)
    spatial_size = list(ensure_tuple_rep(spatial_size, sd))
    axes = ensure_tuple(axes)
    if len(axes) != 2 or axes[0] == axes[1] or abs(axes[0] - axes[1]) == sd:
        raise ValueError("axes must be two different spatial axes.")
    k %= 4
    if k == 0:
        return boxes
    if k == 1:
        out = flip_boxes(boxes, spatial_size, (axes[1],))
        out = swapaxes_boxes(out, axes[0], axes[1])
        return out
    if k == 2:
        return flip_boxes(flip_boxes(boxes, spatial_size, (axes[0],)), spatial_size,
                          (axes[1],))
    out = swapaxes_boxes(boxes, axes[0], axes[1])
    new_size = list(spatial_size)
    new_size[axes[0]], new_size[axes[1]] = spatial_size[axes[1]], spatial_size[axes[0]]
    return flip_boxes(out, new_size, (axes[1],))
