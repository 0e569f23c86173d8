"""Bounding-box utilities for detection (reference: monai/data/box_utils.py:1-1189).

Box modes, conversion, area/IoU/GIoU, clipping, NMS.  Standard mode is corner format
xyxy / xyzxyz (StandardMode in the reference).
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..utils.backend import is_jax, to_numpy, xp

__all__ = ["get_spatial_dims", "box_area", "box_centers", "box_iou", "box_giou", "box_pair_giou",
           "centers_in_boxes", "clip_boxes_to_image", "convert_box_mode",
           "convert_box_to_standard_mode", "non_max_suppression", "spatial_crop_boxes",
           "standardize_empty_box", "boxes_center_distance", "is_valid_box_values"]

# standard corner mode: (x1, y1, x2, y2) / (x1, y1, z1, x2, y2, z2)
SUPPORTED_MODES = ("xyxy", "xyzxyz", "xxyy", "xxyyzz", "xyxyzz", "xywh", "xyzwhd", "ccwh", "cccwhd")


def get_spatial_dims(boxes=None, points=None, corners=None, spatial_size=None) -> int:
    """Infer 2 vs 3 spatial dims (reference: box_utils.py:—)."""
    if boxes is not None:
        return int(boxes.shape[-1] // 2)
    if points is not None:
        return int(points.shape[-1])
    if spatial_size is not None:
        return len(spatial_size)
    raise ValueError("unable to infer spatial dims")


def standardize_empty_box(boxes, spatial_dims: int):
    """Give empty box arrays the canonical (0, 2*D) shape (reference: box_utils.py:—)."""
    ns = xp(boxes) if hasattr(boxes, "shape") else np
    if boxes.shape[0] == 0:
        return ns.zeros((0, 2 * spatial_dims), dtype=boxes.dtype if hasattr(boxes, "dtype") else np.float32)
    return boxes


def _split_mode(mode: str, boxes):
    d = get_spatial_dims(boxes=boxes)
    cols = [boxes[..., i] for i in range(boxes.shape[-1])]
    if mode in ("xyxy", "xyzxyz"):
        return cols[:d], cols[d:]
    if mode == "xxyy":
        return [cols[0], cols[2]], [cols[1], cols[3]]
    if mode == "xxyyzz":
        return [cols[0], cols[2], cols[4]], [cols[1], cols[3], cols[5]]
    if mode == "xyxyzz":
        return [cols[0], cols[1], cols[4]], [cols[2], cols[3], cols[5]]
    if mode in ("xywh", "xyzwhd"):
        mins = cols[:d]
        maxs = [mins[i] + cols[d + i] for i in range(d)]
        return mins, maxs
    if mode in ("ccwh", "cccwhd"):
        centers = cols[:d]
        halves = [cols[d + i] / 2.0 for i in range(d)]
        mins = [centers[i] - halves[i] for i in range(d)]
        maxs = [centers[i] + halves[i] for i in range(d)]
        return mins, maxs
    raise ValueError(f"unsupported box mode {mode}")


def convert_box_mode(boxes, src_mode: str | None = None, dst_mode: str | None = None):
    """Convert between box parametrizations (reference: box_utils.py:—)."""
    d = get_spatial_dims(boxes=boxes)
    src_mode = src_mode or ("xyxy" if d == 2 else "xyzxyz")
    dst_mode = dst_mode or ("xyxy" if d == 2 else "xyzxyz")
    if src_mode == dst_mode:
        return boxes
    ns = xp(boxes)
    mins, maxs = _split_mode(src_mode, boxes)
    if dst_mode in ("xyxy", "xyzxyz"):
        return ns.stack(mins + maxs, axis=-1)
    if dst_mode == "xxyy":
        return ns.stack([mins[0], maxs[0], mins[1], maxs[1]], axis=-1)
    if dst_mode == "xxyyzz":
        return ns.stack([mins[0], maxs[0], mins[1], maxs[1], mins[2], maxs[2]], axis=-1)
    if dst_mode == "xyxyzz":
        return ns.stack([mins[0], mins[1], maxs[0], maxs[1], mins[2], maxs[2]], axis=-1)
    if dst_mode in ("xywh", "xyzwhd"):
        sizes = [maxs[i] - mins[i] for i in range(d)]
        return ns.stack(mins + sizes, axis=-1)
    if dst_mode in ("ccwh", "cccwhd"):
        centers = [(mins[i] + maxs[i]) / 2.0 for i in range(d)]
        sizes = [maxs[i] - mins[i] for i in range(d)]
        return ns.stack(centers + sizes, axis=-1)
    raise ValueError(f"unsupported dst mode {dst_mode}")


def convert_box_to_standard_mode(boxes, mode: str | None = None):
    """→ corner format (reference: box_utils.py:—)."""
    return convert_box_mode(boxes, src_mode=mode, dst_mode=None)


def box_area(boxes) -> Any:
    """Area/volume of standard-mode boxes (reference: box_utils.py:—)."""
    d = get_spatial_dims(boxes=boxes)
    area = None
    for i in range(d):
        edge = boxes[..., d + i] - boxes[..., i]
        area = edge if area is None else area * edge
    return area


def box_centers(boxes) -> Any:
    d = get_spatial_dims(boxes=boxes)
    ns = xp(boxes)
    return ns.stack([(boxes[..., i] + boxes[..., d + i]) / 2.0 for i in range(d)], axis=-1)


def _pairwise_inter_union(boxes1, boxes2):
    ns = xp(boxes1)
    d = get_spatial_dims(boxes=boxes1)
    lt = ns.maximum(boxes1[:, None, :d], boxes2[None, :, :d])
    rb = ns.minimum(boxes1[:, None, d:], boxes2[None, :, d:])
    wh = ns.clip(rb - lt, 0, None)
    inter = wh[..., 0]
    for i in range(1, d):
        inter = inter * wh[..., i]
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return inter, union


def box_iou(boxes1, boxes2):
    """Pairwise IoU (reference: box_utils.py:—)."""
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    ns = xp(boxes1)
    return inter / ns.clip(union, 1e-10, None)


def box_giou(boxes1, boxes2):
    """Pairwise generalized IoU (reference: box_utils.py:—)."""
    ns = xp(boxes1)
    d = get_spatial_dims(boxes=boxes1)
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    iou = inter / ns.clip(union, 1e-10, None)
    lt = ns.minimum(boxes1[:, None, :d], boxes2[None, :, :d])
    rb = ns.maximum(boxes1[:, None, d:], boxes2[None, :, d:])
    wh = ns.clip(rb - lt, 0, None)
    enclosure = wh[..., 0]
    for i in range(1, d):
        enclosure = enclosure * wh[..., i]
    return iou - (enclosure - union) / ns.clip(enclosure, 1e-10, None)


def box_pair_giou(boxes1, boxes2):
    """Elementwise GIoU of paired boxes (reference: box_utils.py:—)."""
    ns = xp(boxes1)
    d = get_spatial_dims(boxes=boxes1)
    lt = ns.maximum(boxes1[:, :d], boxes2[:, :d])
    rb = ns.minimum(boxes1[:, d:], boxes2[:, d:])
    wh = ns.clip(rb - lt, 0, None)
    inter = wh[:, 0]
    for i in range(1, d):
        inter = inter * wh[:, i]
    union = box_area(boxes1) + box_area(boxes2) - inter
    iou = inter / ns.clip(union, 1e-10, None)
    lt_e = ns.minimum(boxes1[:, :d], boxes2[:, :d])
    rb_e = ns.maximum(boxes1[:, d:], boxes2[:, d:])
    wh_e = ns.clip(rb_e - lt_e, 0, None)
    enc = wh_e[:, 0]
    for i in range(1, d):
        enc = enc * wh_e[:, i]
    return iou - (enc - union) / ns.clip(enc, 1e-10, None)


def boxes_center_distance(boxes1, boxes2, euclidean: bool = True):
    """Pairwise center distances (reference: box_utils.py:—)."""
    ns = xp(boxes1)
    c1 = box_centers(boxes1)
    c2 = box_centers(boxes2)
    diff = c1[:, None] - c2[None]
    if euclidean:
        dists = ns.sqrt((diff**2).sum(-1))
    else:
        dists = ns.abs(diff).sum(-1)
    return dists, c1, c2


def centers_in_boxes(centers, boxes, eps: float = 0.01):
    """Mask of centers inside boxes (reference: box_utils.py:—)."""
    ns = xp(boxes)
    d = get_spatial_dims(boxes=boxes)
    mins = centers - boxes[:, :d]
    maxs = boxes[:, d:] - centers
    vals = ns.concatenate([mins, maxs], axis=1)
    return ns.min(vals, axis=1) > eps


def is_valid_box_values(boxes) -> bool:
    d = get_spatial_dims(boxes=boxes)
    b = to_numpy(boxes)
    return bool(np.all(b[:, d:] >= b[:, :d]))


def clip_boxes_to_image(boxes, spatial_size: Sequence[int], remove_empty: bool = True):
    """Clip boxes to image bounds (reference: box_utils.py:—).

    Returns (boxes, keep_mask)."""
    ns = xp(boxes)
    d = get_spatial_dims(boxes=boxes)
    mins = ns.stack([ns.clip(boxes[:, i], 0, spatial_size[i]) for i in range(d)], axis=1)
    maxs = ns.stack([ns.clip(boxes[:, d + i], 0, spatial_size[i]) for i in range(d)], axis=1)
    clipped = ns.concatenate([mins, maxs], axis=1)
    if remove_empty:
        # reference box_utils.py:1037: keep boxes at least 1 pixel wide per axis
        keep = ns.ones(clipped.shape[0], dtype=bool)
        for i in range(d):
            keep = keep & (clipped[:, d + i] >= clipped[:, i] + 1)
        return clipped[keep] if not is_jax(boxes) else clipped[np.asarray(to_numpy(keep))], keep
    return clipped, ns.ones(clipped.shape[0], dtype=bool)


def spatial_crop_boxes(boxes, roi_start: Sequence[int], roi_end: Sequence[int],
                       remove_empty: bool = True):
    """Translate + clip boxes for a spatial crop (reference: box_utils.py:—)."""
    ns = xp(boxes)
    d = get_spatial_dims(boxes=boxes)
    roi_start_np = np.asarray(roi_start)
    roi_end_np = np.asarray(roi_end)
    shifted = boxes - ns.concatenate([ns.asarray(roi_start_np)] * 2) if is_jax(boxes) else \
        boxes - np.concatenate([roi_start_np, roi_start_np]).astype(to_numpy(boxes).dtype)
    return clip_boxes_to_image(shifted, (roi_end_np - roi_start_np).tolist(), remove_empty)


def non_max_suppression(boxes, scores, nms_thresh: float, max_proposals: int = -1,
                        box_overlap_metric=box_iou) -> np.ndarray:
    """Greedy NMS; returns kept indices sorted by score (reference: box_utils.py:—)."""
    boxes_np = to_numpy(boxes)
    scores_np = to_numpy(scores)
    if boxes_np.shape[0] == 0:
        return np.asarray([], dtype=np.int64)
    order = np.argsort(-scores_np)
    keep = []
    suppressed = np.zeros(len(order), dtype=bool)
    ious = to_numpy(box_overlap_metric(boxes_np[order], boxes_np[order]))
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        if 0 < max_proposals <= len(keep):
            break
        suppressed |= ious[i] > nms_thresh
        suppressed[i] = True  # self
    return np.asarray(keep, dtype=np.int64)


class BoxMode:
    """Box-mode class hierarchy mapping to the string modes used by ``convert_box_mode``
    (reference: box_utils.py:52 BoxMode and subclasses). Instances are callable
    converters to standard mode."""

    name: dict[int, str] = {}

    @classmethod
    def get_name(cls, spatial_dims: int) -> str:
        return cls.name[spatial_dims]

    def __call__(self, boxes):
        d = get_spatial_dims(boxes=boxes)
        return convert_box_mode(boxes, src_mode=self.get_name(d), dst_mode=None)

    def boxes_to_corners(self, boxes) -> tuple:
        """Split boxes in this mode into per-coordinate corner columns
        ``(xmin, ymin, (zmin,) xmax, ymax(, zmax))``, each shaped (N, 1)
        (reference: box_utils.py BoxMode.boxes_to_corners)."""
        d = get_spatial_dims(boxes=boxes)
        mins, maxs = _split_mode(self.get_name(d), boxes)
        return tuple(np.asarray(c).reshape(-1, 1) for c in (*mins, *maxs))

    def corners_to_boxes(self, corners):
        """Inverse of ``boxes_to_corners``: corner columns -> boxes in this mode."""
        std = np.concatenate([np.asarray(c).reshape(-1, 1) for c in corners], axis=1)
        d = std.shape[1] // 2
        return convert_box_mode(std, src_mode=None, dst_mode=self.get_name(d))


class CornerCornerModeTypeA(BoxMode):
    """[xmin, ymin, (zmin,) xmax, ymax(, zmax)] — StandardMode (reference: box_utils.py)."""

    name = {2: "xyxy", 3: "xyzxyz"}


class CornerCornerModeTypeB(BoxMode):
    """[xmin, xmax, ymin, ymax(, zmin, zmax)]."""

    name = {2: "xxyy", 3: "xxyyzz"}


class CornerCornerModeTypeC(BoxMode):
    """[xmin, ymin, xmax, ymax(, zmin, zmax)]."""

    name = {2: "xyxy", 3: "xyxyzz"}


class CornerSizeMode(BoxMode):
    """[xmin, ymin, (zmin,) xsize, ysize(, zsize)]."""

    name = {2: "xywh", 3: "xyzwhd"}


class CenterSizeMode(BoxMode):
    """[xcenter, ycenter, (zcenter,) xsize, ysize(, zsize)]."""

    name = {2: "ccwh", 3: "cccwhd"}


StandardMode = CornerCornerModeTypeA


def get_boxmode(mode=None, *args, **kwargs) -> BoxMode:
    """Return a ``BoxMode`` instance from a string / class / instance
    (reference: box_utils.py:457)."""
    if mode is None:
        return StandardMode(*args, **kwargs)
    if isinstance(mode, BoxMode):
        return mode
    if isinstance(mode, type) and issubclass(mode, BoxMode):
        return mode(*args, **kwargs)
    if isinstance(mode, str):
        for cls in (CornerCornerModeTypeA, CornerCornerModeTypeB, CornerCornerModeTypeC,
                    CornerSizeMode, CenterSizeMode):
            if mode in cls.name.values():
                return cls(*args, **kwargs)
    raise ValueError(f"unsupported box mode: {mode}.")


def batched_nms(boxes, scores, labels, nms_thresh: float, max_proposals: int = -1,
                box_overlap_metric=box_iou) -> np.ndarray:
    """Per-class NMS via the coordinate-offset trick: shift each class's boxes by
    ``label * (max_coordinate + 1)`` so boxes of different classes can never
    overlap, then run one plain NMS (reference: box_utils.py:1144)."""
    boxes_np = to_numpy(boxes)
    if boxes_np.shape[0] == 0:
        return np.asarray([], dtype=np.int64)
    labels_np = to_numpy(labels).astype(np.float64)
    max_coordinate = float(boxes_np.max())
    offsets = labels_np * (max_coordinate + 1.0)
    boxes_for_nms = boxes_np.astype(np.float64) + offsets[:, None]
    return non_max_suppression(boxes_for_nms, scores, nms_thresh, max_proposals,
                               box_overlap_metric)
