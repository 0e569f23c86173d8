"""Box encoding/decoding for detection (reference: monai/apps/detection/utils/box_coder.py)."""
from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np

__all__ = ["BoxCoder", "encode_boxes"]


class BoxCoder:
    """Encode gt boxes as regression targets relative to anchors and back
    (reference: box_coder.py BoxCoder)."""

    def __init__(self, weights: Sequence[float], boxes_xform_clip: float | None = None):
        self.weights = np.asarray(weights, dtype=np.float32)
        self.boxes_xform_clip = boxes_xform_clip if boxes_xform_clip is not None else math.log(1000.0 / 16)
        self.spatial_dims = len(weights) // 2

    def encode(self, gt_boxes: Sequence[np.ndarray], proposals: Sequence[np.ndarray]) -> tuple:
        boxes_per_image = [len(b) for b in gt_boxes]
        targets = self.encode_single(np.concatenate(gt_boxes), np.concatenate(proposals))
        return tuple(np.split(targets, np.cumsum(boxes_per_image)[:-1]))

    def encode_single(self, gt_boxes: np.ndarray, proposals: np.ndarray) -> np.ndarray:
        d = self.spatial_dims
        gt = np.asarray(gt_boxes, dtype=np.float32)
        pr = np.asarray(proposals, dtype=np.float32)
        pr_sizes = pr[:, d:] - pr[:, :d]
        pr_ctr = pr[:, :d] + 0.5 * pr_sizes
        gt_sizes = np.maximum(gt[:, d:] - gt[:, :d], 1e-6)
        gt_ctr = gt[:, :d] + 0.5 * gt_sizes
        w_ctr = self.weights[:d]
        w_size = self.weights[d:]
        t_ctr = w_ctr * (gt_ctr - pr_ctr) / np.maximum(pr_sizes, 1e-6)
        t_size = w_size * np.log(gt_sizes / np.maximum(pr_sizes, 1e-6))
        return np.concatenate([t_ctr, t_size], axis=1)

    def decode(self, rel_codes: np.ndarray, reference_boxes: Sequence[np.ndarray]) -> np.ndarray:
        boxes = np.concatenate(reference_boxes, axis=0)
        return self.decode_single(rel_codes, boxes)

    def decode_single(self, rel_codes: np.ndarray, reference_boxes: np.ndarray) -> np.ndarray:
        d = self.spatial_dims
        ref = np.asarray(reference_boxes, dtype=np.float32)
        codes = np.asarray(rel_codes, dtype=np.float32)
        sizes = ref[:, d:] - ref[:, :d]
        ctr = ref[:, :d] + 0.5 * sizes
        w_ctr = self.weights[:d]
        w_size = self.weights[d:]
        dctr = codes[..., :d] / w_ctr
        dsize = np.clip(codes[..., d:] / w_size, None, self.boxes_xform_clip)
        pred_ctr = dctr * sizes + ctr
        pred_size = np.exp(dsize) * sizes
        return np.concatenate([pred_ctr - 0.5 * pred_size, pred_ctr + 0.5 * pred_size], axis=-1)


def encode_boxes(gt_boxes, proposals, weights) -> np.ndarray:
    """Standalone box-regression target encoding: proposals -> gt offsets in
    (center, log-size) space (reference: box_coder.py:64)."""
    from ....data.box_utils import is_valid_box_values
    from ....utils.backend import to_numpy

    gt = np.asarray(to_numpy(gt_boxes), dtype=np.float64)
    pr = np.asarray(to_numpy(proposals), dtype=np.float64)
    w = np.asarray(to_numpy(weights), dtype=np.float64)
    if gt.shape[0] != pr.shape[0]:
        raise ValueError("gt_boxes.shape[0] should be equal to proposals.shape[0].")
    if len(w) not in (4, 6):
        raise ValueError(f"weights must have 4 or 6 elements, got {len(w)}")
    d = len(w) // 2
    if not is_valid_box_values(gt):
        raise ValueError("gt_boxes is not valid. Please check if it contains empty boxes.")
    if not is_valid_box_values(pr):
        raise ValueError("proposals is not valid. Please check if it contains empty boxes.")
    ex_sizes = pr[:, d:] - pr[:, :d]
    ex_ctr = pr[:, :d] + 0.5 * ex_sizes
    gt_sizes = gt[:, d:] - gt[:, :d]
    gt_ctr = gt[:, :d] + 0.5 * gt_sizes
    targets_dxyz = w[None, :d] * (gt_ctr - ex_ctr) / ex_sizes
    targets_dwhd = w[None, d:] * np.log(gt_sizes / ex_sizes)
    targets = np.concatenate([targets_dxyz, targets_dwhd], axis=1)
    if np.isnan(targets).any() or np.isinf(targets).any():
        raise ValueError("targets is NaN or Inf.")
    return targets
