"""Metric helper functions.

Parity targets: monai/metrics/utils.py (do_metric_reduction:—, ignore_background:—,
get_mask_edges:139-242, get_surface_distance:—, is_binary_tensor:—).
"""
from __future__ import annotations

from typing import Any

import numpy as np

from ..utils.backend import to_numpy, xp
from ..utils.enums import MetricReduction
from ..utils.module import look_up_option

__all__ = ["ignore_background", "do_metric_reduction", "get_mask_edges", "get_surface_distance",
           "is_binary_tensor", "remap_instance_id"]


def ignore_background(y_pred: Any, y: Any):
    """Drop channel 0 (reference: metrics/utils.py:—)."""
    return y_pred[:, 1:] if y_pred.shape[1] > 1 else y_pred, y[:, 1:] if y.shape[1] > 1 else y


def do_metric_reduction(f: np.ndarray, reduction: str = MetricReduction.MEAN):
    """NaN-aware reduction over (batch, class) metric matrices
    (reference: metrics/utils.py:—).  Returns (reduced, not_nans)."""
    if isinstance(reduction, str):
        reduction = look_up_option(reduction, MetricReduction)
    f = to_numpy(f).astype(np.float64)
    nans = np.isnan(f)
    not_nans = (~nans).astype(np.float64)
    t_zero = np.zeros(1)
    if str(reduction) == str(MetricReduction.NONE):
        return f, not_nans
    f = np.where(nans, 0.0, f)
    if str(reduction) == str(MetricReduction.MEAN):
        # 2 steps: channel first then batch (reference semantics); trailing dims
        # (e.g. the [tp,fp,tn,fn] axis of confusion matrices) are preserved
        not_nans_c = not_nans.sum(axis=1)
        f_c = np.where(not_nans_c > 0, f.sum(axis=1) / np.maximum(not_nans_c, 1), np.nan)
        not_nans_b = (not_nans_c > 0).astype(np.float64).sum(axis=0)
        f_out = np.where(not_nans_b > 0, np.nansum(f_c, axis=0) / np.maximum(not_nans_b, 1), np.nan)
        if np.ndim(f_out) == 0:
            return np.float64(f_out), not_nans_b
        return f_out, not_nans_b
    if str(reduction) == str(MetricReduction.SUM):
        return f.sum(), not_nans.sum()
    if str(reduction) == str(MetricReduction.MEAN_BATCH):
        nn = not_nans.sum(axis=0)
        return np.where(nn > 0, f.sum(axis=0) / np.maximum(nn, 1), np.nan), nn
    if str(reduction) == str(MetricReduction.SUM_BATCH):
        return f.sum(axis=0), not_nans.sum(axis=0)
    if str(reduction) == str(MetricReduction.MEAN_CHANNEL):
        nn = not_nans.sum(axis=1)
        return np.where(nn > 0, f.sum(axis=1) / np.maximum(nn, 1), np.nan), nn
    if str(reduction) == str(MetricReduction.SUM_CHANNEL):
        return f.sum(axis=1), not_nans.sum(axis=1)
    raise ValueError(f"Unsupported reduction: {reduction}")


def is_binary_tensor(input_data, name: str) -> None:
    arr = to_numpy(input_data)
    if not np.all(np.isin(arr, [0, 1])):
        import warnings

        warnings.warn(f"{name} should be a binarized array.")


def get_mask_edges(seg_pred, seg_gt, label_idx: int = 1, crop: bool = True,
                   spacing=None, always_return_as_numpy: bool = True):
    """Binary erosion edge extraction (reference: metrics/utils.py:139-242).

    Host-side scipy; cropping to the union bounding box first, as the reference does, to
    keep the EDT cheap.
    """
    from scipy import ndimage as ndi

    seg_pred = to_numpy(seg_pred).astype(bool) if to_numpy(seg_pred).dtype != bool else to_numpy(seg_pred)
    seg_gt_np = to_numpy(seg_gt)
    seg_gt_b = seg_gt_np.astype(bool) if seg_gt_np.dtype != bool else seg_gt_np
    if seg_pred.shape != seg_gt_b.shape:
        raise ValueError(f"seg_pred and seg_gt should have same shapes, got {seg_pred.shape} and {seg_gt_b.shape}.")
    if crop:
        union = seg_pred | seg_gt_b
        if not union.any():
            return np.zeros_like(seg_pred), np.zeros_like(seg_gt_b)
        coords = np.nonzero(union)
        slices = []
        for d, c in enumerate(coords):
            lo = max(int(c.min()) - 1, 0)
            hi = min(int(c.max()) + 2, union.shape[d])
            slices.append(slice(lo, hi))
        seg_pred = seg_pred[tuple(slices)]
        seg_gt_b = seg_gt_b[tuple(slices)]
    edges_pred = seg_pred ^ ndi.binary_erosion(seg_pred)
    edges_gt = seg_gt_b ^ ndi.binary_erosion(seg_gt_b)
    return edges_pred, edges_gt


def get_surface_distance(seg_pred: np.ndarray, seg_gt: np.ndarray, distance_metric: str = "euclidean",
                         spacing=None) -> np.ndarray:
    """Distances from pred edge points to gt surface (reference: metrics/utils.py:—)."""
    from scipy import ndimage as ndi

    if not np.any(seg_gt):
        dis = np.inf * np.ones_like(seg_gt, dtype=np.float64)
    else:
        if not np.any(seg_pred):
            return np.asarray([])
        if distance_metric == "euclidean":
            dis = ndi.distance_transform_edt(~seg_gt, sampling=spacing)
        elif distance_metric in ("chessboard", "taxicab"):
            dis = ndi.distance_transform_cdt(~seg_gt, metric=distance_metric)
        else:
            raise ValueError(f"distance_metric {distance_metric} is not implemented.")
    return np.asarray(dis[seg_pred])


def remap_instance_id(pred: np.ndarray, by_size: bool = False) -> np.ndarray:
    """Renumber instance ids contiguously (reference: metrics/utils.py:—)."""
    pred = to_numpy(pred)
    pred_id = sorted(set(np.unique(pred)) - {0})
    if len(pred_id) == 0:
        return pred
    if by_size:
        instance_size = [(pred == i).sum() for i in pred_id]
        pred_id = [x for _, x in sorted(zip(instance_size, pred_id), reverse=True)]
    new_pred = np.zeros_like(pred)
    for idx, instance_id in enumerate(pred_id):
        new_pred[pred == instance_id] = idx + 1
    return new_pred
