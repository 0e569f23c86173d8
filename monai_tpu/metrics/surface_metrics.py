"""Surface-based metrics: Hausdorff distance, average surface distance, surface dice.

Parity targets: monai/metrics/hausdorff_distance.py, surface_distance.py, surface_dice.py.
Edge extraction + EDT run host-side (scipy); a Pallas jump-flooding EDT is the future
device path.
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ..utils.backend import to_numpy
from ..utils.enums import MetricReduction
from .metric import CumulativeIterationMetric
from .utils import do_metric_reduction, get_mask_edges, get_surface_distance, ignore_background

__all__ = ["HausdorffDistanceMetric", "compute_hausdorff_distance", "SurfaceDistanceMetric",
           "compute_average_surface_distance", "SurfaceDiceMetric", "compute_surface_dice"]


def _per_class_loop(y_pred, y, fn):
    y_pred = to_numpy(y_pred)
    y = to_numpy(y)
    batch_size, n_class = y_pred.shape[:2]
    out = np.empty((batch_size, n_class), dtype=np.float64)
    for b in range(batch_size):
        for c in range(n_class):
            out[b, c] = fn(y_pred[b, c], y[b, c])
    return out


def compute_hausdorff_distance(y_pred, y, include_background: bool = False,
                               distance_metric: str = "euclidean", percentile: float | None = None,
                               directed: bool = False, spacing=None) -> np.ndarray:
    """(reference: hausdorff_distance.py:—)."""
    if not include_background:
        y_pred, y = ignore_background(y_pred, y)

    def _hd(pred_c, gt_c):
        edges_pred, edges_gt = get_mask_edges(pred_c, gt_c)
        if not np.any(edges_gt) or not np.any(edges_pred):
            return np.inf if (np.any(edges_gt) != np.any(edges_pred)) else np.nan
        d1 = _surface_percentile(edges_pred, edges_gt, distance_metric, percentile, spacing)
        if directed:
            return d1
        d2 = _surface_percentile(edges_gt, edges_pred, distance_metric, percentile, spacing)
        return max(d1, d2)

    return _per_class_loop(y_pred, y, _hd)


def _surface_percentile(edges_pred, edges_gt, distance_metric, percentile, spacing):
    sd = get_surface_distance(edges_pred, edges_gt, distance_metric, spacing)
    if sd.shape == (0,):
        return np.nan
    if not percentile:
        return sd.max()
    if 0 <= percentile <= 100:
        return np.percentile(sd, percentile)
    raise ValueError(f"percentile should be a value between 0 and 100, got {percentile}.")


class HausdorffDistanceMetric(CumulativeIterationMetric):
    """(reference: hausdorff_distance.py:—)."""

    def __init__(self, include_background: bool = False, distance_metric: str = "euclidean",
                 percentile: float | None = None, directed: bool = False,
                 reduction: str = MetricReduction.MEAN, get_not_nans: bool = False):
        super().__init__()
        self.include_background = include_background
        self.distance_metric = distance_metric
        self.percentile = percentile
        self.directed = directed
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        spacing = kwargs.get("spacing")
        return compute_hausdorff_distance(y_pred, y, self.include_background, self.distance_metric,
                                          self.percentile, self.directed, spacing)

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        # treat inf as nan for reduction
        data = np.where(np.isinf(data), np.nan, data)
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        return (f, not_nans) if self.get_not_nans else f


def compute_average_surface_distance(y_pred, y, include_background: bool = False,
                                     symmetric: bool = False, distance_metric: str = "euclidean",
                                     spacing=None) -> np.ndarray:
    """(reference: surface_distance.py:—)."""
    if not include_background:
        y_pred, y = ignore_background(y_pred, y)

    def _asd(pred_c, gt_c):
        edges_pred, edges_gt = get_mask_edges(pred_c, gt_c)
        if not np.any(edges_gt) or not np.any(edges_pred):
            return np.nan
        sd = get_surface_distance(edges_pred, edges_gt, distance_metric, spacing)
        if symmetric:
            sd2 = get_surface_distance(edges_gt, edges_pred, distance_metric, spacing)
            sd = np.concatenate([sd, sd2])
        return np.nan if sd.shape == (0,) else sd.mean()

    return _per_class_loop(y_pred, y, _asd)


class SurfaceDistanceMetric(CumulativeIterationMetric):
    """(reference: surface_distance.py:—)."""

    def __init__(self, include_background: bool = False, symmetric: bool = False,
                 distance_metric: str = "euclidean", reduction: str = MetricReduction.MEAN,
                 get_not_nans: bool = False):
        super().__init__()
        self.include_background = include_background
        self.distance_metric = distance_metric
        self.symmetric = symmetric
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        spacing = kwargs.get("spacing")
        return compute_average_surface_distance(y_pred, y, self.include_background, self.symmetric,
                                                self.distance_metric, spacing)

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        data = np.where(np.isinf(data), np.nan, data)
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        return (f, not_nans) if self.get_not_nans else f


def compute_surface_dice(y_pred, y, class_thresholds: Sequence[float], include_background: bool = False,
                         distance_metric: str = "euclidean", spacing=None,
                         use_subvoxels: bool = False) -> np.ndarray:
    """Normalized surface dice (reference: surface_dice.py:—)."""
    if not include_background:
        y_pred, y = ignore_background(y_pred, y)
    y_pred_np = to_numpy(y_pred)
    y_np = to_numpy(y)
    batch_size, n_class = y_pred_np.shape[:2]
    if n_class != len(class_thresholds):
        raise ValueError(f"number of classes ({n_class}) does not match number of class thresholds ({len(class_thresholds)}).")
    nsd = np.empty((batch_size, n_class), dtype=np.float64)
    for b in range(batch_size):
        for c in range(n_class):
            edges_pred, edges_gt = get_mask_edges(y_pred_np[b, c], y_np[b, c])
            if not np.any(edges_gt) and not np.any(edges_pred):
                nsd[b, c] = np.nan
                continue
            dist_pred_to_gt = get_surface_distance(edges_pred, edges_gt, distance_metric, spacing)
            dist_gt_to_pred = get_surface_distance(edges_gt, edges_pred, distance_metric, spacing)
            boundary_complete = len(dist_pred_to_gt) + len(dist_gt_to_pred)
            boundary_correct = np.sum(dist_pred_to_gt <= class_thresholds[c]) + np.sum(
                dist_gt_to_pred <= class_thresholds[c])
            nsd[b, c] = np.nan if boundary_complete == 0 else boundary_correct / boundary_complete
    return nsd


class SurfaceDiceMetric(CumulativeIterationMetric):
    """(reference: surface_dice.py:—)."""

    def __init__(self, class_thresholds: Sequence[float], include_background: bool = False,
                 distance_metric: str = "euclidean", reduction: str = MetricReduction.MEAN,
                 get_not_nans: bool = False, use_subvoxels: bool = False):
        super().__init__()
        self.class_thresholds = class_thresholds
        self.include_background = include_background
        self.distance_metric = distance_metric
        self.reduction = reduction
        self.get_not_nans = get_not_nans
        self.use_subvoxels = use_subvoxels

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        spacing = kwargs.get("spacing")
        return compute_surface_dice(y_pred, y, self.class_thresholds, self.include_background,
                                    self.distance_metric, spacing, self.use_subvoxels)

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        return (f, not_nans) if self.get_not_nans else f
