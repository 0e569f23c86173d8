"""Additional metrics: F-beta, panoptic quality, loss metric, variance/label quality.

Parity targets: monai/metrics/{f_beta_score.py, panoptic_quality.py, loss_metric.py,
active_learning_metrics.py}.
"""
from __future__ import annotations

from collections.abc import Callable

import numpy as np

from ..utils.backend import to_numpy
from ..utils.enums import MetricReduction
from .confusion_matrix import get_confusion_matrix
from .metric import CumulativeIterationMetric
from .utils import do_metric_reduction, remap_instance_id

__all__ = ["FBetaScore", "PanopticQualityMetric", "compute_panoptic_quality", "LossMetric",
           "VarianceMetric", "LabelQualityScore", "compute_variance", "label_quality_score"]


class FBetaScore(CumulativeIterationMetric):
    """F-beta from the confusion matrix (reference: f_beta_score.py)."""

    def __init__(self, beta: float = 1.0, include_background: bool = True,
                 reduction: str = MetricReduction.MEAN, get_not_nans: bool = False):
        super().__init__()
        self.beta = beta
        self.include_background = include_background
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        return get_confusion_matrix(y_pred=y_pred, y=y, include_background=self.include_background)

    def aggregate(self, compute_sample: bool = False, reduction=None):
        data = self.get_buffer()
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        f = np.atleast_1d(np.asarray(f))
        tp, fp, _tn, fn = f[..., 0], f[..., 1], f[..., 2], f[..., 3]
        beta2 = self.beta**2
        numer = (1 + beta2) * tp
        denom = (1 + beta2) * tp + beta2 * fn + fp
        score = np.where(denom > 0, numer / np.maximum(denom, 1e-12), np.nan)
        return (score, not_nans) if self.get_not_nans else score


def compute_panoptic_quality(pred: np.ndarray, gt: np.ndarray, metric_name: str = "pq",
                             remap: bool = True, match_iou_threshold: float = 0.5,
                             smooth_numerator: float = 1e-6):
    """Panoptic quality of instance maps (reference: panoptic_quality.py)."""
    pred = to_numpy(pred)
    gt = to_numpy(gt)
    if remap:
        pred = remap_instance_id(pred)
        gt = remap_instance_id(gt)
    pred_ids = sorted(set(np.unique(pred)) - {0})
    gt_ids = sorted(set(np.unique(gt)) - {0})
    pairwise_iou = np.zeros((len(gt_ids), len(pred_ids)))
    for gi, g in enumerate(gt_ids):
        g_mask = gt == g
        for pi, p in enumerate(pred_ids):
            p_mask = pred == p
            inter = np.logical_and(g_mask, p_mask).sum()
            if inter == 0:
                continue
            union = np.logical_or(g_mask, p_mask).sum()
            pairwise_iou[gi, pi] = inter / union
    matched = pairwise_iou > match_iou_threshold
    tp_pairs = np.argwhere(matched)
    tp = len(tp_pairs)
    fp = len(pred_ids) - tp
    fn = len(gt_ids) - tp
    iou_sum = pairwise_iou[matched].sum()
    sq = iou_sum / (tp + smooth_numerator)
    rq = tp / (tp + 0.5 * fp + 0.5 * fn + smooth_numerator)
    name = metric_name.lower()
    if name in ("pq", "panoptic_quality"):
        return float(sq * rq)
    if name in ("sq", "segmentation_quality"):
        return float(sq)
    if name in ("rq", "recognition_quality"):
        return float(rq)
    raise ValueError(f"metric name {metric_name} not supported, choose pq/sq/rq.")


class PanopticQualityMetric(CumulativeIterationMetric):
    """(reference: panoptic_quality.py PanopticQualityMetric)."""

    def __init__(self, num_classes: int, metric_name: str = "pq",
                 reduction: str = MetricReduction.MEAN_BATCH, match_iou_threshold: float = 0.5,
                 smooth_numerator: float = 1e-6):
        super().__init__()
        self.num_classes = num_classes
        self.metric_name = metric_name
        self.reduction = reduction
        self.match_iou_threshold = match_iou_threshold
        self.smooth_numerator = smooth_numerator

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        """y_pred/y: (B, 2, *spatial) with channel 0 = instance id, channel 1 = class."""
        y_pred = to_numpy(y_pred)
        y = to_numpy(y)
        b = y_pred.shape[0]
        outs = np.zeros((b, self.num_classes))
        for i in range(b):
            for c in range(self.num_classes):
                pred_inst = np.where(y_pred[i, 1] == c + 1, y_pred[i, 0], 0)
                gt_inst = np.where(y[i, 1] == c + 1, y[i, 0], 0)
                outs[i, c] = compute_panoptic_quality(pred_inst, gt_inst, self.metric_name,
                                                      True, self.match_iou_threshold,
                                                      self.smooth_numerator)
        return outs

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        f, _ = do_metric_reduction(data, reduction or self.reduction)
        return f


class LossMetric(CumulativeIterationMetric):
    """Wrap a loss function as a cumulative metric (reference: loss_metric.py)."""

    def __init__(self, loss_fn: Callable, reduction: str = MetricReduction.MEAN,
                 get_not_nans: bool = False):
        super().__init__()
        self.loss_fn = loss_fn
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        import jax.numpy as jnp

        if y is not None:
            val = self.loss_fn(jnp.asarray(to_numpy(y_pred)), jnp.asarray(to_numpy(y)))
        else:
            val = self.loss_fn(jnp.asarray(to_numpy(y_pred)))
        out = np.asarray(to_numpy(val))
        while out.ndim < 2:
            out = out[None]
        return out

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        return (f, not_nans) if self.get_not_nans else f


def compute_variance(y_pred, include_background: bool = True, spatial_map: bool = False,
                     scalar_reduction: str = "mean", threshold: float = 0.0005):
    """Variance across repeated predictions (reference: active_learning_metrics.py)."""
    y = to_numpy(y_pred).astype(np.float64)  # (repeats, C, *spatial)
    if not include_background and y.shape[1] > 1:
        y = y[:, 1:]
    # reference active_learning_metrics.py:137-150: clamp <=0 to threshold, fold
    # repeats*channels into one axis, population variance over it
    y = np.where(y <= 0, threshold, y)
    var = y.reshape((y.shape[0] * y.shape[1],) + y.shape[2:]).var(axis=0)
    if spatial_map:
        return var
    if scalar_reduction == "mean":
        return float(var.mean())
    if scalar_reduction == "sum":
        return float(var.sum())
    raise ValueError(f"scalar_reduction {scalar_reduction} not supported.")


def label_quality_score(y_pred, y, include_background: bool = True,
                        scalar_reduction: str = "mean"):
    """Absolute difference score between prediction and noisy label
    (reference: active_learning_metrics.py LabelQualityScore)."""
    y_pred = to_numpy(y_pred).astype(np.float64)
    y = to_numpy(y).astype(np.float64)
    if not include_background and y_pred.shape[1] > 1:
        y_pred = y_pred[:, 1:]
        y = y[:, 1:]
    diff = np.abs(y_pred - y).sum(axis=1)
    if scalar_reduction == "none":
        return diff
    if scalar_reduction == "mean":
        return diff.reshape(diff.shape[0], -1).mean(axis=1)
    if scalar_reduction == "sum":
        return diff.reshape(diff.shape[0], -1).sum(axis=1)
    raise ValueError(f"scalar_reduction {scalar_reduction} not supported.")


class VarianceMetric(CumulativeIterationMetric):
    """(reference: active_learning_metrics.py VarianceMetric)."""

    def __init__(self, include_background: bool = True, spatial_map: bool = False,
                 scalar_reduction: str = "sum", threshold: float = 0.0005):
        super().__init__()
        self.include_background = include_background
        self.spatial_map = spatial_map
        self.scalar_reduction = scalar_reduction
        self.threshold = threshold

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        out = compute_variance(y_pred, self.include_background, self.spatial_map,
                               self.scalar_reduction, self.threshold)
        return np.atleast_2d(out)

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        return np.nanmean(data)


class LabelQualityScore(CumulativeIterationMetric):
    def __init__(self, include_background: bool = True, scalar_reduction: str = "sum"):
        super().__init__()
        self.include_background = include_background
        self.scalar_reduction = scalar_reduction

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        out = label_quality_score(y_pred, y, self.include_background, self.scalar_reduction)
        return np.atleast_2d(np.asarray(out)).T

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        return np.nanmean(data)


def get_f_beta_score(y_pred, y, include_background: bool = True):
    """Per-class (tp, fp, tn, fn) confusion counts for F-beta (reference:
    f_beta_score.py:63). Returns (B, C, 4)."""
    import numpy as np

    from ..utils.backend import to_numpy

    yp = to_numpy(y_pred)
    yt = to_numpy(y)
    if not include_background:
        yp, yt = yp[:, 1:], yt[:, 1:]
    if yp.shape != yt.shape:
        raise ValueError(f"y_pred and y should have same shapes, got {yp.shape} and {yt.shape}.")
    b, c = yp.shape[:2]
    yp = yp.reshape(b, c, -1)
    yt = yt.reshape(b, c, -1)
    tp = ((yp + yt) == 2).sum(axis=2).astype(np.float64)
    tn = ((yp + yt) == 0).sum(axis=2).astype(np.float64)
    p = yt.sum(axis=2).astype(np.float64)
    n = yt.shape[-1] - p
    fn, fp = p - tp, n - tn
    return np.stack([tp, fp, tn, fn], axis=-1)


def compute_f_beta_score(confusion_matrix, beta: float):
    """F-beta from stacked (..., 4) = (tp, fp, tn, fn) counts (reference:
    f_beta_score.py:90)."""
    import numpy as np

    from ..utils.backend import to_numpy

    cm = to_numpy(confusion_matrix).astype(np.float64)
    if cm.ndim == 1:
        cm = cm[None]
    if cm.shape[-1] != 4:
        raise ValueError("the size of the last dimension of confusion_matrix should be 4.")
    tp, fp, fn = cm[..., 0], cm[..., 1], cm[..., 3]
    numerator = (1.0 + beta**2) * tp
    denominator = (1.0 + beta**2) * tp + beta**2 * fn + fp
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denominator != 0, numerator / denominator, np.nan)
