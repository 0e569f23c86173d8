"""Confusion-matrix metrics (reference: monai/metrics/confusion_matrix.py)."""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ..utils.backend import to_numpy
from ..utils.enums import MetricReduction
from .metric import CumulativeIterationMetric
from .utils import do_metric_reduction, ignore_background

__all__ = ["ConfusionMatrixMetric", "get_confusion_matrix", "compute_confusion_matrix_metric"]


def get_confusion_matrix(y_pred, y, include_background: bool = True) -> np.ndarray:
    """Per-sample per-class [tp, fp, tn, fn] (reference: confusion_matrix.py:—)."""
    if not include_background:
        y_pred, y = ignore_background(y_pred, y)
    y = to_numpy(y).astype(np.float64)
    y_pred = to_numpy(y_pred).astype(np.float64)
    if y.shape != y_pred.shape:
        raise ValueError(f"y_pred and y should have same shapes, got {y_pred.shape} and {y.shape}.")
    batch_size, n_class = y_pred.shape[:2]
    y_pred = y_pred.reshape(batch_size, n_class, -1)
    y = y.reshape(batch_size, n_class, -1)
    tp = ((y_pred + y) == 2).astype(np.float64).sum(axis=2)
    tn = ((y_pred + y) == 0).astype(np.float64).sum(axis=2)
    p = y.sum(axis=2)
    n = y.shape[-1] - p
    fn = p - tp
    fp = n - tn
    return np.stack([tp, fp, tn, fn], axis=-1)


def compute_confusion_matrix_metric(metric_name: str, confusion_matrix: np.ndarray) -> np.ndarray:
    """Derive a named metric from [tp, fp, tn, fn] (reference: confusion_matrix.py:—)."""
    metric = check_confusion_matrix_metric_name(metric_name)
    input_dim = confusion_matrix.ndim
    if input_dim == 1:
        confusion_matrix = confusion_matrix[None]
    if confusion_matrix.shape[-1] != 4:
        raise ValueError("the size of the last dimension of confusion_matrix should be 4.")
    tp = confusion_matrix[..., 0]
    fp = confusion_matrix[..., 1]
    tn = confusion_matrix[..., 2]
    fn = confusion_matrix[..., 3]
    p = tp + fn
    n = fp + tn
    nan = np.float64("nan")

    def div(num, denom):
        return np.where(denom != 0, num / np.where(denom == 0, 1, denom), nan)

    if metric == "tpr":
        return div(tp, p)
    if metric == "tnr":
        return div(tn, n)
    if metric == "ppv":
        return div(tp, tp + fp)
    if metric == "npv":
        return div(tn, tn + fn)
    if metric == "fnr":
        return div(fn, p)
    if metric == "fpr":
        return div(fp, n)
    if metric == "fdr":
        return div(fp, fp + tp)
    if metric == "for":
        return div(fn, fn + tn)
    if metric == "pt":
        tpr = div(tp, p)
        tnr = div(tn, n)
        return div(np.sqrt(tpr * (1.0 - tnr)) + tnr - 1.0, tpr + tnr - 1.0)
    if metric == "ts":
        return div(tp, tp + fn + fp)
    if metric == "acc":
        return div(tp + tn, p + n)
    if metric == "ba":
        return (div(tp, p) + div(tn, n)) / 2.0
    if metric == "f1":
        return div(tp * 2.0, tp * 2.0 + fn + fp)
    if metric == "mcc":
        numerator = tp * tn - fp * fn
        denominator = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        return div(numerator, denominator)
    if metric == "fm":
        tpr = div(tp, p)
        ppv = div(tp, tp + fp)
        return np.sqrt(ppv * tpr)
    if metric == "bm":
        return div(tp, p) + div(tn, n) - 1.0
    if metric == "mk":
        return div(tp, tp + fp) + div(tn, tn + fn) - 1.0
    raise NotImplementedError("the metric is not implemented.")


def check_confusion_matrix_metric_name(metric_name: str) -> str:
    """Normalize metric aliases (reference: confusion_matrix.py:—)."""
    metric_name = metric_name.replace(" ", "_").lower()
    aliases = {
        "sensitivity": "tpr", "recall": "tpr", "hit_rate": "tpr", "true_positive_rate": "tpr", "tpr": "tpr",
        "specificity": "tnr", "selectivity": "tnr", "true_negative_rate": "tnr", "tnr": "tnr",
        "precision": "ppv", "positive_predictive_value": "ppv", "ppv": "ppv",
        "negative_predictive_value": "npv", "npv": "npv",
        "miss_rate": "fnr", "false_negative_rate": "fnr", "fnr": "fnr",
        "fall_out": "fpr", "false_positive_rate": "fpr", "fpr": "fpr",
        "false_discovery_rate": "fdr", "fdr": "fdr",
        "false_omission_rate": "for", "for": "for",
        "prevalence_threshold": "pt", "pt": "pt",
        "threat_score": "ts", "critical_success_index": "ts", "ts": "ts", "csi": "ts",
        "accuracy": "acc", "acc": "acc",
        "balanced_accuracy": "ba", "ba": "ba",
        "f1_score": "f1", "f1": "f1",
        "matthews_correlation_coefficient": "mcc", "mcc": "mcc",
        "fowlkes_mallows_index": "fm", "fm": "fm",
        "informedness": "bm", "bookmaker_informedness": "bm", "bm": "bm", "youden_index": "bm",
        "markedness": "mk", "deltap": "mk", "mk": "mk",
    }
    if metric_name not in aliases:
        raise NotImplementedError("the metric is not implemented.")
    return aliases[metric_name]


class ConfusionMatrixMetric(CumulativeIterationMetric):
    """Cumulative confusion-matrix metrics (reference: confusion_matrix.py:—)."""

    def __init__(self, include_background: bool = True, metric_name: Sequence[str] | str = "hit_rate",
                 compute_sample: bool = False, reduction: str = MetricReduction.MEAN,
                 get_not_nans: bool = False):
        super().__init__()
        self.include_background = include_background
        self.metric_name = (metric_name,) if isinstance(metric_name, str) else tuple(metric_name)
        self.compute_sample = compute_sample
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        if y is None:
            raise ValueError("y must be provided.")
        return get_confusion_matrix(y_pred, y, self.include_background)

    def aggregate(self, compute_sample: bool = False, reduction=None):
        data = self.get_buffer()
        results = []
        for metric_name in self.metric_name:
            if compute_sample or self.compute_sample:
                sub_confusion_matrix = compute_confusion_matrix_metric(metric_name, data)
                f, not_nans = do_metric_reduction(sub_confusion_matrix, reduction or self.reduction)
            else:
                f, not_nans = do_metric_reduction(data, reduction or self.reduction)
                f = compute_confusion_matrix_metric(metric_name, f)
            if self.get_not_nans:
                results.append((f, not_nans))
            else:
                results.append(f)
        return results
