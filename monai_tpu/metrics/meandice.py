"""Dice metric (reference: monai/metrics/meandice.py:24 DiceMetric, :172 compute_dice,
:210 DiceHelper)."""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import numpy as np

from ..networks.utils import one_hot
from ..utils.backend import to_numpy, xp
from ..utils.enums import MetricReduction
from .metric import CumulativeIterationMetric
from .utils import do_metric_reduction, ignore_background

__all__ = ["DiceMetric", "compute_dice", "DiceHelper", "MeanIoU", "compute_iou",
           "GeneralizedDiceScore", "compute_generalized_dice"]


def _binary_stats(y_pred, y, include_background: bool):
    if not include_background:
        y_pred, y = ignore_background(y_pred, y)
    y = to_numpy(y).astype(np.float64)
    y_pred = to_numpy(y_pred).astype(np.float64)
    if y.shape != y_pred.shape:
        raise ValueError(f"y_pred and y should have same shapes, got {y_pred.shape} and {y.shape}.")
    n_len = y_pred.ndim
    reduce_axis = tuple(range(2, n_len))
    intersection = np.sum(y * y_pred, axis=reduce_axis)
    y_o = np.sum(y, axis=reduce_axis)
    y_pred_o = np.sum(y_pred, axis=reduce_axis)
    return intersection, y_o, y_pred_o


def compute_dice(y_pred, y, include_background: bool = True, ignore_empty: bool = True,
                 num_classes: int | None = None) -> np.ndarray:
    """Per-sample per-class dice (reference: meandice.py:172)."""
    if num_classes is not None and y_pred.shape[1] == 1:
        y_pred = one_hot(to_numpy(y_pred), num_classes, dim=1)
        if y.shape[1] == 1:
            y = one_hot(to_numpy(y), num_classes, dim=1)
    intersection, y_o, y_pred_o = _binary_stats(y_pred, y, include_background)
    denominator = y_o + y_pred_o
    dice = np.where(denominator > 0, (2.0 * intersection) / np.maximum(denominator, 1e-12), np.nan)
    if not ignore_empty:
        # empty gt & empty pred → 1; empty gt, nonempty pred → 0
        dice = np.where(y_o > 0, dice, np.where(y_pred_o > 0, 0.0, 1.0))
    else:
        dice = np.where(y_o > 0, dice, np.nan)
    return dice


class DiceMetric(CumulativeIterationMetric):
    """Cumulative mean dice (reference: meandice.py:24)."""

    def __init__(self, include_background: bool = True, reduction: str = MetricReduction.MEAN,
                 get_not_nans: bool = False, ignore_empty: bool = True, num_classes: int | None = None,
                 return_with_label: bool = False):
        super().__init__()
        self.include_background = include_background
        self.reduction = reduction
        self.get_not_nans = get_not_nans
        self.ignore_empty = ignore_empty
        self.num_classes = num_classes
        self.return_with_label = return_with_label

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        if y is None:
            raise ValueError("y must be provided to compute the dice metric.")
        if y_pred.ndim < 3:
            raise ValueError(f"y_pred should have at least 3 dimensions (batch, channel, spatial), got {y_pred.ndim}.")
        return compute_dice(y_pred, y, self.include_background, self.ignore_empty, self.num_classes)

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        if data is None:
            raise RuntimeError("the data to aggregate must be a synchronized array.")
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        if self.return_with_label:
            _f = {}
            items = np.atleast_1d(f)
            labels = self.return_with_label if isinstance(self.return_with_label, (list, tuple)) else None
            for i, v in enumerate(items):
                name = labels[i] if labels else (f"label_{i + 1}" if not self.include_background else f"label_{i}")
                _f[name] = float(np.round(v, 4))
            f = _f
        return (f, not_nans) if self.get_not_nans else f


class DiceHelper:
    """Dice from raw model outputs: handles activation/argmax
    (reference: meandice.py:210)."""

    def __init__(self, include_background: bool | None = None, sigmoid: bool = False,
                 softmax: bool | None = None, activate: bool = False, get_not_nans: bool = True,
                 reduction: str = MetricReduction.MEAN_BATCH, ignore_empty: bool = True,
                 num_classes: int | None = None):
        self.sigmoid = sigmoid
        self.reduction = reduction
        self.get_not_nans = get_not_nans
        self.include_background = sigmoid if include_background is None else include_background
        self.softmax = not sigmoid if softmax is None else softmax
        self.activate = activate
        self.ignore_empty = ignore_empty
        self.num_classes = num_classes

    def compute_channel(self, y_pred, y):
        intersection = np.sum(to_numpy(y) * to_numpy(y_pred))
        y_o = np.sum(to_numpy(y))
        pred_o = np.sum(to_numpy(y_pred))
        denominator = y_o + pred_o
        if y_o > 0:
            return (2.0 * intersection) / denominator
        if self.ignore_empty:
            return np.float64("nan")
        return np.float64(1.0 if pred_o <= 0 else 0.0)

    def __call__(self, y_pred, y):
        y_pred_np = to_numpy(y_pred)
        n_pred_ch = y_pred_np.shape[1] if self.num_classes is None else self.num_classes
        if self.softmax and n_pred_ch > 1:
            y_pred_np = np.argmax(y_pred_np, axis=1, keepdims=True)
        elif self.sigmoid:
            if self.activate:
                y_pred_np = 1 / (1 + np.exp(-y_pred_np))
            y_pred_np = (y_pred_np > 0.5).astype(np.float32)
        first_ch = 0 if self.include_background else 1
        data = []
        y_np = to_numpy(y)
        for b in range(y_pred_np.shape[0]):
            c_list = []
            for c in range(first_ch, n_pred_ch) if n_pred_ch > 1 else [1]:
                x_pred = (y_pred_np[b, 0] == c) if (y_pred_np.shape[1] == 1) else y_pred_np[b, c]
                x = (y_np[b, 0] == c) if (y_np.shape[1] == 1) else y_np[b, c]
                c_list.append(self.compute_channel(x_pred, x))
            data.append(np.stack(c_list))
        data = np.stack(data, axis=0)
        f, not_nans = do_metric_reduction(data, self.reduction)
        return (f, not_nans) if self.get_not_nans else f


def compute_iou(y_pred, y, include_background: bool = True, ignore_empty: bool = True) -> np.ndarray:
    """Per-sample per-class IoU (reference: meaniou.py:—)."""
    intersection, y_o, y_pred_o = _binary_stats(y_pred, y, include_background)
    union = y_o + y_pred_o - intersection
    iou = np.where(union > 0, intersection / np.maximum(union, 1e-12), np.nan)
    if ignore_empty:
        iou = np.where(y_o > 0, iou, np.nan)
    else:
        iou = np.where(y_o > 0, iou, np.where(y_pred_o > 0, 0.0, 1.0))
    return iou


class MeanIoU(CumulativeIterationMetric):
    """Cumulative mean IoU (reference: monai/metrics/meaniou.py)."""

    def __init__(self, include_background: bool = True, reduction: str = MetricReduction.MEAN,
                 get_not_nans: bool = False, ignore_empty: bool = True):
        super().__init__()
        self.include_background = include_background
        self.reduction = reduction
        self.get_not_nans = get_not_nans
        self.ignore_empty = ignore_empty

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        if y is None:
            raise ValueError("y must be provided.")
        return compute_iou(y_pred, y, self.include_background, self.ignore_empty)

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        return (f, not_nans) if self.get_not_nans else f


def compute_generalized_dice(y_pred, y, include_background: bool = True,
                             weight_type: str = "square", sum_over_classes: bool = False) -> np.ndarray:
    """Generalized dice score (reference: generalized_dice.py:—)."""
    if not include_background:
        y_pred, y = ignore_background(y_pred, y)
    y = to_numpy(y).astype(np.float64)
    y_pred = to_numpy(y_pred).astype(np.float64)
    reduce_axis = tuple(range(2, y_pred.ndim))
    intersection = np.sum(y * y_pred, axis=reduce_axis)
    y_o = np.sum(y, axis=reduce_axis)
    y_pred_o = np.sum(y_pred, axis=reduce_axis)
    denominator = y_o + y_pred_o
    if weight_type == "simple":
        w = 1.0 / np.maximum(y_o, 1e-12)
    elif weight_type == "square":
        w = 1.0 / np.maximum(y_o * y_o, 1e-12)
    else:
        w = np.ones_like(y_o)
    infs = np.isinf(w) | (y_o == 0)
    w_max = np.where(infs, 0, w).max(axis=1, keepdims=True)
    w = np.where(infs, w_max, w)
    if sum_over_classes:
        numer = 2.0 * (intersection * w).sum(axis=1, keepdims=True)
        denom = (denominator * w).sum(axis=1, keepdims=True)
        y_pred_o_sum = y_pred_o.sum(axis=1, keepdims=True)
        gds = np.where(denom > 0, numer / np.maximum(denom, 1e-12),
                       np.where(y_pred_o_sum > 0, 0.0, 1.0))
    else:
        numer = 2.0 * (intersection * w)
        denom = denominator * w
        gds = np.where(denom > 0, numer / np.maximum(denom, 1e-12),
                       np.where(y_pred_o > 0, 0.0, 1.0))
    return gds


class GeneralizedDiceScore(CumulativeIterationMetric):
    """(reference: monai/metrics/generalized_dice.py)."""

    def __init__(self, include_background: bool = True, reduction: str = MetricReduction.MEAN,
                 weight_type: str = "square"):
        super().__init__()
        self.include_background = include_background
        self.reduction = reduction
        self.weight_type = weight_type
        # reference generalized_dice.py:38: class-sum before reduction for these modes
        self.sum_over_classes = str(reduction) in {
            str(MetricReduction.SUM), str(MetricReduction.MEAN),
            str(MetricReduction.MEAN_CHANNEL), str(MetricReduction.SUM_CHANNEL)}

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        return compute_generalized_dice(y_pred, y, self.include_background, self.weight_type,
                                        sum_over_classes=self.sum_over_classes)

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        f, _ = do_metric_reduction(data, reduction or self.reduction)
        return f
