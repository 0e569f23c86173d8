"""Metric attachment handlers bridging CumulativeIterationMetric into the engine.

Parity targets: monai/handlers/ignite_metric.py:43 and the per-metric handlers
(mean_dice.py, mean_iou.py, roc_auc.py, confusion_matrix.py, hausdorff_distance.py,
surface_distance.py, metrics_reloaded_handler.py).
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

from ..engines.events import Events
from ..metrics import (
    ConfusionMatrixMetric,
    DiceMetric,
    HausdorffDistanceMetric,
    MeanIoU,
    MSEMetric,
    MAEMetric,
    RMSEMetric,
    PSNRMetric,
    ROCAUCMetric,
    SurfaceDistanceMetric,
)
from ..utils.backend import to_numpy
from ..utils.enums import CommonKeys, MetricReduction

__all__ = ["IgniteMetricHandler", "MeanDice", "MeanIoUHandler", "ROCAUC", "ConfusionMatrix",
           "HausdorffDistance", "SurfaceDistance", "MeanSquaredError", "MeanAbsoluteError",
           "RootMeanSquaredError", "PeakSignalToNoiseRatio", "from_engine"]


def from_engine(keys, first: bool = False):
    """Extract values from engine output dict(s) (reference: monai/handlers/utils.py)."""
    from ..utils.misc import ensure_tuple

    keys = ensure_tuple(keys)

    def _wrapper(data):
        if isinstance(data, dict):
            return tuple(data[k] for k in keys)
        if isinstance(data, list) and isinstance(data[0], dict):
            ret = [data[0][k] if first else [i[k] for i in data] for k in keys]
            return tuple(ret) if len(ret) > 1 else ret[0]
        return data

    return _wrapper


class IgniteMetricHandler:
    """Attach a CumulativeIterationMetric to an engine (reference: ignite_metric.py:43)."""

    def __init__(self, metric_fn=None, loss_fn=None, output_transform: Callable = lambda x: x,
                 save_details: bool = True, reduction: str = MetricReduction.MEAN,
                 get_not_nans: bool = False):
        self.metric_fn = metric_fn
        self.loss_fn = loss_fn
        self.output_transform = output_transform
        self.save_details = save_details
        self._name: str | None = None

    def attach(self, engine, name: str) -> None:
        self._name = name
        engine.add_event_handler(Events.ITERATION_COMPLETED, self._update)
        engine.add_event_handler(Events.EPOCH_COMPLETED, self._aggregate)
        engine.add_event_handler(Events.EPOCH_STARTED, self._reset)

    def _reset(self, engine) -> None:
        if self.metric_fn is not None:
            self.metric_fn.reset()

    def _update(self, engine) -> None:
        output = self.output_transform(engine.state.output)
        if output is None:
            return
        y_pred, y = output if isinstance(output, tuple) else (output, None)

        def _stack(v):
            if isinstance(v, list):
                return np.stack([np.asarray(to_numpy(getattr(i, "data", i))) for i in v])
            return np.asarray(to_numpy(getattr(v, "data", v)))

        self.metric_fn(_stack(y_pred), _stack(y) if y is not None else None)

    # -- CumulativeIterationMetric protocol delegation ------------------------
    # The reference's Workflow accepts handler instances directly in
    # key_val_metric/additional_metrics (workflow.py metric wiring); delegating
    # lets these handlers double as metrics there.
    def __call__(self, y_pred, y=None):
        return self.metric_fn(y_pred, y)

    def aggregate(self, *args, **kwargs):
        return self.metric_fn.aggregate(*args, **kwargs)

    def reset(self) -> None:
        self.metric_fn.reset()

    def get_buffer(self):
        return self.metric_fn.get_buffer()

    def _aggregate(self, engine) -> None:
        result = self.metric_fn.aggregate()
        if isinstance(result, (tuple, list)):
            result = result[0]
        if self.save_details and self._name is not None:
            engine.state.metric_details[self._name] = self.metric_fn.get_buffer()
        value = float(np.asarray(result).reshape(-1)[0]) if np.asarray(result).size else float("nan")
        engine.state.metrics[self._name] = value
        key_name = engine.state.key_metric_name
        if key_name == self._name:
            if engine.state.best_metric_epoch == -1 or engine.metric_cmp_fn(value, engine.state.best_metric):
                engine.state.best_metric = value
                engine.state.best_metric_epoch = engine.state.epoch
        self.metric_fn.reset()


class MeanDice(IgniteMetricHandler):
    """(reference: monai/handlers/mean_dice.py)."""

    def __init__(self, include_background: bool = True, reduction: str = MetricReduction.MEAN,
                 num_classes: int | None = None, output_transform: Callable = lambda x: x,
                 save_details: bool = True, return_with_label: bool = False):
        super().__init__(metric_fn=DiceMetric(include_background=include_background, reduction=reduction,
                                              num_classes=num_classes, return_with_label=return_with_label),
                         output_transform=output_transform, save_details=save_details)


class MeanIoUHandler(IgniteMetricHandler):
    def __init__(self, include_background: bool = True, reduction: str = MetricReduction.MEAN,
                 output_transform: Callable = lambda x: x, save_details: bool = True):
        super().__init__(metric_fn=MeanIoU(include_background=include_background, reduction=reduction),
                         output_transform=output_transform, save_details=save_details)


class ROCAUC(IgniteMetricHandler):
    def __init__(self, average: str = "macro", output_transform: Callable = lambda x: x):
        super().__init__(metric_fn=ROCAUCMetric(average=average), output_transform=output_transform,
                         save_details=False)


class ConfusionMatrix(IgniteMetricHandler):
    def __init__(self, include_background: bool = True, metric_name: str = "hit_rate",
                 compute_sample: bool = False, reduction: str = MetricReduction.MEAN,
                 output_transform: Callable = lambda x: x, save_details: bool = True):
        super().__init__(metric_fn=ConfusionMatrixMetric(include_background=include_background,
                                                         metric_name=metric_name,
                                                         compute_sample=compute_sample,
                                                         reduction=reduction),
                         output_transform=output_transform, save_details=save_details)

    def _aggregate(self, engine) -> None:
        results = self.metric_fn.aggregate()
        value = results[0]
        if isinstance(value, (tuple, list)):
            value = value[0]
        engine.state.metrics[self._name] = float(np.asarray(value).reshape(-1)[0])
        self.metric_fn.reset()


class HausdorffDistance(IgniteMetricHandler):
    def __init__(self, include_background: bool = False, distance_metric: str = "euclidean",
                 percentile: float | None = None, directed: bool = False,
                 reduction: str = MetricReduction.MEAN, output_transform: Callable = lambda x: x,
                 save_details: bool = True):
        super().__init__(metric_fn=HausdorffDistanceMetric(include_background=include_background,
                                                           distance_metric=distance_metric,
                                                           percentile=percentile, directed=directed,
                                                           reduction=reduction),
                         output_transform=output_transform, save_details=save_details)


class SurfaceDistance(IgniteMetricHandler):
    def __init__(self, include_background: bool = False, symmetric: bool = False,
                 distance_metric: str = "euclidean", reduction: str = MetricReduction.MEAN,
                 output_transform: Callable = lambda x: x, save_details: bool = True):
        super().__init__(metric_fn=SurfaceDistanceMetric(include_background=include_background,
                                                         symmetric=symmetric,
                                                         distance_metric=distance_metric,
                                                         reduction=reduction),
                         output_transform=output_transform, save_details=save_details)


class MeanSquaredError(IgniteMetricHandler):
    def __init__(self, reduction: str = MetricReduction.MEAN, output_transform: Callable = lambda x: x):
        super().__init__(metric_fn=MSEMetric(reduction=reduction), output_transform=output_transform)


class MeanAbsoluteError(IgniteMetricHandler):
    def __init__(self, reduction: str = MetricReduction.MEAN, output_transform: Callable = lambda x: x):
        super().__init__(metric_fn=MAEMetric(reduction=reduction), output_transform=output_transform)


class RootMeanSquaredError(IgniteMetricHandler):
    def __init__(self, reduction: str = MetricReduction.MEAN, output_transform: Callable = lambda x: x):
        super().__init__(metric_fn=RMSEMetric(reduction=reduction), output_transform=output_transform)


class PeakSignalToNoiseRatio(IgniteMetricHandler):
    def __init__(self, max_val: float, reduction: str = MetricReduction.MEAN,
                 output_transform: Callable = lambda x: x):
        super().__init__(metric_fn=PSNRMetric(max_val=max_val, reduction=reduction),
                         output_transform=output_transform)


class AveragePrecision(IgniteMetricHandler):
    """(reference: handlers/average_precision.py AveragePrecision)."""

    def __init__(self, average="macro", output_transform=lambda x: x,
                 save_details: bool = True):
        from ..metrics.regression import AveragePrecisionMetric

        super().__init__(metric_fn=AveragePrecisionMetric(average=average),
                         output_transform=output_transform, save_details=save_details)


class PanopticQuality(IgniteMetricHandler):
    """(reference: handlers/panoptic_quality.py PanopticQuality)."""

    def __init__(self, num_classes: int, metric_name: str = "pq",
                 reduction="mean_batch", match_iou_threshold: float = 0.5,
                 smooth_numerator: float = 1e-6, output_transform=lambda x: x,
                 save_details: bool = True):
        from ..metrics.extra_metrics import PanopticQualityMetric

        metric_fn = PanopticQualityMetric(num_classes=num_classes, metric_name=metric_name,
                                          reduction=reduction,
                                          match_iou_threshold=match_iou_threshold,
                                          smooth_numerator=smooth_numerator)
        super().__init__(metric_fn=metric_fn, output_transform=output_transform,
                         save_details=save_details)


class MetricsReloadedBinaryHandler(IgniteMetricHandler):
    """(reference: handlers/metrics_reloaded_handler.py). Requires the optional
    MetricsReloaded package via metrics.metrics_reloaded."""

    def __init__(self, metric_name: str, include_background: bool = True,
                 reduction="mean", get_not_nans: bool = False,
                 output_transform=lambda x: x, save_details: bool = True):
        from ..metrics.metrics_reloaded import MetricsReloadedBinary

        super().__init__(metric_fn=MetricsReloadedBinary(metric_name, include_background,
                                                         reduction, get_not_nans),
                         output_transform=output_transform, save_details=save_details)


class MetricsReloadedCategoricalHandler(IgniteMetricHandler):
    """(reference: handlers/metrics_reloaded_handler.py)."""

    def __init__(self, metric_name: str, include_background: bool = True,
                 reduction="mean", get_not_nans: bool = False,
                 output_transform=lambda x: x, save_details: bool = True):
        from ..metrics.metrics_reloaded import MetricsReloadedCategorical

        super().__init__(metric_fn=MetricsReloadedCategorical(metric_name,
                                                              include_background,
                                                              reduction, get_not_nans),
                         output_transform=output_transform, save_details=save_details)
