"""MetricsReloaded wrappers (reference: monai/metrics/wrapper.py
MetricsReloadedBinary / MetricsReloadedCategorical).

The optional `MetricsReloaded` package is not bundled in this environment; these
wrappers gate on it and raise a clear ImportError otherwise.
"""
from __future__ import annotations

import numpy as np

from ..utils.backend import to_numpy
from ..utils.module import optional_import
from .metric import CumulativeIterationMetric

__all__ = ["MetricsReloadedBinary", "MetricsReloadedCategorical"]


class _MetricsReloadedWrapper(CumulativeIterationMetric):
    def __init__(self, metric_name: str, include_background: bool = True,
                 reduction="mean", get_not_nans: bool = False):
        super().__init__()
        self.metric_name = metric_name
        self.include_background = include_background
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def aggregate(self, reduction=None):
        from .utils import do_metric_reduction

        data = self.get_buffer()
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        return (f, not_nans) if self.get_not_nans else f


class MetricsReloadedBinary(_MetricsReloadedWrapper):
    """Binary-pair metrics from the MetricsReloaded package (reference: wrapper.py)."""

    def __init__(self, metric_name: str, include_background: bool = True,
                 reduction="mean", get_not_nans: bool = False):
        super().__init__(metric_name, include_background, reduction, get_not_nans)
        self._bpm, has = optional_import(
            "MetricsReloaded.metrics.pairwise_measures", name="BinaryPairwiseMeasures")
        if not has:
            raise ImportError("MetricsReloadedBinary requires the 'MetricsReloaded' package "
                              "(https://github.com/Project-MONAI/MetricsReloaded), not installed.")

    def _compute_tensor(self, y_pred, y=None):
        pred = to_numpy(y_pred)
        ref = to_numpy(y)
        if not self.include_background:
            pred, ref = pred[:, 1:], ref[:, 1:]
        b, c = pred.shape[:2]
        out = np.zeros((b, c), dtype=np.float32)
        for i in range(b):
            for j in range(c):
                measures = self._bpm(pred[i, j], ref[i, j])
                out[i, j] = getattr(measures, self.metric_name)()
        return out


class MetricsReloadedCategorical(_MetricsReloadedWrapper):
    """Multi-class metrics from the MetricsReloaded package (reference: wrapper.py)."""

    def __init__(self, metric_name: str, include_background: bool = True,
                 reduction="mean", get_not_nans: bool = False, smooth_dr: float = 1e-5):
        super().__init__(metric_name, include_background, reduction, get_not_nans)
        self.smooth_dr = smooth_dr
        self._mpm, has = optional_import(
            "MetricsReloaded.metrics.pairwise_measures", name="MultiClassPairwiseMeasures")
        if not has:
            raise ImportError("MetricsReloadedCategorical requires the 'MetricsReloaded' "
                              "package, not installed.")

    def _compute_tensor(self, y_pred, y=None):
        pred = to_numpy(y_pred)
        ref = to_numpy(y)
        n_class = pred.shape[1]
        pred_idx = pred.argmax(axis=1)
        ref_idx = ref.argmax(axis=1)
        b = pred.shape[0]
        out = np.zeros((b, 1), dtype=np.float32)
        for i in range(b):
            measures = self._mpm(pred_idx[i].ravel(), ref_idx[i].ravel(),
                                 list(range(n_class)))
            out[i, 0] = getattr(measures, self.metric_name)()
        return out


# Reference-name export (reference: metrics/wrapper.py:31 MetricsReloadedWrapper —
# the shared base of the Binary/Categorical wrappers)
MetricsReloadedWrapper = _MetricsReloadedWrapper
