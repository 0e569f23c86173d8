"""Metric protocol: Metric → IterationMetric → Cumulative → CumulativeIterationMetric.

Parity targets: monai/metrics/metric.py (Metric:26, IterationMetric:—, Cumulative:125,
CumulativeIterationMetric:296; cross-rank sync via evenly_divisible_all_gather :257-270).

On TPU pods the sync uses host-level process all-gather (jax multihost utils) — metric
buffers are host numpy; per-step compute can run jitted.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.dist import evenly_divisible_all_gather

__all__ = ["Metric", "IterationMetric", "Cumulative", "CumulativeIterationMetric"]


class Metric(ABC):
    """Base metric protocol (reference: metric.py:26)."""

    @abstractmethod
    def __call__(self, *args: Any, **kwargs: Any):
        raise NotImplementedError(f"Subclass {self.__class__.__name__} must implement this method.")


class IterationMetric(Metric):
    """Per-iteration metric over batches (reference: metric.py:56)."""

    def __call__(self, y_pred, y=None, **kwargs):
        if isinstance(y_pred, (list, tuple)) or isinstance(y, (list, tuple)):
            return self._compute_list(y_pred, y, **kwargs)
        return self._compute_tensor(y_pred, y, **kwargs)

    def _compute_list(self, y_pred, y=None, **kwargs):
        if y is not None:
            ret = [self._compute_tensor(p[None] if p.ndim < 4 or True else p, y_[None], **kwargs)
                   for p, y_ in zip(y_pred, y)]
        else:
            ret = [self._compute_tensor(p[None], None, **kwargs) for p in y_pred]
        if isinstance(ret[0], np.ndarray) or hasattr(ret[0], "shape"):
            return np.concatenate([to_numpy(r) for r in ret], axis=0)
        return ret

    @abstractmethod
    def _compute_tensor(self, y_pred, y=None, **kwargs):
        raise NotImplementedError


class Cumulative:
    """Accumulate per-iteration results in host buffers; sync across processes at
    aggregate time (reference: metric.py:125)."""

    def __init__(self):
        self._buffers: list[list] | None = None
        self._synced_tensors: list | None = None
        self._synced = False
        self.reset()

    def reset(self):
        self._buffers = None
        self._synced_tensors = None
        self._synced = False

    def extend(self, *data) -> None:
        """Append a batch of results to each buffer (reference: metric.py:171)."""
        if self._buffers is None:
            self._buffers = [[] for _ in data]
        for b, d in zip(self._buffers, data):
            b.append(np.atleast_1d(to_numpy(d)))
        self._synced = False

    def append(self, *data) -> None:
        """Append a single result (adds leading dim) (reference: metric.py:201)."""
        if self._buffers is None:
            self._buffers = [[] for _ in data]
        for b, d in zip(self._buffers, data):
            b.append(np.asarray(to_numpy(d))[None])
        self._synced = False

    def _sync(self) -> None:
        """Concat local buffers + all-gather across processes (reference: metric.py:257)."""
        if self._synced or self._buffers is None:
            return
        self._synced_tensors = [
            evenly_divisible_all_gather(np.concatenate(b, axis=0), concat=True) if b else None
            for b in self._buffers
        ]
        self._synced = True

    def get_buffer(self):
        self._sync()
        if self._synced_tensors is None:
            return None
        return self._synced_tensors[0] if len(self._synced_tensors) == 1 else self._synced_tensors

    def __len__(self) -> int:
        if self._buffers is None or not self._buffers[0]:
            return 0
        return sum(len(x) for x in self._buffers[0])


class CumulativeIterationMetric(Cumulative, IterationMetric):
    """IterationMetric that accumulates per-call results (reference: metric.py:296)."""

    def __init__(self):
        Cumulative.__init__(self)

    def __call__(self, y_pred, y=None, **kwargs):
        ret = IterationMetric.__call__(self, y_pred, y, **kwargs)
        if hasattr(ret, "shape"):
            self.extend(ret)
        elif isinstance(ret, (list, tuple)):
            self.extend(*ret)
        return ret

    def aggregate(self, *args, **kwargs):
        raise NotImplementedError(f"Subclass {self.__class__.__name__} must implement this method.")
