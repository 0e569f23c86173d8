"""Statistical operation registries (reference: monai/auto3dseg/operations.py:23
Operations, :44 SampleOperations, :106 SummaryOperations)."""
from __future__ import annotations

from collections import UserDict
from functools import partial
from typing import Any

import numpy as np

__all__ = ["Operations", "SampleOperations", "SummaryOperations"]


class Operations(UserDict):
    """Dict of named callables applied to data (reference: operations.py:23)."""

    def evaluate(self, data: Any, **kwargs: Any) -> dict:
        return {k: v(data, **kwargs) for k, v in self.data.items() if callable(v)}


def _percentile(data, q):
    return np.percentile(np.asarray(data), q)


class SampleOperations(Operations):
    """Per-sample stats incl. spread percentiles (reference: operations.py:44)."""

    def __init__(self):
        self.data = {
            "max": np.max,
            "mean": np.mean,
            "median": np.median,
            "min": np.min,
            "stdev": np.std,
            "percentile": partial(_percentile, q=[0.5, 10, 90, 99.5]),
        }
        self.data_addon = {
            "percentile_00_5": ("percentile", 0),
            "percentile_10_0": ("percentile", 1),
            "percentile_90_0": ("percentile", 2),
            "percentile_99_5": ("percentile", 3),
        }

    def evaluate(self, data: Any, **kwargs: Any) -> dict:
        ret = super().evaluate(np.asarray(data), **kwargs)
        for k, (cache, idx) in self.data_addon.items():
            if cache in ret:
                ret[k] = ret[cache][idx]
        for k, v in ret.items():
            ret[k] = np.asarray(v).tolist()
        return ret


class SummaryOperations(Operations):
    """Summarize dicts of per-sample stats (reference: operations.py:106)."""

    def __init__(self):
        self.data = {
            "max": np.max,
            "mean": np.mean,
            "median": np.mean,
            "min": np.min,
            "stdev": np.mean,
            "percentile_00_5": np.mean,
            "percentile_10_0": np.mean,
            "percentile_90_0": np.mean,
            "percentile_99_5": np.mean,
        }

    def evaluate(self, data: Any, **kwargs: Any) -> dict:
        return {k: np.asarray(v(data[k], **kwargs)).tolist()
                for k, v in self.data.items() if callable(v) and k in data}
