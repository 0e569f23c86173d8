"""Patch mergers (reference: monai/inferers/merger.py:41 Merger ABC, :103 AvgMerger,
:207 ZarrAvgMerger)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Sequence
from typing import Any

import numpy as np

from ..utils.backend import to_numpy

__all__ = ["Merger", "AvgMerger"]


class Merger(ABC):
    """Aggregate patch outputs into a final result (reference: merger.py:41)."""

    def __init__(self, merged_shape: Sequence[int], cropped_shape: Sequence[int] | None = None):
        self.merged_shape = merged_shape
        self.cropped_shape = merged_shape if cropped_shape is None else cropped_shape
        self.is_finalized = False

    @abstractmethod
    def aggregate(self, values: Any, location: Sequence[int]):
        raise NotImplementedError

    @abstractmethod
    def finalize(self):
        raise NotImplementedError


class AvgMerger(Merger):
    """Weighted-average merger (reference: merger.py:103).  Host numpy buffers — the
    device-side fused stitch lives in sliding_window_inference; this class serves the
    PatchInferer composition path."""

    def __init__(self, merged_shape: Sequence[int], cropped_shape: Sequence[int] | None = None,
                 value_dtype=np.float32, count_dtype=np.uint8):
        super().__init__(merged_shape=merged_shape, cropped_shape=cropped_shape)
        if not self.merged_shape:
            raise ValueError(f"`merged_shape` must be provided for `AvgMerger`. {self.merged_shape} is give.")
        self.value_dtype = value_dtype
        self.count_dtype = count_dtype
        self.values = np.zeros(self.merged_shape, dtype=self.value_dtype)
        self.counts = np.zeros(self.merged_shape, dtype=self.count_dtype)

    def aggregate(self, values: Any, location: Sequence[int]) -> None:
        if self.is_finalized:
            raise ValueError("`AvgMerger` is already finalized. Please instantiate a new object to aggregate.")
        values = to_numpy(values)
        patch_size = values.shape[2:]
        map_slice = tuple(slice(loc, loc + size) for loc, size in zip(location, patch_size))
        map_slice = (slice(None), slice(None)) + map_slice
        self.values[map_slice] += values
        self.counts[map_slice] += 1

    def finalize(self) -> np.ndarray:
        if not self.is_finalized:
            self.values = self.values / np.maximum(self.counts, 1)
            crop = tuple(slice(0, s) for s in self.cropped_shape)
            self.values = self.values[crop]
            self.is_finalized = True
        return self.values

    def get_output(self):
        return self.finalize()

    def get_values(self):
        return self.values

    def get_counts(self):
        return self.counts
