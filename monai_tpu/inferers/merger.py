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


class ZarrAvgMerger(Merger):
    """AvgMerger backed by on-disk zarr arrays for outputs larger than RAM
    (reference: merger.py:207). Requires the optional `zarr` package."""

    def __init__(self, merged_shape, cropped_shape=None, dtype="float32",
                 value_dtype="float32", count_dtype="uint8", store="merged.zarr",
                 compressor=None, chunks=True, **kwargs):
        super().__init__(merged_shape=merged_shape, cropped_shape=cropped_shape)
        from ..utils.module import optional_import

        zarr, has_zarr = optional_import("zarr")
        if not has_zarr:
            raise ImportError("ZarrAvgMerger requires the optional 'zarr' package "
                              "(not installed); use AvgMerger instead.")
        self._zarr = zarr
        self.store = store
        self.values = zarr.open(store=store, mode="w", path="values",
                                shape=merged_shape, dtype=value_dtype, chunks=chunks)
        self.counts = zarr.open(store=store, mode="a", path="counts",
                                shape=merged_shape, dtype=count_dtype, chunks=chunks)
        self.output_dtype = dtype

    def aggregate(self, values, location):
        import numpy as np

        sl = tuple(slice(None) for _ in range(2)) + tuple(
            slice(loc, loc + s) for loc, s in zip(location, values.shape[2:]))
        self.values[sl] = self.values[sl] + np.asarray(values)
        self.counts[sl] = self.counts[sl] + 1

    def finalize(self):
        import numpy as np

        vals = np.asarray(self.values)
        counts = np.maximum(np.asarray(self.counts), 1)
        return (vals / counts).astype(self.output_dtype)


def iterate_over_chunks(chunks, cdata_shape, slice_tuple=()):
    """Yield slice tuples walking a chunk grid (reference: merger.py:500, used by
    ZarrAvgMerger)."""
    if len(chunks) != len(cdata_shape):
        raise ValueError("chunks and cdata_shape must have the same length")
    if len(chunks) == 1:
        for i in range(cdata_shape[0]):
            yield slice_tuple + (slice(i * chunks[0], (i + 1) * chunks[0]),)
    else:
        for i in range(cdata_shape[0]):
            yield from iterate_over_chunks(
                chunks[1:], cdata_shape[1:],
                slice_tuple + (slice(i * chunks[0], (i + 1) * chunks[0]),))
