"""Patch splitters (reference: monai/inferers/splitter.py:31 Splitter ABC,
:94 SlidingWindowSplitter, :295 WSISlidingWindowSplitter)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Callable, Iterable, Sequence
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.misc import ensure_tuple, ensure_tuple_rep

__all__ = ["Splitter", "SlidingWindowSplitter"]


class Splitter(ABC):
    """Split input into patches + locations (reference: splitter.py:31)."""

    def __init__(self, patch_size: Sequence[int] | int, device=None):
        self.patch_size = patch_size
        self.device = device

    @abstractmethod
    def get_input_shape(self, inputs: Any) -> tuple:
        raise NotImplementedError

    @abstractmethod
    def get_padded_shape(self, inputs: Any) -> tuple:
        raise NotImplementedError

    @abstractmethod
    def __call__(self, inputs: Any) -> Iterable[tuple[Any, Sequence[int]]]:
        raise NotImplementedError


class SlidingWindowSplitter(Splitter):
    """Overlapping sliding-window splitter (reference: splitter.py:94)."""

    def __init__(self, patch_size: Sequence[int] | int, overlap: Sequence[float] | float = 0.0,
                 offset: Sequence[int] | int = 0, filter_fn: Callable | None = None,
                 pad_mode: str | None = "constant", pad_value: float = 0.0, device=None):
        super().__init__(patch_size=patch_size, device=device)
        self.overlap = overlap
        self.offset = offset
        self.filter_fn = self._validate_filter_fn(filter_fn)
        self.pad_mode = pad_mode
        self.pad_value = pad_value

    @staticmethod
    def _validate_filter_fn(filter_fn):
        if callable(filter_fn) or filter_fn is None:
            return filter_fn
        raise ValueError(f"`filter_fn` should be a callable with two input parameters (patch, location), "
                         f"{type(filter_fn)} is given.")

    def get_input_shape(self, inputs) -> tuple:
        return tuple(inputs.shape[2:])

    def get_padded_shape(self, inputs) -> tuple:
        spatial = self.get_input_shape(inputs)
        patch_size = ensure_tuple_rep(self.patch_size, len(spatial))
        offset = ensure_tuple_rep(self.offset, len(spatial))
        padded = tuple(int(np.ceil(max(s - o, p) / p) * p) + o for s, o, p in zip(spatial, offset, patch_size))
        return padded

    def __call__(self, inputs: Any):
        arr = to_numpy(inputs)
        spatial = arr.shape[2:]
        d = len(spatial)
        patch_size = ensure_tuple_rep(self.patch_size, d)
        overlap = ensure_tuple_rep(self.overlap, d)
        offset = ensure_tuple_rep(self.offset, d)
        steps = tuple(max(int(p * (1 - o)), 1) for p, o in zip(patch_size, overlap))
        # pad if needed to fit whole patches
        if self.pad_mode:
            pad_to = [int(np.ceil(max(s - off, p) / st) * st + (p - st)) + off
                      for s, off, p, st in zip(spatial, offset, patch_size, steps)]
            pads = [(0, 0), (0, 0)] + [(0, max(0, pt - s)) for pt, s in zip(pad_to, spatial)]
            if any(p[1] for p in pads):
                arr = np.pad(arr, pads, mode=self.pad_mode,
                             **({"constant_values": self.pad_value} if self.pad_mode == "constant" else {}))
                spatial = arr.shape[2:]
        starts = []
        for s, off, p, st in zip(spatial, offset, patch_size, steps):
            dim_starts = list(range(off, s - p + 1, st)) or [off]
            starts.append(dim_starts)
        import itertools

        for loc in itertools.product(*starts):
            sl = (slice(None), slice(None)) + tuple(slice(l, l + p) for l, p in zip(loc, patch_size))
            patch = arr[sl]
            if self.filter_fn is None or self.filter_fn(patch, loc):
                yield patch, loc


class WSISlidingWindowSplitter(SlidingWindowSplitter):
    """SlidingWindowSplitter that reads patches lazily from a whole-slide image via a
    WSIReader instead of slicing an in-memory array (reference: splitter.py:295)."""

    def __init__(self, patch_size, offset=0, overlap: float = 0.0, filter_fn=None,
                 pad_mode: str | None = None, reader="pil", reader_kwargs: dict | None = None,
                 level: int = 0):
        super().__init__(patch_size=patch_size, offset=offset, overlap=overlap,
                         filter_fn=filter_fn, pad_mode=pad_mode)
        from ..data.wsi_reader import BaseWSIReader, WSIReader

        if isinstance(reader, str):
            self.reader = WSIReader(backend=reader, level=level,
                                    **(reader_kwargs or {}))
        elif isinstance(reader, BaseWSIReader):
            self.reader = reader
        else:
            raise ValueError(f"unsupported reader {reader}")
        self.level = level

    def __call__(self, inputs):
        """inputs: a WSI file path. Yields (patch, location) pairs."""
        import numpy as np

        wsi = self.reader.read(inputs)
        size = self.reader.get_size(wsi, self.level)
        from ..data.utils import iter_patch_position

        for loc in iter_patch_position(image_size=size, patch_size=self.patch_size,
                                       start_pos=(0, 0), overlap=self.overlap, padded=False):
            patch, _ = self.reader.get_data(wsi, location=tuple(int(v) for v in loc),
                                            size=self.patch_size, level=self.level)
            patch = patch[None].astype(np.float32)
            if self.filter_fn is None or self.filter_fn(patch, loc):
                yield patch, tuple(int(v) for v in loc)
