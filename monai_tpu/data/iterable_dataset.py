"""Iterable / streaming datasets (reference: monai/data/iterable_dataset.py:28,66,138)."""
from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import numpy as np

from ..transforms.transform import Randomizable, apply_transform

__all__ = ["IterableDataset", "ShuffleBuffer", "CSVIterableDataset"]


class IterableDataset:
    """Iterable dataset + transform (reference: iterable_dataset.py:28)."""

    def __init__(self, data: Iterable, transform: Callable | None = None):
        self.data = data
        self.transform = transform
        self.source: Any = None

    def __iter__(self):
        self.source = iter(self.data)
        for data in self.source:
            if self.transform is not None:
                data = apply_transform(self.transform, data)
            yield data


class ShuffleBuffer(Randomizable, IterableDataset):
    """Reservoir-style shuffle of a stream (reference: iterable_dataset.py:66)."""

    def __init__(self, data, transform=None, buffer_size: int = 512, seed: int = 0, epochs: int = 1):
        super().__init__(data=data, transform=transform)
        self.size = buffer_size
        self.seed = seed
        self.epochs = epochs
        self._idx = 0

    def randomized_pop(self, buffer):
        self.randomize(len(buffer))
        ret, buffer[self._idx] = buffer[self._idx], buffer[-1]
        buffer.pop()
        return ret

    def generate_item(self):
        buffer: list = []
        for item in iter(self.data):
            if len(buffer) >= self.size:
                yield self.randomized_pop(buffer)
            buffer.append(item)
        while buffer:
            yield self.randomized_pop(buffer)

    def __iter__(self):
        self.seed += 1
        super().set_random_state(seed=self.seed)
        for _ in range(self.epochs) if self.epochs >= 0 else iter(int, 1):
            for item in self.generate_item():
                if self.transform is not None:
                    item = apply_transform(self.transform, item)
                yield item

    def randomize(self, size: int) -> None:
        self._idx = self.R.randint(size)


class CSVIterableDataset(IterableDataset):
    """Stream CSV file(s) in chunks (reference: iterable_dataset.py:138)."""

    def __init__(self, src, chunksize: int = 1000, buffer_size: int | None = None,
                 col_names: Sequence[str] | None = None, col_types: dict | None = None,
                 col_groups: dict | None = None, transform: Callable | None = None,
                 shuffle: bool = False, seed: int = 0, kwargs_read_csv: dict | None = None, **kwargs):
        self.src = src
        self.chunksize = chunksize
        self.buffer_size = 2 * chunksize if buffer_size is None else buffer_size
        self.col_names = col_names
        self.col_types = col_types
        self.col_groups = col_groups
        self.shuffle = shuffle
        self.seed = seed
        self.kwargs_read_csv = kwargs_read_csv or {"chunksize": chunksize}
        self.kwargs = kwargs
        self.iters: list = []
        super().__init__(data=None, transform=transform)  # type: ignore

    def reset(self, src=None):
        import pandas as pd

        src = self.src if src is None else src
        srcs = (src,) if not isinstance(src, (tuple, list)) else src
        self.iters = [pd.read_csv(i, **self.kwargs_read_csv) for i in srcs]
        return self.iters

    def close(self):
        for i in self.iters:
            i.close()

    def _flattened(self):
        from .dataset import convert_tables_to_dicts

        for chunks in zip(*self.reset()):
            yield from convert_tables_to_dicts(dfs=chunks, col_names=self.col_names,
                                               col_types=self.col_types, col_groups=self.col_groups,
                                               **self.kwargs)

    def __iter__(self):
        if self.shuffle:
            self.seed += 1
            buffer = ShuffleBuffer(data=self._flattened(), transform=self.transform,
                                   buffer_size=self.buffer_size, seed=self.seed)
            yield from buffer
            return
        flat = self._flattened()
        for item in flat:
            if self.transform is not None:
                item = apply_transform(self.transform, item)
            yield item
