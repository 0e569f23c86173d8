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

    def randomize(self, size: int) -> None:
        self._idx = self.R.randint(size)

    def randomized_pop(self, buffer):
        """Take a uniformly random slot out of the buffer; the vacated slot is
        backfilled with the tail element so the buffer stays dense."""
        self.randomize(len(buffer))
        slot = self._idx
        taken = buffer[slot]
        buffer[slot] = buffer[len(buffer) - 1]
        del buffer[-1]
        return taken

    def generate_item(self):
        """Reservoir pass: keep ``size`` items resident, emitting one random
        resident per incoming item once warm, then drain in random order."""
        resident: list = []
        stream = iter(self.data)
        for incoming in stream:
            if len(resident) < self.size:
                resident.append(incoming)
                continue
            yield self.randomized_pop(resident)
            resident.append(incoming)
        while resident:
            yield self.randomized_pop(resident)

    def __iter__(self):
        self.seed += 1
        super().set_random_state(seed=self.seed)
        epoch_iter = range(self.epochs) if self.epochs >= 0 else iter(int, 1)
        for _ in epoch_iter:
            for item in self.generate_item():
                yield item if self.transform is None else apply_transform(self.transform, item)


class CSVIterableDataset(IterableDataset):
    """Stream CSV file(s) in chunks (reference: iterable_dataset.py:138)."""

    def __init__(self, src, chunksize: int = 1000, buffer_size: int | None = None,
                 col_names: Sequence[str] | None = None, col_types: dict | None = None,
                 col_groups: dict | None = None, transform: Callable | None = None,
                 shuffle: bool = False, seed: int = 0, kwargs_read_csv: dict | None = None, **kwargs):
        super().__init__(data=None, transform=transform)  # type: ignore
        self.src = src
        self.chunksize = chunksize
        # default shuffle window: two chunks' worth of rows
        self.buffer_size = buffer_size if buffer_size is not None else chunksize * 2
        # column selection/coercion/grouping are forwarded to the table→dict converter
        self.col_names, self.col_types, self.col_groups = col_names, col_types, col_groups
        self.shuffle, self.seed = shuffle, seed
        self.kwargs_read_csv = dict(kwargs_read_csv) if kwargs_read_csv else {"chunksize": chunksize}
        self.kwargs = kwargs
        self.iters: list = []

    def reset(self, src=None):
        """(Re)open chunked pandas readers over the source file(s)/buffer(s)."""
        import pandas as pd

        sources = src if src is not None else self.src
        if not isinstance(sources, (tuple, list)):
            sources = (sources,)
        self.iters = [pd.read_csv(s, **self.kwargs_read_csv) for s in sources]
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
