"""CSV output writer for classification/metric results (reference: monai/data/csv_saver.py:26)."""
from __future__ import annotations

import os
import warnings
from collections import OrderedDict
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.enums import MetaKeys

__all__ = ["CSVSaver"]


class CSVSaver:
    """Accumulate per-item rows in memory and flush them to a CSV file
    (reference: csv_saver.py:26). Rows are keyed by the item's filename metadata;
    anonymous items get an incrementing index."""

    def __init__(self, output_dir: str = "./", filename: str = "predictions.csv",
                 overwrite: bool = True, flush: bool = False, delimiter: str = ","):
        self.output_dir = output_dir
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()
        if not filename.lower().endswith(".csv"):
            warnings.warn("CSVSaver expected a filename ending in 'csv', got: " + filename)
        self._filepath = os.path.join(output_dir, filename)
        self.overwrite = overwrite
        self.flush = flush
        self.delimiter = delimiter
        self._data_index = 0

    def finalize(self) -> None:
        """Write all cached rows to the CSV file."""
        if not (self.overwrite and os.path.exists(self._filepath)):
            mode = "a" if os.path.exists(self._filepath) else "w"
        else:
            mode = "w"
        os.makedirs(self.output_dir, exist_ok=True)
        with open(self._filepath, mode) as f:
            for name, row in self._cache.items():
                f.write(name)
                for v in np.atleast_1d(np.asarray(row)).ravel():
                    f.write(self.delimiter + str(v))
                f.write("\n")
        self.reset_cache()

    def save(self, data: Any, meta_data: dict | None = None) -> None:
        """Cache one item's row (reference: csv_saver.py:85)."""
        name = str((meta_data or {}).get(MetaKeys.FILENAME_OR_OBJ, self._data_index))
        self._data_index += 1
        self._cache[name] = to_numpy(data).astype(np.float32)
        if self.flush:
            self.finalize()

    def save_batch(self, batch_data: Any, meta_data: dict | None = None) -> None:
        """Cache a batch: meta values may be per-batch lists (reference: csv_saver.py:101)."""
        arr = to_numpy(batch_data)
        for i, item in enumerate(arr):
            self.save(item, {k: v[i] for k, v in meta_data.items()} if meta_data else None)

    def get_cache(self) -> OrderedDict:
        return self._cache

    def reset_cache(self) -> None:
        self._cache = OrderedDict()
