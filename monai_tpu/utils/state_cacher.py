"""StateCacher: stash pytree states in memory or on disk (reference:
monai/utils/state_cacher.py)."""
from __future__ import annotations

import copy
import os
import pickle
import tempfile
from typing import Any, Hashable

import numpy as np

__all__ = ["StateCacher"]


class StateCacher:
    """Cache (model/optimizer) state snapshots, optionally to disk
    (reference: state_cacher.py)."""

    def __init__(self, in_memory: bool = True, cache_dir: str | None = None,
                 allow_overwrite: bool = True, pickle_protocol=pickle.HIGHEST_PROTOCOL):
        self.in_memory = in_memory
        self.cache_dir = tempfile.gettempdir() if cache_dir is None else cache_dir
        if not os.path.isdir(self.cache_dir):
            raise ValueError("Given `cache_dir` is not a valid directory.")
        self.allow_overwrite = allow_overwrite
        self.pickle_protocol = pickle_protocol
        self.cached: dict = {}

    def store(self, key: Hashable, data_obj: Any, pickle_module=pickle) -> None:
        if key in self.cached and not self.allow_overwrite:
            raise RuntimeError("Cached key already exists and overwriting is disabled.")
        import jax

        as_np = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)) if hasattr(x, "shape") else copy.deepcopy(x), data_obj)
        if self.in_memory:
            self.cached[key] = {"obj": as_np}
        else:
            fn = os.path.join(self.cache_dir, f"state_{key}_{id(self)}.pkl")
            with open(fn, "wb") as f:
                pickle_module.dump(as_np, f, protocol=self.pickle_protocol)
            self.cached[key] = {"obj": fn}

    def retrieve(self, key: Hashable, pickle_module=pickle) -> Any:
        if key not in self.cached:
            raise KeyError(f"Target {key} was not cached.")
        if self.in_memory:
            return self.cached[key]["obj"]
        fn = self.cached[key]["obj"]
        if not os.path.exists(fn):
            raise RuntimeError(f"Failed to load state in {fn}. File doesn't exist anymore.")
        with open(fn, "rb") as f:
            return pickle_module.load(f)

    def __del__(self):
        if self.in_memory:
            return
        for v in self.cached.values():
            if isinstance(v.get("obj"), str) and os.path.exists(v["obj"]):
                try:
                    os.remove(v["obj"])
                except OSError:
                    pass
