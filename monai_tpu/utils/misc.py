"""General helpers: tuple utilities, determinism, env flags.

Behavioral parity targets: monai/utils/misc.py (ensure_tuple:81, ensure_tuple_rep:118,
fall_back_tuple:157, set_determinism:335, MONAIEnvVars:529).
"""
from __future__ import annotations

import collections.abc
import itertools
import os
import random
from typing import Any, Callable, Sequence

import numpy as np

_seed: int | None = None


def issequenceiterable(obj: Any) -> bool:
    """True for iterables that are not strings / 0-d arrays."""
    if isinstance(obj, np.ndarray):
        return obj.ndim > 0
    try:
        import jax

        if isinstance(obj, jax.Array):
            return obj.ndim > 0
    except Exception:  # pragma: no cover
        pass
    return isinstance(obj, collections.abc.Iterable) and not isinstance(obj, (str, bytes))


def ensure_tuple(vals: Any, wrap_array: bool = False) -> tuple:
    """Wrap ``vals`` into a tuple (reference: monai/utils/misc.py:81)."""
    if wrap_array and isinstance(vals, np.ndarray):
        return (vals,)
    return tuple(vals) if issequenceiterable(vals) else (vals,)


def ensure_tuple_size(vals: Any, dim: int, pad_val: Any = 0, pad_from_start: bool = False) -> tuple:
    new = ensure_tuple(vals)
    if pad_from_start:
        new = (pad_val,) * dim + new
    else:
        new = new + (pad_val,) * dim
    return new[-dim:] if pad_from_start else new[:dim]


def ensure_tuple_rep(tup: Any, dim: int) -> tuple:
    """Return a tuple of length ``dim`` by repetition (reference: monai/utils/misc.py:118)."""
    if isinstance(tup, (int, float)) or not issequenceiterable(tup):
        return (tup,) * dim
    t = tuple(tup)
    if len(t) == dim:
        return t
    raise ValueError(f"Sequence must have length {dim}, got {len(t)}.")


def fall_back_tuple(user_provided: Any, default: Sequence, func: Callable = lambda x: x and x > 0) -> tuple:
    """Refine ``user_provided`` elementwise, falling back to ``default`` where ``func`` is False
    (reference: monai/utils/misc.py:157).  E.g. roi size -1 → image size."""
    ndim = len(ensure_tuple(default))
    user = ensure_tuple_rep(user_provided, ndim)
    return tuple(u if func(u) else d for u, d in zip(user, ensure_tuple(default)))


def first(iterable, default=None):
    for i in iterable:
        return i
    return default


def star_zip_with(op, *vals):
    return itertools.starmap(op, zip(*vals))


def is_scalar(val: Any) -> bool:
    if isinstance(val, np.ndarray) and val.ndim == 0:
        return True
    return not issequenceiterable(val)


def is_scalar_tensor(val: Any) -> bool:
    return isinstance(val, np.ndarray) and val.ndim == 0


def progress_bar(index: int, count: int, desc: str | None = None, bar_len: int = 30, newline: bool = False) -> None:
    """Simple textual progress bar (reference: monai/utils/misc.py:383)."""
    end = "\r" if not newline else "\r\n"
    filled_len = int(bar_len * index // count)
    bar = f"{desc} " if desc is not None else ""
    bar += "[" + "=" * filled_len + " " * (bar_len - filled_len) + "]"
    print(f"{index}/{count} {bar}", end=end)
    if index == count:
        print("")


def set_determinism(seed: int | None = np.iinfo(np.uint32).max, additional_settings=None) -> None:
    """Set python/numpy seeds for deterministic host-side randomization
    (reference: monai/utils/misc.py:335).  JAX device randomness is inherently
    deterministic given PRNG keys, so nothing device-side to set."""
    global _seed
    if seed is None:
        _seed = None
        return
    seed = int(seed) % (np.iinfo(np.uint32).max + 1)
    _seed = seed
    random.seed(seed)
    np.random.seed(seed)
    if additional_settings is not None:
        for func in ensure_tuple(additional_settings):
            func(seed)


def get_seed() -> int | None:
    return _seed


class MONAIEnvVars:
    """Environment flags (reference: monai/utils/misc.py:529)."""

    @staticmethod
    def data_dir() -> str | None:
        return os.environ.get("MONAI_DATA_DIRECTORY")

    @staticmethod
    def debug() -> bool:
        return os.environ.get("MONAI_DEBUG", "false").lower() in ("true", "1")

    @staticmethod
    def doc_images() -> str | None:
        return os.environ.get("MONAI_DOC_IMAGES")

    @staticmethod
    def trace_transform() -> str | None:
        return os.environ.get("MONAI_TRACE_TRANSFORM")

    @staticmethod
    def eval_expr() -> bool:
        return os.environ.get("MONAI_EVAL_EXPR", "true").lower() in ("true", "1")


class ImageMetaKey:
    FILENAME_OR_OBJ = "filename_or_obj"
    PATCH_INDEX = "patch_index"
    SPATIAL_SHAPE = "spatial_shape"


def str2bool(value, default: bool = False, raise_exc: bool = True) -> bool:
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        if value.lower() in ("yes", "true", "t", "y", "1"):
            return True
        if value.lower() in ("no", "false", "f", "n", "0"):
            return False
    if raise_exc:
        raise ValueError(f"Cannot interpret {value!r} as bool")
    return default


def str2list(value, raise_exc: bool = True) -> list | None:
    if value is None or isinstance(value, list):
        return value
    if isinstance(value, str):
        out = []
        for s in value.split(","):
            s = s.strip()
            try:
                out.append(int(s))
            except ValueError:
                try:
                    out.append(float(s))
                except ValueError:
                    out.append(s)
        return out
    if raise_exc:
        raise ValueError(f"Cannot convert {value!r} to list")
    return None


class ConvertUnits:
    """Convert between length units (reference: monai/utils/misc.py:769)."""

    _factors = {"nm": 1e-9, "um": 1e-6, "mm": 1e-3, "cm": 1e-2, "m": 1.0, "km": 1e3}

    def __init__(self, input_unit: str, output_unit: str):
        iu, ou = input_unit.lower(), output_unit.lower()
        if iu not in self._factors or ou not in self._factors:
            raise ValueError(f"unsupported units: {input_unit} -> {output_unit}")
        self.conversion_factor = self._factors[iu] / self._factors[ou]

    def __call__(self, value):
        return value * self.conversion_factor


def label_union(x: Sequence) -> list:
    return sorted(set.union(set(np.asarray(a).flatten().tolist()) for a in x) if False else set(itertools.chain(*[np.unique(np.asarray(a)).tolist() for a in x])))


def path_to_uri(path) -> str:
    import pathlib

    return pathlib.Path(path).absolute().as_uri()


def pprint_edges(val: Any, n_lines: int = 20) -> str:
    from pprint import pformat

    val_str = pformat(val).splitlines(True)
    n_lines = max(n_lines, 1)
    if len(val_str) > n_lines * 2 + 1:
        hidden = len(val_str) - n_lines * 2
        val_str = val_str[:n_lines] + [f"\n ... omitted {hidden} line(s)\n\n"] + val_str[-n_lines:]
    return "".join(val_str)
