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


def unsqueeze_right(arr, ndim: int):
    """Append singleton dims until arr.ndim == ndim (reference: utils/misc.py)."""
    return arr[(...,) + (None,) * (ndim - arr.ndim)]


def unsqueeze_left(arr, ndim: int):
    """Prepend singleton dims until arr.ndim == ndim (reference: utils/misc.py)."""
    return arr[(None,) * (ndim - arr.ndim)]


def convert_to_list(data):
    """tuple/set -> list, passthrough otherwise (reference: utils/misc.py)."""
    return list(data) if isinstance(data, (tuple, set)) else data


def list_to_dict(items):
    """['a=1', 'b=2'] -> {'a': 1, 'b': 2} with literal-eval values
    (reference: utils/misc.py list_to_dict)."""
    import ast as _ast

    def _parse(val):
        try:
            return _ast.literal_eval(val)
        except (ValueError, SyntaxError):
            return val

    d = {}
    if items:
        for item in items:
            key, _, value = str(item).partition("=")
            d[key.strip()] = _parse(value.strip()) if value else None
    return d


def flatten_dict(metrics: dict) -> dict:
    """Flatten nested dicts one level deep (reference: utils/misc.py flatten_dict)."""
    result = {}
    for key, value in metrics.items():
        if isinstance(value, dict):
            for sub_key, sub_value in value.items():
                if sub_key in result:
                    raise KeyError(f"duplicated key {sub_key}")
                result[sub_key] = sub_value
        else:
            result[key] = value
    return result


def to_tuple_of_dictionaries(dictionary_of_tuples: dict, keys) -> tuple:
    """{'a': (1, 2)} with keys (k1, k2) -> ({'a': 1}, {'a': 2})
    (reference: utils/misc.py to_tuple_of_dictionaries)."""
    keys = ensure_tuple(keys)
    out = []
    for i in range(len(keys)):
        entry = {}
        for k, v in dictionary_of_tuples.items():
            if isinstance(v, tuple):
                if len(v) != len(keys):
                    raise ValueError(f"tuple length for {k} must match number of keys")
                entry[k] = v[i]
            else:
                entry[k] = v
        out.append(entry)
    return tuple(out)


def zip_with(op, *vals, mapfunc=map):
    """Apply op elementwise over zipped sequences (reference: utils/misc.py zip_with)."""
    return mapfunc(op, zip(*vals))


def is_sqrt(num) -> bool:
    """Whether prod(sqrt-rounded dims)^2 == prod(num) (reference: utils/misc.py is_sqrt)."""
    import numpy as _np

    num = ensure_tuple(num)
    sqrt_num = [int(_np.round(_np.sqrt(n))) for n in num]
    ret = [s * s == n for s, n in zip(sqrt_num, num)]
    return all(ret)


def check_parent_dir(path, create_dir: bool = True) -> None:
    """(reference: utils/misc.py check_parent_dir)."""
    import os

    parent = os.path.dirname(os.path.abspath(str(path)))
    if not os.path.exists(parent):
        if create_dir:
            os.makedirs(parent, exist_ok=True)
        else:
            raise ValueError(f"the directory of the specified path does not exist: {parent}")


def save_obj(obj, path, create_dir: bool = True, atomic: bool = True, **kwargs) -> None:
    """Pickle an object to disk atomically (reference: utils/misc.py save_obj)."""
    import os
    import pickle
    import tempfile

    check_parent_dir(path, create_dir)
    if not atomic:
        with open(path, "wb") as f:
            pickle.dump(obj, f, **kwargs)
        return
    with tempfile.NamedTemporaryFile(dir=os.path.dirname(os.path.abspath(str(path))),
                                     delete=False) as tmp:
        pickle.dump(obj, tmp, **kwargs)
        tmp_name = tmp.name
    os.replace(tmp_name, str(path))


def run_cmd(cmd_list, **kwargs):
    """subprocess.run with check=True surfacing stderr (reference: utils/misc.py run_cmd)."""
    import subprocess

    kwargs.setdefault("check", True)
    try:
        return subprocess.run(cmd_list, **kwargs)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"command {cmd_list} failed: {e.stderr}") from e


def has_option(obj, keywords) -> bool:
    """Whether the callable accepts all the given keyword args
    (reference: utils/module.py has_option)."""
    import inspect

    if not callable(obj):
        return False
    sig = inspect.signature(obj)
    return all(k in sig.parameters for k in ensure_tuple(keywords))


def is_immutable(obj) -> bool:
    """(reference: utils/misc.py is_immutable)."""
    return isinstance(obj, (str, bytes, int, float, complex, frozenset, type(None), tuple))


def sample_slices(data, dim: int = 1, as_indices: bool = True, *slicevals):
    """Take slices of `data` along `dim` (reference: utils/misc.py sample_slices)."""
    slices = [slice(None)] * data.ndim
    if as_indices:
        import numpy as _np

        idx = _np.asarray(slicevals, dtype=int)
        slices[dim] = idx
        return data[tuple(slices)]
    slices[dim] = slice(*slicevals)
    return data[tuple(slices)]


def prob2class(x, sigmoid: bool = False, threshold: float = 0.5, **argmax_kwargs):
    """Probabilities -> class index/binary mask (reference: utils/misc.py prob2class)."""
    import numpy as _np

    from .backend import is_jax

    ns = __import__("jax.numpy", fromlist=["numpy"]) if is_jax(x) else _np
    return (x >= threshold).astype(x.dtype) if sigmoid else ns.argmax(x, **argmax_kwargs)


class RestartGenerator:
    """Wraps a generator factory so it can be re-iterated (reference: utils/misc.py)."""

    def __init__(self, create_gen):
        self.create_gen = create_gen

    def __iter__(self):
        return self.create_gen()


def zip_with(op, *vals, mapfunc=map):
    """Map ``op`` over zipped value sequences (reference: utils/misc.py:106)."""
    return mapfunc(op, zip(*vals))


def star_zip_with(op, *vals):
    """zip_with with star-mapping (reference: utils/misc.py:113)."""
    from itertools import starmap

    return zip_with(op, *vals, mapfunc=starmap)


def is_immutable(obj) -> bool:
    """True for known-immutable types (reference: utils/misc.py:153)."""
    return isinstance(obj, (str, bytes, int, float, complex, bool, type(None), tuple, frozenset, range))


def to_tuple_of_dictionaries(dictionary_of_tuples: dict, keys) -> tuple:
    """Split per-key tuple values into one dict per key (reference: utils/misc.py:225)."""
    keys = ensure_tuple(keys)
    out = []
    for i in range(len(keys)):
        d = {}
        for k, v in dictionary_of_tuples.items():
            if isinstance(v, tuple):
                if len(v) != len(keys):
                    raise ValueError(f"value for {k} must have the same length as keys.")
                d[k] = v[i]
            else:
                d[k] = v
        out.append(d)
    return tuple(out)


def list_to_dict(items):
    """["a=1", "b"] -> {"a": 1, "b": None} with literal-eval values
    (reference: utils/misc.py:396)."""
    from ast import literal_eval

    def _parse_var(s):
        parts = s.split("=", maxsplit=1)
        key = parts[0].strip(" \n\r\t'")
        value = parts[1].strip(" \n\r\t'") if len(parts) > 1 else None
        return key, value

    d: dict = {}
    for item in items or []:
        key, value = _parse_var(item)
        if key in d:
            raise KeyError(f"encounter duplicated key {key}.")
        try:
            d[key] = literal_eval(value)
        except Exception:
            lowered = str(value).lower()
            if lowered in ("y", "yes", "t", "true", "on", "1"):
                d[key] = True
            elif lowered in ("n", "no", "f", "false", "off", "0"):
                d[key] = False
            else:
                d[key] = value
    return d


def copy_to_device(obj, device=None, non_blocking: bool = True, verbose: bool = False):
    """Recursively move arrays to a jax device (reference: utils/misc.py:428,
    there torch devices)."""
    import jax

    if hasattr(obj, "ndim") and hasattr(obj, "dtype"):
        return jax.device_put(obj, device) if device is not None else obj
    if isinstance(obj, dict):
        return {k: copy_to_device(v, device, non_blocking) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(copy_to_device(v, device, non_blocking) for v in obj)
    if verbose:
        print(f"{type(obj)} has no device-copy behaviour; returned as is.")
    return obj


def has_option(obj, keywords) -> bool:
    """True if the callable accepts every keyword (reference: utils/misc.py:582)."""
    import inspect

    if not callable(obj):
        return False
    sig = inspect.signature(obj)
    return all(key in sig.parameters for key in ensure_tuple(keywords))


def is_module_ver_at_least(module, version) -> bool:
    """module.__version__ >= version tuple (reference: utils/misc.py:592)."""
    test_ver = ".".join(map(str, version))
    from .module import version_leq

    return module.__version__ != test_ver and version_leq(test_ver, module.__version__)


def sample_slices(data, dim: int = 1, as_indices: bool = True, *slicevals):
    """Select slices of ``data`` along ``dim`` (reference: utils/misc.py:605)."""
    slices: list = [slice(None)] * len(data.shape)
    slices[dim] = list(slicevals) if as_indices else slice(*slicevals)
    return data[tuple(slices)]


def check_parent_dir(path, create_dir: bool = True) -> None:
    """Ensure the parent directory exists (reference: utils/misc.py:623)."""
    from pathlib import Path

    path_dir = Path(path).parent
    if not path_dir.exists():
        if create_dir:
            path_dir.mkdir(parents=True)
        else:
            raise ValueError(f"the directory of specified path does not exist: `{path_dir}`.")


def save_obj(obj, path, create_dir: bool = True, atomic: bool = True, func=None, **kwargs) -> None:
    """Pickle an object to path, atomically by default (reference: utils/misc.py:642)."""
    import os
    import pickle
    import tempfile
    from pathlib import Path

    path = Path(path)
    if path.exists():
        os.remove(path)
    if create_dir:
        check_parent_dir(path, create_dir=True)
    writer = func or (lambda o, f: pickle.dump(o, f, **kwargs))
    if not atomic:
        with open(path, "wb") as f:
            writer(obj, f)
        return
    tmp = tempfile.NamedTemporaryFile(delete=False, dir=path.parent)
    try:
        with open(tmp.name, "wb") as f:
            writer(obj, f)
        os.rename(tmp.name, path)
    except Exception:
        if os.path.exists(tmp.name):
            os.remove(tmp.name)
        raise


def path_to_uri(path) -> str:
    """Absolute file URI for a path (reference: utils/misc.py:713)."""
    from pathlib import Path

    return Path(path).absolute().as_uri()


def check_kwargs_exist_in_class_init(cls, kwargs):
    """(all kwargs accepted?, set of unknown kwargs) (reference: utils/misc.py:851)."""
    import inspect

    params = inspect.signature(cls.__init__).parameters
    if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return True, set()
    extra = set(kwargs) - (set(params) - {"self"})
    return len(extra) == 0, extra


def run_cmd(cmd_list: list, **kwargs):
    """subprocess.run with stderr surfaced on failure (reference: utils/misc.py:871)."""
    import subprocess

    debug = kwargs.pop("run_cmd_verbose", False)
    if debug:
        print(f"running command: {' '.join(cmd_list)}")
    try:
        return subprocess.run(cmd_list, **kwargs)
    except subprocess.CalledProcessError as e:
        output = (e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else str(e.stdout)
        errors = (e.stderr or b"").decode(errors="replace") if isinstance(e.stderr, bytes) else str(e.stderr)
        raise RuntimeError(f"subprocess failed\nstdout: {output}\nstderr: {errors}") from e


def is_sqrt(num) -> bool:
    """True if each value's sqrt is an integer (reference: utils/misc.py:901)."""
    import math

    for n in ensure_tuple(num):
        r = math.isqrt(int(n))
        if r * r != int(n):
            return False
    return True


def unsqueeze_right(arr, ndim: int):
    """Append size-1 dims until arr.ndim == ndim (reference: utils/misc.py:911)."""
    return arr[(...,) + (None,) * (ndim - arr.ndim)]


def unsqueeze_left(arr, ndim: int):
    """Prepend size-1 dims until arr.ndim == ndim (reference: utils/misc.py:916)."""
    return arr[(None,) * (ndim - arr.ndim)]


def flatten_dict(metrics: dict) -> dict:
    """Flatten one level of nested dicts (reference: utils/misc.py:921)."""
    result: dict = {}
    for key, value in metrics.items():
        if isinstance(value, dict):
            for k, v in value.items():
                result[k] = v
        else:
            result[key] = value
    return result


import yaml as _yaml


class CheckKeyDuplicatesYamlLoader(_yaml.SafeLoader):
    """YAML SafeLoader that warns (or raises when MONAI_FAIL_ON_DUPLICATE_CONFIG=1)
    on duplicate mapping keys (reference: utils/misc.py:763)."""

    def construct_mapping(self, node, deep=False):
        import warnings

        seen = set()
        for key_node, _ in node.value:
            key = self.construct_object(key_node, deep=deep)
            if key in seen:
                if os.environ.get("MONAI_FAIL_ON_DUPLICATE_CONFIG", "0") == "1":
                    raise ValueError(f"Duplicate key: `{key}`")
                warnings.warn(f"Duplicate key: `{key}`")
            seen.add(key)
        return super().construct_mapping(node, deep)


def check_key_duplicates(ordered_pairs):
    """``object_pairs_hook`` for json.load: warn (or raise when
    MONAI_FAIL_ON_DUPLICATE_CONFIG=1) on duplicate keys (reference:
    utils/misc.py:738)."""
    import os as _os
    import warnings as _warnings

    keys = set()
    for k, _ in ordered_pairs:
        if k in keys:
            if _os.environ.get("MONAI_FAIL_ON_DUPLICATE_CONFIG", "0") == "1":
                raise ValueError(f"Duplicate key: `{k}`")
            _warnings.warn(f"Duplicate key: `{k}`")
        else:
            keys.add(k)
    return dict(ordered_pairs)
