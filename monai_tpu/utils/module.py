"""Soft-dependency import machinery, option lookup, and object instantiation.

Parity targets: monai/utils/module.py (look_up_option:115, damerau_levenshtein:171,
instantiate:205, optional_import:315, min_version:275, require_pkg:388).
"""
from __future__ import annotations

import enum
import functools
import importlib
import inspect
import warnings
from collections.abc import Callable, Collection, Hashable, Mapping
from importlib import import_module
from types import FunctionType, ModuleType
from typing import Any

from .enums import CompInitMode

OPTIONAL_IMPORT_MSG_FMT = "{}"


def look_up_option(opt_str: Hashable, supported: Collection | enum.EnumMeta, default: Any = "no_default",
                   print_all_options: bool = True):
    """Look up an option among supported values with did-you-mean suggestions
    (reference semantics: monai/utils/module.py:115).

    Implemented as: normalise ``supported`` into a single {candidate: result}
    table, then one membership check + one fuzzy pass on miss.
    """
    if not isinstance(opt_str, Hashable):
        raise ValueError(f"Unrecognized option type: {type(opt_str)}:{opt_str}.")
    query = opt_str.strip() if isinstance(opt_str, str) else opt_str

    table: dict = {}
    if isinstance(supported, enum.EnumMeta):
        for member in supported:
            table[member.value] = member
            table[member] = member
    elif isinstance(supported, Mapping):
        table = dict(supported)
    elif supported is not None:
        table = {item: item for item in supported}

    if query in table:
        return table[query]
    if default != "no_default":
        return default

    candidates = ({m.value for m in supported} if isinstance(supported, enum.EnumMeta)
                  else set(table))
    if not candidates:
        raise ValueError(f"No options available: {supported}.")
    listing = f"Available options are {candidates}.\n" if print_all_options else ""
    best, best_dist = None, 4  # suggest only within edit distance 3
    for cand in candidates:
        dist = damerau_levenshtein_distance(str(cand), str(query))
        if dist < best_dist:
            best, best_dist = cand, dist
    if best is not None:
        raise ValueError(
            f"By '{query}', did you mean '{best}'?\n"
            f"'{query}' is not a valid value.\n" + listing)
    raise ValueError(f"Unsupported option '{query}', " + listing)


def damerau_levenshtein_distance(s1: str, s2: str) -> int:
    """Edit distance counting insert/delete/substitute/transpose, via a rolling
    three-row dynamic program (reference semantics: monai/utils/module.py:171)."""
    if s1 == s2:
        return 0
    if not s1 or not s2:
        return max(len(s1), len(s2))
    n = len(s2)
    prev2: list[int] = []
    prev = list(range(n + 1))
    for i, a in enumerate(s1, start=1):
        row = [i] + [0] * n
        for j, b in enumerate(s2, start=1):
            best = min(prev[j] + 1,                      # delete from s1
                       row[j - 1] + 1,                   # insert into s1
                       prev[j - 1] + (a != b))           # substitute
            if i > 1 and j > 1 and a == s2[j - 2] and s1[i - 2] == b:
                best = min(best, prev2[j - 2] + (a != b))  # transpose
            row[j] = best
        prev2, prev = prev, row
    return prev[n]


def min_version(the_module: Any, min_version_str: str = "", *_args) -> bool:
    """True if module version >= min_version (reference: monai/utils/module.py:275)."""
    if not min_version_str or not hasattr(the_module, "__version__"):
        return True
    mod_version = tuple(int(x) for x in the_module.__version__.split(".")[:2])
    required = tuple(int(x) for x in min_version_str.split(".")[:2])
    return mod_version >= required


def exact_version(the_module: Any, version_str: str = "", *_args) -> bool:
    if not hasattr(the_module, "__version__"):
        warnings.warn(f"{the_module} has no attribute __version__ in exact_version check.")
        return False
    return bool(the_module.__version__ == version_str)


class OptionalImportError(ImportError):
    """Raised when an optional dependency is accessed but unavailable."""


def optional_import(module: str, version: str = "", version_checker: Callable = min_version, name: str = "",
                    descriptor: str = OPTIONAL_IMPORT_MSG_FMT, version_args: Any = None,
                    allow_namespace_pkg: bool = False) -> tuple[Any, bool]:
    """Import an optional module/attribute, deferring failure to first use
    (reference: monai/utils/module.py:315)."""
    tb = None
    exception_str = ""
    try:
        pkg = __import__(module)
        the_module = import_module(module)
        if not allow_namespace_pkg:
            is_namespace = getattr(the_module, "__file__", None) is None and hasattr(the_module, "__path__")
            if is_namespace:
                raise AssertionError
        if name:
            the_module = getattr(the_module, name)
    except Exception as import_exception:
        tb = import_exception.__traceback__
        exception_str = f"{import_exception}"
    else:
        if version_args and version_checker(pkg, f"{version}", version_args):
            return the_module, True
        if not version_args and version_checker(pkg, f"{version}"):
            return the_module, True

    msg = descriptor.format(f"import {module}" + (f".{name}" if name else ""))
    if version and tb is None:
        msg += f" (requires '{module} {version}' by '{version_checker.__name__}')"
    if exception_str:
        msg += f" ({exception_str})"

    class _LazyRaise:
        def __init__(self, *_a, **_k):
            self._exception = OptionalImportError(f"{msg}." + "\n\nFor details about installing the optional dependencies, see the docs.")
            if tb is not None:
                self._exception = self._exception.with_traceback(tb)

        def __getattr__(self, _name):
            raise self._exception

        def __call__(self, *_a, **_k):
            raise self._exception

        def __getitem__(self, item):
            raise self._exception

        def __iter__(self):
            raise self._exception

    return _LazyRaise(), False


def require_pkg(pkg_name: str, version: str = "", version_checker: Callable = min_version,
                raise_error: bool = True):
    """Class/function decorator enforcing a package requirement (reference: monai/utils/module.py:388)."""

    def _decorator(obj):
        is_func = isinstance(obj, FunctionType)
        call_obj = obj if is_func else obj.__init__
        _, has = optional_import(module=pkg_name, version=version, version_checker=version_checker)

        @functools.wraps(call_obj)
        def _wrapper(*args, **kwargs):
            if not has:
                err_msg = f"required package `{pkg_name}` is not installed or the version doesn't match requirement."
                if raise_error:
                    raise OptionalImportError(err_msg)
                warnings.warn(err_msg)
            return call_obj(*args, **kwargs)

        if is_func:
            return _wrapper
        obj.__init__ = _wrapper
        return obj

    return _decorator


def locate(path: str) -> Any:
    """Dynamically locate an object by dotted path (used by the bundle ``_target_`` system)."""
    parts = path.split(".")
    for split_idx in range(len(parts) - 1, 0, -1):
        mod_path = ".".join(parts[:split_idx])
        try:
            mod = importlib.import_module(mod_path)
        except Exception:
            continue
        obj: Any = mod
        try:
            for attr in parts[split_idx:]:
                obj = getattr(obj, attr)
            return obj
        except AttributeError:
            continue
    raise ModuleNotFoundError(f"Cannot locate '{path}'.")


def _maybe_inject_rngs(component: Any, kwargs: dict) -> dict:
    """Bundle-config ergonomics: reference configs instantiate torch networks with no
    RNG argument, but nnx modules require `rngs`. When the target is an nnx.Module
    class with a required `rngs` parameter not supplied by the config, inject
    `nnx.Rngs(seed)` (seed from kwargs `_seed_` or 0)."""
    seed = kwargs.pop("_seed_", 0)
    if "rngs" in kwargs:
        return kwargs
    try:
        from flax import nnx

        if inspect.isclass(component):
            if not issubclass(component, nnx.Module):
                return kwargs
            sig = inspect.signature(component.__init__)
        elif callable(component):
            # network factory functions (DenseNet121, resnet50, MedNeXtL, ...) also
            # take a required keyword-only `rngs`
            sig = inspect.signature(component)
        else:
            return kwargs
        p = sig.parameters.get("rngs")
        if p is not None and (inspect.isclass(component) or p.default is inspect.Parameter.empty):
            kwargs["rngs"] = nnx.Rngs(seed)
    except Exception:
        pass
    return kwargs


def instantiate(__path: str, __mode: str = CompInitMode.DEFAULT, **kwargs: Any) -> Any:
    """Instantiate a class / call a function given a dotted path
    (reference: monai/utils/module.py:205)."""
    component = locate(__path) if isinstance(__path, str) else __path
    if component is None:
        raise ModuleNotFoundError(f"Cannot locate class or function path: '{__path}'.")
    kwargs = _maybe_inject_rngs(component, dict(kwargs))
    m = look_up_option(__mode, CompInitMode)
    try:
        if kwargs.pop("_debug_", False) or m == CompInitMode.DEBUG:
            warnings.warn(f"instantiating {component} with {kwargs}")
            import pdb

            pdb.set_trace()
        if not callable(component):
            warnings.warn(f"Component {component} is not callable; returning as-is.")
            return component
        if m == CompInitMode.DEFAULT:
            return component(**kwargs)
        if m == CompInitMode.CALLABLE:
            return functools.partial(component, **kwargs) if kwargs else component
        if m == CompInitMode.PARTIAL:
            return functools.partial(component, **kwargs)
        if m == CompInitMode.DEBUG:
            return component(**kwargs)
    except Exception as e:
        raise RuntimeError(f"Failed to instantiate component '{__path}' with kwargs: {kwargs}") from e
    return component


def get_full_type_name(typeobj) -> str:
    module = getattr(typeobj, "__module__", None)
    if module is None or module == str.__module__:
        return typeobj.__name__
    return f"{module}.{typeobj.__name__}"


def version_leq(lhs: str, rhs: str) -> bool:
    """True if version lhs <= rhs (lexicographic over numeric fields)."""

    def parse(v):
        out = []
        for p in str(v).split("+")[0].split("."):
            try:
                out.append(int(p))
            except ValueError:
                break
        return tuple(out)

    return parse(lhs) <= parse(rhs)


def version_geq(lhs: str, rhs: str) -> bool:
    return version_leq(rhs, lhs)


def get_package_version(dep_name: str, default: str = "NOT INSTALLED or UNKNOWN VERSION.") -> str:
    dep, has_dep = optional_import(dep_name)
    if has_dep and hasattr(dep, "__version__"):
        return str(dep.__version__)
    return default


def load_submodules(basemod: ModuleType, load_all: bool = True, exclude_pattern: str = "(.*(__main__).*)"):
    """Recursively import submodules (reference: monai/utils/module.py:87)."""
    import pkgutil
    import re

    submodules = []
    err_mod: list[str] = []
    for importer, name, is_pkg in pkgutil.walk_packages(basemod.__path__, prefix=basemod.__name__ + "."):
        if (is_pkg or load_all) and name not in err_mod and re.match(exclude_pattern, name) is None:
            try:
                mod = import_module(name)
                submodules.append(mod)
            except OptionalImportError:
                err_mod.append(name)
    return submodules, err_mod


class InvalidPyTorchVersionError(Exception):
    """Raised when a capability needs a newer dependency version
    (reference: utils/module.py InvalidPyTorchVersionError; torch is not the
    compute backend here but the error type is part of the public surface)."""

    def __init__(self, required_version, name):
        super().__init__(f"{name} requires PyTorch version {required_version} or later")


class IgniteInfo:
    """Version gate constant for the (optional) ignite compatibility surface
    (reference: utils/module.py IgniteInfo). The engines here are ignite-free;
    this records the event-API version they mirror."""

    OPT_IMPORT_VERSION = "0.4.11"


def get_torch_version_tuple():
    """(major, minor) of the installed torch (reference: module.py
    get_torch_version_tuple)."""
    import torch

    return tuple(int(x) for x in torch.__version__.split(".")[:2])


def parse_version_strs(lhs: str, rhs: str):
    """Split two version strings into comparable int/str part iterables
    (reference: module.py parse_version_strs)."""
    from re import match

    def _try_cast(val: str):
        val = val.strip()
        try:
            m = match("(\\d+)(.*)", val)
            if m is not None:
                return int(m.groups()[0])
            return val
        except ValueError:
            return val

    lhs = lhs.split("+", 1)[0]
    rhs = rhs.split("+", 1)[0]
    return map(_try_cast, lhs.split(".")), map(_try_cast, rhs.split("."))


def pytorch_after(major: int, minor: int, patch: int = 0, current_ver_string: str | None = None) -> bool:
    """Whether the installed (or PYTORCH_VER-overridden) torch is >= the given
    version (reference: module.py pytorch_after)."""
    import os as _os

    if current_ver_string is None:
        _env_var = _os.environ.get("PYTORCH_VER", "")
        if _env_var:
            current_ver_string = _env_var
        else:
            import torch

            current_ver_string = torch.__version__
    try:
        from packaging.version import parse as _parse

        return _parse(f"{major}.{minor}.{patch}") <= _parse(f"{current_ver_string}")
    except ImportError:
        pass
    parts = f"{current_ver_string}".split("+", 1)[0].split(".", 3)
    while len(parts) < 3:
        parts += ["0"]
    c_major, c_minor, c_patch = parts[:3]
    c_mn = int(c_major), int(c_minor)
    mn = int(major), int(minor)
    if c_mn != mn:
        return c_mn > mn
    is_prerelease = ("a" in f"{c_patch}".lower()) or ("rc" in f"{c_patch}".lower())
    c_p = 0
    try:
        from re import match as _match

        p_reg = _match("(\\d+)(.*)", f"{c_patch}")
        if p_reg:
            c_p = int(p_reg.groups()[0])
    except (AttributeError, ValueError):
        is_prerelease = True
    if c_p != patch:
        return c_p > patch
    return not is_prerelease


def compute_capabilities_after(major: int, minor: int = 0, current_ver_string: str | None = None) -> bool:
    """CUDA compute-capability gate (reference: module.py
    compute_capabilities_after). Without CUDA/pynvml the reference assumes a
    recent GPU and returns True; same default here (TPU hosts have no CUDA)."""
    if current_ver_string is None:
        return True
    try:
        from packaging.version import parse as _parse

        return _parse(f"{major}.{minor}") <= _parse(f"{current_ver_string}")
    except ImportError:
        parts = f"{current_ver_string}".split("+", 1)[0].split(".", 2)
        while len(parts) < 2:
            parts += ["0"]
        return (int(parts[0]), int(parts[1])) >= (major, minor)
