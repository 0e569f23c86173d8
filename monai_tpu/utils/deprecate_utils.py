"""Deprecation decorators (reference: monai/utils/deprecate_utils.py).

API-compatible `deprecated` / `deprecated_arg` / `deprecated_arg_default`; version
gating compares against this package's version string.
"""
from __future__ import annotations

import functools
import inspect
import warnings

__all__ = ["deprecated", "deprecated_arg", "deprecated_arg_default", "DeprecatedError"]


class DeprecatedError(Exception):
    pass


def _version_leq(lhs: str, rhs: str) -> bool:
    def parse(v):
        out = []
        for p in str(v).split("."):
            digits = "".join(ch for ch in p if ch.isdigit())
            out.append(int(digits) if digits else 0)
        return out
    return parse(lhs) <= parse(rhs)


def _current_version() -> str:
    try:
        from .. import __version__

        return __version__
    except Exception:
        return "0.0.0"


def deprecated(since: str | None = None, removed: str | None = None,
               msg_suffix: str = "", version_val: str | None = None,
               warning_category=FutureWarning):
    """Mark a function/class deprecated (reference: deprecate_utils.py:65)."""
    version = version_val or _current_version()
    is_removed = removed is not None and _version_leq(removed, version)
    is_deprecated = since is not None and _version_leq(since, version)
    if since is None and removed is None:
        is_deprecated, is_removed = True, False

    def decorator(obj):
        name = getattr(obj, "__qualname__", str(obj))
        if removed is not None:
            base = f"{name} was removed in version {removed}."
        elif since is not None:
            base = f"{name} has been deprecated since version {since}."
        else:
            base = f"{name} has been deprecated."
        message = f"{base} {msg_suffix}".strip()
        call_obj = obj if inspect.isfunction(obj) else obj.__init__

        @functools.wraps(call_obj)
        def wrapper(*args, **kwargs):
            if is_removed:
                raise DeprecatedError(message)
            if is_deprecated:
                warnings.warn(message, category=warning_category, stacklevel=2)
            return call_obj(*args, **kwargs)

        if inspect.isfunction(obj):
            return wrapper
        obj.__init__ = wrapper
        return obj

    return decorator


def deprecated_arg(name: str, since: str | None = None, removed: str | None = None,
                   msg_suffix: str = "", version_val: str | None = None,
                   new_name: str | None = None, warning_category=FutureWarning):
    """Mark a keyword argument deprecated (reference: deprecate_utils.py:168)."""
    version = version_val or _current_version()
    is_removed = removed is not None and _version_leq(removed, version)
    is_deprecated = since is not None and _version_leq(since, version)
    if since is None and removed is None:
        is_deprecated, is_removed = True, False

    def decorator(func):
        argname = f"{func.__qualname__}:{name}"
        if removed is not None:
            base = f"Argument `{name}` was removed in version {removed}."
        elif since is not None:
            base = f"Argument `{name}` has been deprecated since version {since}."
        else:
            base = f"Argument `{name}` has been deprecated."
        message = f"{base} {msg_suffix}".strip()

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            if name in kwargs:
                if new_name is not None and new_name not in kwargs:
                    kwargs[new_name] = kwargs.pop(name)
                else:
                    if is_removed:
                        raise DeprecatedError(message)
                    if is_deprecated:
                        warnings.warn(f"{argname}: {message}",
                                      category=warning_category, stacklevel=2)
                    if new_name is not None:
                        kwargs.pop(name, None)
            return func(*args, **kwargs)

        return wrapper

    return decorator


def deprecated_arg_default(name: str, old_default, new_default, since: str | None = None,
                           replaced: str | None = None, msg_suffix: str = "",
                           version_val: str | None = None, warning_category=FutureWarning):
    """Warn when a deprecated default value is used implicitly
    (reference: deprecate_utils.py:282)."""
    version = version_val or _current_version()
    is_deprecated = since is not None and _version_leq(since, version)

    def decorator(func):
        message = (f"Current default value of argument `{name}={old_default}` of "
                   f"{func.__qualname__} will be changed to `{name}={new_default}`"
                   + (f" in version {replaced}." if replaced else ".") + f" {msg_suffix}").strip()

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            if name not in kwargs and is_deprecated:
                warnings.warn(message, category=warning_category, stacklevel=2)
            return func(*args, **kwargs)

        return wrapper

    return decorator


def warn_deprecated(obj, msg, warning_category=FutureWarning):
    """Issue a deprecation warning for ``obj`` (reference:
    deprecate_utils.py warn_deprecated)."""
    import warnings

    warnings.warn(f"{obj}: {msg}", category=warning_category, stacklevel=2)
