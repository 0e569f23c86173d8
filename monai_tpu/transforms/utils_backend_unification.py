"""Dual numpy/jax array helpers, mirroring the reference's
``monai/transforms/utils_pytorch_numpy_unification.py`` public surface (there
torch/numpy). Each function keeps the input's array kind; on jax arrays the ops
trace under jit.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.backend import (clip, concatenate, is_jax, moveaxis, percentile, stack as _stack,
                             to_jax, to_numpy, unravel_index, where, xp)

__all__ = [
    "allclose", "any_np_pt", "argsort", "argwhere", "ascontiguousarray", "clip",
    "concatenate", "cumsum", "floor_divide", "in1d", "isfinite", "isnan", "linalg_inv",
    "max", "maximum", "mean", "median", "min", "mode", "moveaxis", "nonzero",
    "percentile", "ravel", "repeat", "searchsorted", "softplus", "stack", "std", "sum",
    "unique", "unravel_index", "unravel_indices", "where",
]


def softplus(x):
    ns = xp(x)
    if ns is jnp:
        return jax.nn.softplus(x)
    return np.logaddexp(np.zeros_like(x), x)


def allclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False) -> bool:
    return bool(np.allclose(to_numpy(a), to_numpy(b), rtol=rtol, atol=atol,
                            equal_nan=equal_nan))


def in1d(x, y):
    ns = xp(x)
    return ns.isin(ns.asarray(x).ravel(), ns.asarray(list(y) if not hasattr(y, "shape") else y))


def argwhere(a):
    if is_jax(a):
        return jnp.argwhere(a)
    return np.argwhere(a)


def argsort(a, axis=-1):
    return xp(a).argsort(a, axis=axis)


def nonzero(x):
    """First-axis nonzero indices, matching the reference's numpy behaviour
    (reference: unification.py:189 `np.nonzero(x)[0]`)."""
    ns = xp(x)
    return ns.nonzero(ns.asarray(x))[0]


def floor_divide(a, b):
    return xp(a).floor_divide(a, b)


def unravel_indices(idx, shape):
    return _stack([unravel_index(i, shape) for i in idx], 0)


def ravel(x):
    return xp(x).ravel(x)


def any_np_pt(x, axis):
    """`any` along (possibly several) axes, keeping array kind
    (reference: unification.py:271)."""
    ns = xp(x)
    axes = (axis,) if isinstance(axis, int) else tuple(axis)
    return ns.any(ns.asarray(x), axis=axes)


def maximum(a, b):
    return xp(a).maximum(a, b)


def cumsum(a, axis=None, **kwargs):
    return xp(a).cumsum(a, axis=axis)


def isfinite(x):
    return xp(x).isfinite(x)


def searchsorted(a, v, right=False, sorter=None, **kwargs):
    side = "right" if right else "left"
    return xp(a).searchsorted(a, v, side=side, sorter=sorter)


def repeat(a, repeats, axis=None, **kwargs):
    return xp(a).repeat(a, repeats, axis=axis)


def isnan(x):
    return xp(x).isnan(x)


def ascontiguousarray(x, **kwargs):
    if is_jax(x):
        return x  # jax arrays are always materialised contiguously on access
    return np.ascontiguousarray(x, **kwargs)


def stack(x: Sequence, dim: int):
    return _stack(list(x), dim)


def mode(x, dim: int = -1, to_long: bool = True):
    """Most frequent value along dim (reference: unification.py:426)."""
    arr = to_numpy(x)
    if to_long:
        arr = arr.astype(np.int64)
    from scipy import stats

    out = stats.mode(arr, axis=dim, keepdims=False).mode
    out = np.asarray(out)
    return to_jax(out) if is_jax(x) else out


def unique(x, **kwargs):
    return xp(x).unique(x, **kwargs)


def linalg_inv(x):
    return xp(x).linalg.inv(x)


def _reduce(fn_name, x, dim=None, **kwargs):
    ns = xp(x)
    fn = getattr(ns, fn_name)
    if dim is None:
        return fn(x, **kwargs)
    return fn(x, axis=dim, **kwargs)


def max(x, dim=None, **kwargs):  # noqa: A001 - reference name
    return _reduce("max", x, dim, **kwargs)


def mean(x, dim=None, **kwargs):
    return _reduce("mean", x, dim, **kwargs)


def median(x, dim=None, **kwargs):
    return _reduce("median", x, dim, **kwargs)


def min(x, dim=None, **kwargs):  # noqa: A001 - reference name
    return _reduce("min", x, dim, **kwargs)


def sum(x, dim=None, **kwargs):  # noqa: A001 - reference name
    return _reduce("sum", x, dim, **kwargs)


def std(x, dim=None, unbiased: bool = False):
    ns = xp(x)
    return ns.std(x, axis=dim, ddof=1 if unbiased else 0)
