"""Dual numpy / jax.numpy dispatch.

The reference keeps transforms working on both numpy arrays and torch tensors via
``monai/transforms/utils_pytorch_numpy_unification.py``.  Here the two worlds are host
numpy (data-pipeline workers; cheap, no device round-trips) and ``jax.numpy`` (device
arrays, jit-compatible).  ``xp(a)`` returns the matching namespace; transform kernels are
written against the shared subset so a single implementation serves both.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NdarrayOrJax = Any  # np.ndarray | jax.Array


def is_jax(x: Any) -> bool:
    """True if ``x`` is a JAX array (incl. tracers inside jit)."""
    return isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer)


def xp(x: Any):
    """Return the array namespace (``numpy`` or ``jax.numpy``) matching ``x``."""
    return jnp if is_jax(x) else np


def to_numpy(x: Any, dtype=None) -> np.ndarray:
    if is_jax(x):
        x = np.asarray(jax.device_get(x))
    out = np.asarray(x)
    if dtype is not None and out.dtype != np.dtype(dtype):
        out = out.astype(dtype)
    return out


def to_jax(x: Any, dtype=None) -> jax.Array:
    if isinstance(x, (list, tuple)):
        x = np.asarray(x)
    out = jnp.asarray(x, dtype=dtype)
    return out


def convert_to_dst_type(src: Any, dst: Any, dtype=None):
    """Convert ``src`` to the array kind of ``dst`` (reference: monai/utils/type_conversion.py:341)."""
    if is_jax(dst):
        return to_jax(src, dtype=dtype)
    return to_numpy(src, dtype=dtype)


def unravel_index(idx, shape):
    ns = xp(idx) if not isinstance(idx, int) else np
    return ns.stack(ns.unravel_index(idx, shape))


def moveaxis(x, src, dst):
    return xp(x).moveaxis(x, src, dst)


def in_place_safe(x):
    """Numpy arrays support in-place updates, jax arrays do not; normalize via .at[] shim."""
    return x


def at_set(x, index, value):
    """Functional indexed assignment working for both numpy and jax arrays."""
    if is_jax(x):
        return x.at[index].set(value)
    x = np.array(x, copy=True)
    x[index] = value
    return x


def at_add(x, index, value):
    if is_jax(x):
        return x.at[index].add(value)
    x = np.array(x, copy=True)
    np.add.at(x, index, value)
    return x


def percentile(x, q, axis=None, keepdims: bool = False):
    """Percentile across backends (reference: utils_pytorch_numpy_unification.py:107)."""
    ns = xp(x)
    return ns.percentile(x, q, axis=axis, keepdims=keepdims)


def clip(x, a_min, a_max):
    return xp(x).clip(x, a_min, a_max)


def where(cond, x=None, y=None):
    ns = xp(cond)
    if x is None:
        return ns.where(cond)
    return ns.where(cond, x, y)


def stack(seq: Sequence, axis: int = 0):
    first = seq[0]
    return xp(first).stack(seq, axis=axis)


def concatenate(seq: Sequence, axis: int = 0):
    first = seq[0]
    return xp(first).concatenate(seq, axis=axis)


def any_np(x) -> bool:
    """Concrete truthiness of .any() — forces host transfer for jax arrays."""
    if is_jax(x):
        return bool(jax.device_get(jnp.any(x)))
    return bool(np.any(x))
