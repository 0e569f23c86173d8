"""Complex-number helpers with stacked (real, imag) last-dim layout
(reference: monai/apps/reconstruction/complex_utils.py)."""
from __future__ import annotations

from typing import Any

import numpy as np

from ...utils.backend import xp

__all__ = ["convert_to_tensor_complex", "complex_abs", "complex_mul", "complex_conj",
           "complex_abs_t", "complex_mul_t", "complex_conj_t"]


def convert_to_tensor_complex(data: Any, dtype=None) -> Any:
    """Complex array → stacked (real, imag) layout (reference: complex_utils.py)."""
    arr = np.asarray(data)
    if np.iscomplexobj(arr):
        return np.stack([arr.real, arr.imag], axis=-1).astype(dtype or np.float32)
    if arr.shape[-1] != 2:
        raise ValueError(f"last dim must be 2 for real-stacked complex data, got {arr.shape}")
    return arr.astype(dtype or np.float32)


def complex_abs(x: Any) -> Any:
    """|z| over the stacked layout (reference: complex_utils.py complex_abs)."""
    ns = xp(x)
    if x.shape[-1] != 2:
        raise ValueError(f"x.shape[-1] is not 2 ({x.shape[-1]}).")
    return ns.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-12)


complex_abs_t = complex_abs


def complex_mul(x: Any, y: Any) -> Any:
    """Complex multiply in stacked layout (reference: complex_utils.py complex_mul)."""
    ns = xp(x)
    if x.shape[-1] != 2 or y.shape[-1] != 2:
        raise ValueError("last dims must be 2.")
    re = x[..., 0] * y[..., 0] - x[..., 1] * y[..., 1]
    im = x[..., 0] * y[..., 1] + x[..., 1] * y[..., 0]
    return ns.stack([re, im], axis=-1)


complex_mul_t = complex_mul


def complex_conj(x: Any) -> Any:
    """Complex conjugate in stacked layout (reference: complex_utils.py complex_conj)."""
    ns = xp(x)
    if x.shape[-1] != 2:
        raise ValueError(f"x.shape[-1] is not 2 ({x.shape[-1]}).")
    return ns.stack([x[..., 0], -x[..., 1]], axis=-1)


complex_conj_t = complex_conj
