"""Grey/binary morphology via convolution (reference:
monai/transforms/utils_morphological_ops.py:26 erode, :58 dilate).

A box-kernel convolution counts in-window hits; erosion keeps voxels whose whole
window is foreground, dilation keeps voxels with any foreground neighbor — both map
to a single XLA conv per call.
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ..utils.backend import is_jax, to_jax, to_numpy
from ..utils.misc import ensure_tuple_rep

__all__ = ["erode", "dilate"]


def _morph(mask, filter_size, pad_value: float, mode: str):
    import jax
    import jax.numpy as jnp

    arr = to_jax(mask).astype(jnp.float32)
    sd = arr.ndim - 2
    fs = ensure_tuple_rep(filter_size, sd)
    if any(f % 2 == 0 for f in fs):
        raise ValueError(f"filter_size must be odd, got {filter_size}.")
    kernel = jnp.ones(fs, jnp.float32)[None, None]
    pads = [(f // 2, f // 2) for f in fs]
    b, c = arr.shape[:2]
    flat = arr.reshape((b * c, 1) + arr.shape[2:])
    flat = jnp.pad(flat, [(0, 0), (0, 0)] + pads, constant_values=pad_value)
    dn_spec = ("NCHW", "OIHW", "NCHW") if sd == 2 else ("NCDHW", "OIDHW", "NCDHW")
    dn = jax.lax.conv_dimension_numbers(flat.shape, kernel.shape, dn_spec)
    out = jax.lax.conv_general_dilated(flat, kernel, (1,) * sd, "VALID",
                                       dimension_numbers=dn)
    out = out.reshape(arr.shape)
    n = float(np.prod(fs))
    if mode == "erode":
        res = (out == n).astype(jnp.float32)
    else:
        res = (out > 0).astype(jnp.float32)
    return res


def erode(mask, filter_size: int | Sequence[int] = 3, pad_value: float = 1.0):
    """Binary erosion of (B, C, *spatial) masks (reference: utils_morphological_ops.py:26)."""
    was_np = not is_jax(mask)
    out = _morph(mask, filter_size, pad_value, "erode")
    return to_numpy(out) if was_np else out


def dilate(mask, filter_size: int | Sequence[int] = 3, pad_value: float = 0.0):
    """Binary dilation of (B, C, *spatial) masks (reference: utils_morphological_ops.py:58)."""
    was_np = not is_jax(mask)
    out = _morph(mask, filter_size, pad_value, "dilate")
    return to_numpy(out) if was_np else out
