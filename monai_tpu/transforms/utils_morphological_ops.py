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


# reference: monai/transforms/utils_morphological_ops.py erode_t/dilate_t (the
# torch-tensor entry points) and get_morphological_filter_result_t (the shared
# conv+pad core). Here arrays are numpy/jax; the core is the `_morph` helper.
def get_morphological_filter_result_t(batch_img, filter_size, pad_value: float):
    """Pad + box-filter a (B, C, spatial...) batch — the shared morphological core
    (reference: utils_morphological_ops.py:~100). Returns the filter mean in
    [0, 1] per voxel (not yet thresholded)."""
    import numpy as np

    from ..utils.backend import to_numpy

    arr = to_numpy(batch_img).astype(np.float32)
    sdim = arr.ndim - 2
    from scipy import ndimage as ndi

    sizes = filter_size if isinstance(filter_size, (tuple, list)) else (filter_size,) * sdim
    out = np.empty_like(arr)
    for b in range(arr.shape[0]):
        for c in range(arr.shape[1]):
            out[b, c] = ndi.uniform_filter(arr[b, c], size=sizes, mode="constant", cval=pad_value)
    return out


def erode_t(batch_img, filter_size=3, pad_value: float = 1.0):
    """Erosion on a batched (B, C, ...) array (reference:
    utils_morphological_ops.py erode_t)."""
    res = get_morphological_filter_result_t(batch_img, filter_size, pad_value)
    import numpy as np

    return np.where(np.abs(res - 1.0) < 1e-7, 1.0, 0.0).astype(np.float32)


def dilate_t(batch_img, filter_size=3, pad_value: float = 0.0):
    """Dilation on a batched (B, C, ...) array (reference:
    utils_morphological_ops.py dilate_t)."""
    res = get_morphological_filter_result_t(batch_img, filter_size, pad_value)
    import numpy as np

    return np.where(res > 1e-7, 1.0, 0.0).astype(np.float32)
