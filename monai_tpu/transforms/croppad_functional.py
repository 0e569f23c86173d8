"""Functional crop/pad API (reference: monai/transforms/croppad/functional.py).

``pad_nd`` / ``crop_or_pad_nd`` are pure array functions (numpy or jax, channel
first). ``pad_func`` / ``crop_func`` are the tracked variants: they delegate to the
Pad/Crop transform machinery so applied/pending operations are recorded exactly as
the class API records them.
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ..data.affine_utils import to_affine_nd
from ..utils.backend import is_jax, to_numpy

__all__ = ["pad_nd", "crop_or_pad_nd", "pad_func", "crop_func"]

_TORCH_TO_NP_MODE = {"constant": "constant", "reflect": "reflect", "replicate": "edge",
                     "border": "edge", "circular": "wrap", "edge": "edge",
                     "wrap": "wrap", "symmetric": "symmetric"}


def pad_nd(img, to_pad: Sequence[tuple[int, int]], mode: str = "constant", **kwargs):
    """Pad channel-first data by per-dim (low, high) amounts
    (reference: croppad/functional.py:73). ``to_pad`` includes the channel dim."""
    np_mode = _TORCH_TO_NP_MODE.get(str(mode), str(mode))
    pads = [(int(lo), int(hi)) for lo, hi in to_pad]
    if len(pads) < img.ndim:
        pads += [(0, 0)] * (img.ndim - len(pads))
    if is_jax(img):
        import jax.numpy as jnp

        jmode = {"constant": "constant", "edge": "edge", "reflect": "reflect",
                 "wrap": "wrap", "symmetric": "symmetric", "linear_ramp": "linear_ramp",
                 "maximum": "maximum", "mean": "mean", "median": "median",
                 "minimum": "minimum"}.get(np_mode, "constant")
        ckw = {"constant_values": kwargs.get("constant_values", kwargs.get("value", 0))} \
            if jmode == "constant" else {}
        return jnp.pad(img, pads, mode=jmode, **ckw)
    ckw = dict(kwargs)
    if "value" in ckw:
        ckw["constant_values"] = ckw.pop("value")
    if np_mode != "constant":
        ckw.pop("constant_values", None)
    return np.pad(img, pads, mode=np_mode, **ckw)


def crop_or_pad_nd(img, translation_mat, spatial_size: Sequence[int], mode: str, **kwargs):
    """Apply an integer translation by cropping/padding into ``spatial_size``
    (reference: croppad/functional.py:117 — the lazy-resample integer fast path)."""
    ndim = img.ndim - 1
    matrix_np = np.round(to_affine_nd(ndim, np.array(to_numpy(translation_mat), dtype=np.float64)))
    matrix_np = to_affine_nd(len(spatial_size), matrix_np)
    cc = np.asarray(np.meshgrid(*[[0.5, x - 0.5] for x in spatial_size], indexing="ij"))
    cc = cc.reshape((len(spatial_size), -1))
    src_cc = np.floor(matrix_np @ np.concatenate((cc, np.ones_like(cc[:1]))))
    src_start, src_end = src_cc.min(axis=1), src_cc.max(axis=1)
    to_pad, to_crop, do_pad, do_crop = [(0, 0)], [slice(None)], False, False
    for s, e, sp in zip(src_start, src_end, img.shape[1:]):
        do_pad, do_crop = do_pad or s < 0 or e > sp - 1, do_crop or s > 0 or e < sp - 1
        to_pad += [(0 if s >= 0 else int(-s), 0 if e < sp - 1 else int(e - sp + 1))]
        to_crop += [slice(int(max(s, 0)), int(e + 1 + to_pad[-1][0]))]
    if do_pad:
        img = pad_nd(img, to_pad, mode=mode, **kwargs)
    if do_crop:
        img = img[tuple(to_crop)]
    return img


def pad_func(img, to_pad, transform_info: dict | None = None, mode: str = "constant",
             lazy: bool = False, **kwargs):
    """Tracked pad (reference: croppad/functional.py:151): records the translation
    in the applied/pending stack via the Pad transform machinery."""
    from .croppad_array import Pad

    spatial_pad = [(int(lo), int(hi)) for lo, hi in to_pad][1:]  # drop channel entry
    return Pad(to_pad=spatial_pad, mode=mode, lazy=lazy, **kwargs)(img)


def crop_func(img, slices: tuple, lazy: bool = False, transform_info: dict | None = None):
    """Tracked crop (reference: croppad/functional.py:213). ``slices`` includes the
    channel dim (as in the reference); the channel slice must be `slice(None)`."""
    from .croppad_array import Crop

    slices = tuple(slices)
    if len(slices) == img.ndim:  # leading channel slice
        slices = slices[1:]
    return Crop(lazy=lazy)(img, slices=slices)
