"""k-space FFT helpers for MRI reconstruction (reference: monai/data/fft_utils.py and
monai/networks/blocks/fft_utils_t.py — centered n-dim FFT/IFFT pairs)."""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..utils.backend import xp

__all__ = ["fftn_centered", "ifftn_centered"]


def fftn_centered(im: Any, spatial_dims: int, is_complex: bool = True) -> Any:
    """Centered FFT over the last ``spatial_dims`` dims (reference: fft_utils.py).

    If ``is_complex``, the last dim of size 2 holds (real, imag); output keeps that
    layout.  Otherwise operates on real input, returning the same stacked layout.
    """
    ns = xp(im)
    if is_complex:
        if im.shape[-1] != 2:
            raise ValueError(f"img.shape[-1] must be 2 when is_complex is True, got {im.shape[-1]}.")
        x = im[..., 0] + 1j * im[..., 1]
    else:
        x = im
    dims = tuple(range(-spatial_dims, 0))
    x = ns.fft.ifftshift(x, axes=dims)
    x = ns.fft.fftn(x, axes=dims, norm="ortho")
    x = ns.fft.fftshift(x, axes=dims)
    return ns.stack([x.real, x.imag], axis=-1)


def ifftn_centered(ksp: Any, spatial_dims: int, is_complex: bool = True) -> Any:
    """Centered inverse FFT (reference: fft_utils.py)."""
    ns = xp(ksp)
    if is_complex:
        if ksp.shape[-1] != 2:
            raise ValueError(f"ksp.shape[-1] must be 2 when is_complex is True, got {ksp.shape[-1]}.")
        x = ksp[..., 0] + 1j * ksp[..., 1]
    else:
        x = ksp
    dims = tuple(range(-spatial_dims, 0))
    x = ns.fft.ifftshift(x, axes=dims)
    x = ns.fft.ifftn(x, axes=dims, norm="ortho")
    x = ns.fft.fftshift(x, axes=dims)
    return ns.stack([x.real, x.imag], axis=-1)
