"""Centered n-D FFT helpers for k-space models (reference:
monai/networks/blocks/fft_utils_t.py:18-200).

Complex values travel as a trailing real/imaginary pair (shape (..., 2)) so the
whole pipeline stays in real dtypes — friendlier to bf16 TPU matmuls than complex64
arrays, and identical to the reference's `view_as_real` convention."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp

__all__ = ["roll", "roll_1d", "fftshift", "ifftshift", "fftn_centered_t",
           "ifftn_centered_t", "fftn_centered", "ifftn_centered"]


def roll_1d(x: jnp.ndarray, shift: int, shift_dim: int) -> jnp.ndarray:
    """Circularly roll one axis (reference: fft_utils_t.py:18)."""
    return jnp.roll(x, shift, axis=shift_dim)


def roll(x: jnp.ndarray, shift: Sequence[int], shift_dims: Sequence[int]) -> jnp.ndarray:
    """Circularly roll several axes (reference: fft_utils_t.py:45)."""
    if len(shift) != len(shift_dims):
        raise ValueError(f"len(shift) != len(shift_dims) ({len(shift)} != {len(shift_dims)}).")
    return jnp.roll(x, tuple(shift), axis=tuple(shift_dims))


def fftshift(x: jnp.ndarray, shift_dims: Sequence[int]) -> jnp.ndarray:
    """Shift zero-frequency to center (reference: fft_utils_t.py:69)."""
    return roll(x, [x.shape[d] // 2 for d in shift_dims], shift_dims)


def ifftshift(x: jnp.ndarray, shift_dims: Sequence[int]) -> jnp.ndarray:
    """Inverse of fftshift (reference: fft_utils_t.py:91)."""
    return roll(x, [(x.shape[d] + 1) // 2 for d in shift_dims], shift_dims)


def _as_complex(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.asarray(x[..., 0] + 1j * x[..., 1])


def _as_real_pair(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)


def fftn_centered_t(im: jnp.ndarray, spatial_dims: int, is_complex: bool = True) -> jnp.ndarray:
    """Centered orthonormal n-D FFT; real-pair in, real-pair out
    (reference: fft_utils_t.py:157)."""
    dims = list(range(-spatial_dims, 0))
    if is_complex:
        if im.shape[-1] != 2:
            raise ValueError(f"img.shape[-1] is not 2 ({im.shape[-1]}).")
        x = _as_complex(ifftshift(im, [d - 1 for d in dims]))
    else:
        x = ifftshift(im, dims)
    x = _as_real_pair(jnp.fft.fftn(x, axes=dims, norm="ortho"))
    return fftshift(x, [d - 1 for d in dims])


def ifftn_centered_t(ksp: jnp.ndarray, spatial_dims: int, is_complex: bool = True) -> jnp.ndarray:
    """Centered orthonormal n-D inverse FFT; real-pair in, real-pair out
    (reference: fft_utils_t.py:113)."""
    dims = list(range(-spatial_dims, 0))
    if is_complex:
        if ksp.shape[-1] != 2:
            raise ValueError(f"ksp.shape[-1] is not 2 ({ksp.shape[-1]}).")
        x = _as_complex(ifftshift(ksp, [d - 1 for d in dims]))
    else:
        x = ifftshift(ksp, dims)
    x = _as_real_pair(jnp.fft.ifftn(x, axes=dims, norm="ortho"))
    return fftshift(x, [d - 1 for d in dims])


# aliases matching monai/data/fft_utils.py public names
fftn_centered = fftn_centered_t
ifftn_centered = ifftn_centered_t
