"""Reconstruction network tensor utilities (reference:
monai/apps/reconstruction/networks/nets/utils.py:26-330) — jnp versions of the
complex-as-last-dim reshape/normalize/pad helpers and the coil sensitivity
reduce/expand operators used by VarNet."""
from __future__ import annotations

import math

import jax.numpy as jnp

from .....data.fft_utils import fftn_centered, ifftn_centered
from ...complex_utils import complex_conj, complex_mul

__all__ = [
    "reshape_complex_to_channel_dim",
    "reshape_channel_complex_to_last_dim",
    "reshape_channel_to_batch_dim",
    "reshape_batch_channel_to_channel_dim",
    "complex_normalize",
    "divisible_pad_t",
    "inverse_divisible_pad_t",
    "floor_ceil",
    "sensitivity_map_reduce",
    "sensitivity_map_expand",
]


def reshape_complex_to_channel_dim(x: jnp.ndarray) -> jnp.ndarray:
    """(B,C,...,2) -> (B,2C,...) (reference: nets/utils.py:26)."""
    if x.shape[-1] != 2:
        raise ValueError(f"last dim must be 2, but x.shape[-1] is {x.shape[-1]}.")
    if x.ndim == 5:
        b, c, h, w, _ = x.shape
        return jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(b, 2 * c, h, w)
    if x.ndim == 6:
        b, c, h, w, d, _ = x.shape
        return jnp.transpose(x, (0, 5, 1, 2, 3, 4)).reshape(b, 2 * c, h, w, d)
    raise ValueError(f"only 2D (B,C,H,W,2) and 3D (B,C,H,W,D,2) data are supported, got {x.shape}")


def reshape_channel_complex_to_last_dim(x: jnp.ndarray) -> jnp.ndarray:
    """(B,2C,...) -> (B,C,...,2) (reference: nets/utils.py:57)."""
    if x.shape[1] % 2 != 0:
        raise ValueError(f"channel dimension should be even but ({x.shape[1]}) is odd.")
    c = x.shape[1] // 2
    if x.ndim == 4:
        b, _, h, w = x.shape
        return jnp.transpose(x.reshape(b, 2, c, h, w), (0, 2, 3, 4, 1))
    if x.ndim == 5:
        b, _, h, w, d = x.shape
        return jnp.transpose(x.reshape(b, 2, c, h, w, d), (0, 2, 3, 4, 5, 1))
    raise ValueError(f"only 2D (B,C*2,H,W) and 3D (B,C*2,H,W,D) data are supported, got {x.shape}")


def reshape_channel_to_batch_dim(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """(B,C,...,2) -> ((B*C,1,...,2), B) (reference: nets/utils.py:89)."""
    if x.ndim == 5:
        b, c, h, w, two = x.shape
        return x.reshape(b * c, 1, h, w, two), b
    if x.ndim == 6:
        b, c, h, w, d, two = x.shape
        return x.reshape(b * c, 1, h, w, d, two), b
    raise ValueError(f"only 2D (B,C,H,W,2) and 3D (B,C,H,W,D,2) data are supported, got {x.shape}")


def reshape_batch_channel_to_channel_dim(x: jnp.ndarray, batch_size: int) -> jnp.ndarray:
    """(B*C,1,...,2) -> (B,C,...,2) (reference: nets/utils.py:111)."""
    if x.ndim == 5:
        bc, _, h, w, two = x.shape
        return x.reshape(batch_size, bc // batch_size, h, w, two)
    if x.ndim == 6:
        bc, _, h, w, d, two = x.shape
        return x.reshape(batch_size, bc // batch_size, h, w, d, two)
    raise ValueError(f"only (B*C,1,H,W,2) and (B*C,1,H,W,D,2) data are supported, got {x.shape}")


def complex_normalize(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-batch, per-part (real/imag) mean-std normalization of (B,C,...)
    channel-stacked complex data (reference: nets/utils.py:129)."""
    if x.ndim == 4:
        b, c, h, w = x.shape
        flat = x.reshape(b, 2, c // 2 * h * w)
        mean = flat.mean(axis=2).reshape(b, 2, 1, 1, 1)
        std = flat.std(axis=2).reshape(b, 2, 1, 1, 1)
        mean = jnp.broadcast_to(mean, (b, 2, c // 2, 1, 1)).reshape(b, c, 1, 1)
        std = jnp.broadcast_to(std, (b, 2, c // 2, 1, 1)).reshape(b, c, 1, 1)
        return (x - mean) / std, mean, std
    if x.ndim == 5:
        b, c, h, w, d = x.shape
        flat = x.reshape(b, 2, c // 2 * h * w * d)
        mean = flat.mean(axis=2).reshape(b, 2, 1, 1, 1, 1)
        std = flat.std(axis=2).reshape(b, 2, 1, 1, 1, 1)
        mean = jnp.broadcast_to(mean, (b, 2, c // 2, 1, 1, 1)).reshape(b, c, 1, 1, 1)
        std = jnp.broadcast_to(std, (b, 2, c // 2, 1, 1, 1)).reshape(b, c, 1, 1, 1)
        return (x - mean) / std, mean, std
    raise ValueError(f"only 2D (B,C,H,W) and 3D (B,C,H,W,D) data are supported, got {x.shape}")


def floor_ceil(n: float) -> tuple[int, int]:
    """(floor(n), ceil(n)) (reference: nets/utils.py:310)."""
    return math.floor(n), math.ceil(n)


def divisible_pad_t(x: jnp.ndarray, k: int = 16):
    """Symmetric pad of spatial dims to multiples of k; returns (padded,
    pad_sizes) in the reference's (h_pad, w_pad, d_pad, h_mult, w_mult, d_mult)
    layout (reference: nets/utils.py:236)."""
    if x.ndim == 4:
        b, c, h, w = x.shape
        w_mult = ((w - 1) | (k - 1)) + 1
        h_mult = ((h - 1) | (k - 1)) + 1
        w_pad = floor_ceil((w_mult - w) / 2)
        h_pad = floor_ceil((h_mult - h) / 2)
        x = jnp.pad(x, ((0, 0), (0, 0), h_pad, w_pad))
        return x, (h_pad, w_pad, (-1, -1), h_mult, w_mult, -1)
    if x.ndim == 5:
        b, c, h, w, d = x.shape
        w_mult = ((w - 1) | (k - 1)) + 1
        h_mult = ((h - 1) | (k - 1)) + 1
        d_mult = ((d - 1) | (k - 1)) + 1
        w_pad = floor_ceil((w_mult - w) / 2)
        h_pad = floor_ceil((h_mult - h) / 2)
        d_pad = floor_ceil((d_mult - d) / 2)
        x = jnp.pad(x, ((0, 0), (0, 0), h_pad, w_pad, d_pad))
        return x, (h_pad, w_pad, d_pad, h_mult, w_mult, d_mult)
    raise ValueError(f"only 2D (B,C,H,W) and 3D (B,C,H,W,D) data are supported, got {x.shape}")


def inverse_divisible_pad_t(x: jnp.ndarray, pad_sizes) -> jnp.ndarray:
    """Undo ``divisible_pad_t`` (reference: nets/utils.py:292)."""
    h_pad, w_pad, d_pad, h_mult, w_mult, d_mult = pad_sizes
    if x.ndim == 4:
        return x[..., h_pad[0]:h_mult - h_pad[1], w_pad[0]:w_mult - w_pad[1]]
    if x.ndim == 5:
        return x[..., h_pad[0]:h_mult - h_pad[1], w_pad[0]:w_mult - w_pad[1],
                 d_pad[0]:d_mult - d_pad[1]]
    raise ValueError(f"only 2D and 3D data are supported, got {x.shape}")


def sensitivity_map_reduce(kspace: jnp.ndarray, sens_maps: jnp.ndarray,
                           spatial_dims: int = 2) -> jnp.ndarray:
    """Coil k-space -> coil-combined image via conj(sens) multiply + sum
    (reference: nets/utils.py:313)."""
    img = ifftn_centered(kspace, spatial_dims=spatial_dims, is_complex=True)
    return complex_mul(img, complex_conj(sens_maps)).sum(axis=1, keepdims=True)


def sensitivity_map_expand(img: jnp.ndarray, sens_maps: jnp.ndarray,
                           spatial_dims: int = 2) -> jnp.ndarray:
    """Image -> per-coil k-space via sens multiply + FFT (reference:
    nets/utils.py:330)."""
    return fftn_centered(complex_mul(img, sens_maps), spatial_dims=spatial_dims, is_complex=True)
