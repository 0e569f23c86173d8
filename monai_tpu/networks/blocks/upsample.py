"""Upsampling blocks (reference: monai/networks/blocks/upsample.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..layers.factories import Conv

__all__ = ["UpSample", "SubpixelUpsample", "interpolate"]


def interpolate(x: jnp.ndarray, scale_factor=None, size=None, mode: str = "nearest",
                align_corners: bool = False) -> jnp.ndarray:
    """Resize channel-last (B, *spatial, C) via jax.image.resize."""
    spatial = x.shape[1:-1]
    if size is None:
        sf = ensure_tuple_rep(scale_factor, len(spatial))
        size = tuple(int(round(s * f)) for s, f in zip(spatial, sf))
    method = {"nearest": "nearest", "linear": "linear", "bilinear": "linear", "trilinear": "linear",
              "bicubic": "cubic", "area": "linear"}.get(mode, mode)
    out_shape = (x.shape[0],) + tuple(size) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method=method)


class UpSample(nnx.Module):
    """deconv / nontrainable-interp / pixelshuffle upsampling
    (reference: blocks/upsample.py:36)."""

    def __init__(self, spatial_dims: int, in_channels: int | None = None, out_channels: int | None = None,
                 scale_factor: Sequence[float] | float = 2, kernel_size=None, size=None,
                 mode: str = "deconv", pre_conv="default", interp_mode: str = "linear",
                 align_corners: bool = True, bias: bool = True, apply_pad_pool: bool = True,
                 *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.mode = mode.lower()
        self.scale_factor = ensure_tuple_rep(scale_factor, spatial_dims)
        self.size = size
        self.interp_mode = interp_mode
        out_channels = out_channels or in_channels
        if self.mode == "deconv":
            kernel_size_ = kernel_size or self.scale_factor
            self.deconv = Conv[Conv.CONVTRANS, spatial_dims](
                in_channels, out_channels, kernel_size=kernel_size_, strides=self.scale_factor,
                bias=bias, rngs=rngs)
            self.preconv = None
        elif self.mode in ("nontrainable", "interp"):
            self.deconv = None
            if pre_conv == "default" and in_channels != out_channels:
                self.preconv = Conv[Conv.CONV, spatial_dims](in_channels, out_channels, kernel_size=1,
                                                             bias=bias, padding=[(0, 0)] * spatial_dims,
                                                             rngs=rngs)
            else:
                self.preconv = pre_conv if callable(pre_conv) and pre_conv != "default" else None
        elif self.mode == "pixelshuffle":
            self.deconv = None
            self.preconv = None
            self.pixelshuffle = SubpixelUpsample(spatial_dims, in_channels, out_channels,
                                                 int(self.scale_factor[0]), conv_block=pre_conv,
                                                 apply_pad_pool=apply_pad_pool, bias=bias, rngs=rngs)
        else:
            raise NotImplementedError(f"Unsupported upsampling mode {mode}.")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "deconv":
            return self.deconv(x)
        if self.mode == "pixelshuffle":
            return self.pixelshuffle(x)
        if self.preconv is not None:
            x = self.preconv(x)
        return interpolate(x, scale_factor=self.scale_factor, size=self.size, mode=self.interp_mode)


class SubpixelUpsample(nnx.Module):
    """Pixel-shuffle upsample (reference: blocks/upsample.py:—)."""

    def __init__(self, spatial_dims: int, in_channels: int | None, out_channels: int | None = None,
                 scale_factor: int = 2, conv_block="default", apply_pad_pool: bool = True,
                 bias: bool = True, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.scale_factor = scale_factor
        out_channels = out_channels or in_channels
        if conv_block == "default":
            conv_out = out_channels * (scale_factor**spatial_dims)
            self.conv_block = Conv[Conv.CONV, spatial_dims](in_channels, conv_out, kernel_size=3,
                                                            bias=bias, rngs=rngs)
        elif conv_block is None:
            self.conv_block = None
        else:
            self.conv_block = conv_block

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.conv_block is not None:
            x = self.conv_block(x)
        # channel-last pixel shuffle: (B, *S, C*r^d) -> (B, *(S*r), C)
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c_r = x.shape[-1]
        r = self.scale_factor
        d = self.spatial_dims
        c = c_r // (r**d)
        new_shape = (b,) + tuple(spatial) + (r,) * d + (c,)
        x = x.reshape(new_shape)
        # interleave: (b, s1, ..., sd, r1, ..., rd, c) -> (b, s1, r1, ..., sd, rd, c)
        perm = [0]
        for i in range(d):
            perm += [1 + i, 1 + d + i]
        perm += [1 + 2 * d]
        x = jnp.transpose(x, perm)
        out_spatial = tuple(s * r for s in spatial)
        return x.reshape((b,) + out_spatial + (c,))
