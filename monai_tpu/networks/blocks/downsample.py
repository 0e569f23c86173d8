"""Downsampling blocks (reference: monai/networks/blocks/downsample.py:26 MaxAvgPool,
:69 DownSample, :221 SubpixelDownsample). Channel-last internals."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ..layers.factories import Conv
from ...utils.misc import ensure_tuple_rep

__all__ = ["MaxAvgPool", "DownSample", "SubpixelDownsample", "Downsample",
           "SubpixelDownSample"]


class MaxAvgPool(nnx.Module):
    """Concat of max pool and avg pool over the same window (reference: downsample.py:26)."""

    def __init__(self, spatial_dims: int, kernel_size, stride=None, padding=0,
                 ceil_mode: bool = False):
        self.kernel = ensure_tuple_rep(kernel_size, spatial_dims)
        self.stride = self.kernel if stride is None else ensure_tuple_rep(stride, spatial_dims)
        self.padding = ensure_tuple_rep(padding, spatial_dims)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pads = [(p, p) for p in self.padding]
        mx = nnx.max_pool(x, self.kernel, strides=self.stride, padding=pads)
        av = nnx.avg_pool(x, self.kernel, strides=self.stride, padding=pads)
        return jnp.concatenate([mx, av], axis=-1)


class DownSample(nnx.Module):
    """Configurable downsampling: conv / convgroup / maxpool / avgpool / pixelunshuffle
    (reference: downsample.py:69)."""

    def __init__(self, spatial_dims: int, in_channels: int | None = None,
                 out_channels: int | None = None, scale_factor=2, kernel_size=None,
                 mode: str = "conv", pre_conv="default", bias: bool = True,
                 *, rngs: nnx.Rngs | None = None):
        self.spatial_dims = spatial_dims
        self.mode = mode.lower()
        scale = ensure_tuple_rep(scale_factor, spatial_dims)
        self.scale = scale
        if self.mode in ("conv", "convgroup"):
            if not in_channels:
                raise ValueError("in_channels needs to be specified.")
            oc = out_channels or in_channels
            groups = in_channels if self.mode == "convgroup" else 1
            ks = kernel_size or scale
            ks = ensure_tuple_rep(ks, spatial_dims)
            self.op = Conv["conv", spatial_dims](in_channels, oc, kernel_size=ks,
                                                 strides=scale, bias=bias, groups=groups,
                                                 padding=[(0, 0)] * spatial_dims, rngs=rngs)
        elif self.mode in ("maxpool", "avgpool"):
            self.op = None
        elif self.mode == "pixelunshuffle":
            self.op = None
        else:
            raise ValueError(f"unsupported downsample mode {mode}")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode in ("conv", "convgroup"):
            return self.op(x)
        if self.mode == "maxpool":
            return nnx.max_pool(x, self.scale, strides=self.scale, padding="VALID")
        if self.mode == "avgpool":
            return nnx.avg_pool(x, self.scale, strides=self.scale, padding="VALID")
        # pixelunshuffle (space-to-depth)
        from ..nets.restormer import _pixel_unshuffle

        return _pixel_unshuffle(x, self.scale[0])


class SubpixelDownsample(nnx.Module):
    """Conv (optional) then space-to-depth (reference: downsample.py:221)."""

    def __init__(self, spatial_dims: int, in_channels: int | None,
                 out_channels: int | None = None, scale_factor: int = 2,
                 conv_block="default", bias: bool = True, *, rngs: nnx.Rngs | None = None):
        self.scale_factor = scale_factor
        if conv_block == "default":
            if not in_channels:
                raise ValueError("in_channels needs to be specified.")
            oc = out_channels or in_channels
            self.conv_block = Conv["conv", spatial_dims](in_channels, oc, kernel_size=3,
                                                         rngs=rngs)
        else:
            self.conv_block = conv_block

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..nets.restormer import _pixel_unshuffle

        if self.conv_block is not None:
            x = self.conv_block(x)
        return _pixel_unshuffle(x, self.scale_factor)


Downsample = DownSample
SubpixelDownSample = SubpixelDownsample
