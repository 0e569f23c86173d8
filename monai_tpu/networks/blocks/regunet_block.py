"""RegUNet building blocks (reference: monai/networks/blocks/regunet_block.py:73
RegistrationResidualConvBlock, :128 RegistrationDownSampleBlock,
:191 RegistrationExtractionBlock). Channel-last internals."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from .convolutions import Convolution

__all__ = ["RegistrationResidualConvBlock", "RegistrationDownSampleBlock",
           "RegistrationExtractionBlock", "get_conv_block", "get_deconv_block"]


def get_conv_block(spatial_dims: int, in_channels: int, out_channels: int,
                   kernel_size=3, strides=1, norm="BATCH", act="RELU",
                   initializer=None, *, rngs: nnx.Rngs):
    """(reference: regunet_block.py:29 get_conv_block)."""
    return Convolution(spatial_dims, in_channels, out_channels, strides=strides,
                       kernel_size=kernel_size, act=act, norm=norm, bias=norm is None,
                       rngs=rngs)


def get_deconv_block(spatial_dims: int, in_channels: int, out_channels: int,
                     *, rngs: nnx.Rngs):
    """Transposed conv stride 2 + batch norm + relu (reference: regunet_block.py:176)."""
    return Convolution(spatial_dims, in_channels, out_channels, strides=2, act="RELU",
                       norm="BATCH", bias=False, is_transposed=True, rngs=rngs)


class RegistrationResidualConvBlock(nnx.Module):
    """(reference: regunet_block.py:73)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 num_layers: int = 2, kernel_size: int = 3, *, rngs: nnx.Rngs):
        self.num_layers = num_layers
        self.layers = nnx.List([
            nnx.Conv(in_channels if i == 0 else out_channels, out_channels,
                     kernel_size=(kernel_size,) * spatial_dims, padding="SAME", rngs=rngs)
            for i in range(num_layers)])
        self.norms = nnx.List([nnx.BatchNorm(out_channels, use_running_average=False,
                                             rngs=rngs) for _ in range(num_layers)])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skip = x
        for i, (conv, norm) in enumerate(zip(self.layers, self.norms)):
            x = norm(conv(x))
            if i == self.num_layers - 1:
                x = x + skip
            x = jax.nn.relu(x)
        return x


class RegistrationDownSampleBlock(nnx.Module):
    """Halve the spatial size (max pool or strided conv) (reference: regunet_block.py:128)."""

    def __init__(self, spatial_dims: int, channels: int, pooling: bool, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.pooling = pooling
        if not pooling:
            self.layer = get_conv_block(spatial_dims, channels, channels, kernel_size=2,
                                        strides=2, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for s in x.shape[1:-1]:
            if s % 2 != 0:
                raise ValueError(f"expecting x spatial dimensions be even, got {x.shape}")
        if self.pooling:
            return nnx.max_pool(x, (2,) * self.spatial_dims, strides=(2,) * self.spatial_dims)
        return self.layer(x)


class RegistrationExtractionBlock(nnx.Module):
    """Average per-level projections upsampled to the output size
    (reference: regunet_block.py:191)."""

    def __init__(self, spatial_dims: int, extract_levels, num_channels, out_channels: int,
                 kernel_initializer=None, activation=None, mode: str = "nearest",
                 align_corners=None, *, rngs: nnx.Rngs):
        self.extract_levels = tuple(extract_levels)
        self.max_level = max(extract_levels)
        self.mode = mode
        self.layers = nnx.List([
            get_conv_block(spatial_dims, num_channels[d], out_channels, norm=None,
                           act=activation, rngs=rngs)
            for d in self.extract_levels])

    def __call__(self, x: list, image_size) -> jnp.ndarray:
        feats = []
        for layer, level in zip(self.layers, self.extract_levels):
            f = layer(x[self.max_level - level])
            target = (f.shape[0],) + tuple(image_size) + (f.shape[-1],)
            method = "nearest" if self.mode == "nearest" else "linear"
            feats.append(jax.image.resize(f, target, method=method))
        return jnp.mean(jnp.stack(feats, axis=0), axis=0)
