"""LocalNet registration blocks (reference: monai/networks/blocks/localnet_block.py:26
ResidualBlock, :98 LocalNetResidualBlock, :115 LocalNetDownSampleBlock,
:171 LocalNetUpSampleBlock, :251 LocalNetFeatureExtractorBlock). Channel-last."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from .convolutions import Convolution
from .regunet_block import get_conv_block, get_deconv_block

__all__ = ["ResidualBlock", "LocalNetResidualBlock", "LocalNetDownSampleBlock",
           "LocalNetUpSampleBlock", "LocalNetFeatureExtractorBlock"]


class ResidualBlock(nnx.Module):
    """conv-norm-relu-conv-norm + skip, relu (reference: localnet_block.py:26)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 kernel_size, *, rngs: nnx.Rngs):
        if in_channels != out_channels:
            raise ValueError("expecting in_channels == out_channels, got "
                             f"{in_channels} vs {out_channels}")
        self.conv_block = get_conv_block(spatial_dims, in_channels, out_channels,
                                         kernel_size=kernel_size, rngs=rngs)
        from ...utils.misc import ensure_tuple_rep

        ks = ensure_tuple_rep(kernel_size, spatial_dims)
        self.conv = nnx.Conv(out_channels, out_channels, kernel_size=ks, padding="SAME",
                             rngs=rngs)
        self.norm = nnx.BatchNorm(out_channels, use_running_average=False, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.relu(self.norm(self.conv(self.conv_block(x))) + x)


class LocalNetResidualBlock(nnx.Module):
    """conv-norm + mid, relu (reference: localnet_block.py:98)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 *, rngs: nnx.Rngs):
        if in_channels != out_channels:
            raise ValueError("expecting in_channels == out_channels.")
        self.conv = nnx.Conv(in_channels, out_channels, kernel_size=(3,) * spatial_dims,
                             padding="SAME", rngs=rngs)
        self.norm = nnx.BatchNorm(out_channels, use_running_average=False, rngs=rngs)

    def __call__(self, x: jnp.ndarray, mid: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.relu(self.norm(self.conv(x)) + mid)


class LocalNetDownSampleBlock(nnx.Module):
    """conv-block -> residual -> max pool; returns (down, mid)
    (reference: localnet_block.py:115)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 kernel_size, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.conv_block = get_conv_block(spatial_dims, in_channels, out_channels,
                                         kernel_size=kernel_size, rngs=rngs)
        self.residual_block = ResidualBlock(spatial_dims, out_channels, out_channels,
                                            kernel_size, rngs=rngs)

    def __call__(self, x: jnp.ndarray):
        for s in x.shape[1:-1]:
            if s % 2 != 0:
                raise ValueError(f"expecting x spatial dimensions be even, got {x.shape}")
        x = self.conv_block(x)
        mid = self.residual_block(x)
        down = nnx.max_pool(mid, (2,) * self.spatial_dims, strides=(2,) * self.spatial_dims)
        return down, mid


class LocalNetUpSampleBlock(nnx.Module):
    """Deconv + additive upsampling, merged with the skip (reference: localnet_block.py:171)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 mode: str = "nearest", align_corners=None, *, rngs: nnx.Rngs):
        if in_channels / out_channels != 2:
            raise ValueError("expecting in_channels == 2 * out_channels.")
        self.deconv_block = get_deconv_block(spatial_dims, in_channels, out_channels,
                                             rngs=rngs)
        self.conv_block = get_conv_block(spatial_dims, out_channels, out_channels, rngs=rngs)
        self.residual_block = LocalNetResidualBlock(spatial_dims, out_channels,
                                                    out_channels, rngs=rngs)
        self.out_channels = out_channels
        self.mode = "nearest" if mode == "nearest" else "linear"

    def additive_upsampling(self, x: jnp.ndarray, mid: jnp.ndarray) -> jnp.ndarray:
        target = (x.shape[0],) + mid.shape[1:-1] + (x.shape[-1],)
        up = jax.image.resize(x, target, method=self.mode)
        parts = jnp.split(up, up.shape[-1] // self.out_channels, axis=-1)
        return jnp.sum(jnp.stack(parts, axis=-1), axis=-1)

    def __call__(self, x: jnp.ndarray, mid: jnp.ndarray) -> jnp.ndarray:
        for i, j in zip(x.shape[1:-1], mid.shape[1:-1]):
            if j != 2 * i:
                raise ValueError("expecting mid spatial dims to double x's, got "
                                 f"{x.shape} vs {mid.shape}")
        h0 = self.deconv_block(x) + self.additive_upsampling(x, mid)
        r1 = h0 + mid
        r2 = self.conv_block(h0)
        return self.residual_block(r2, r1)


class LocalNetFeatureExtractorBlock(nnx.Module):
    """conv block with custom activation (reference: localnet_block.py:251)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 act="RELU", initializer: str = "kaiming_uniform", *, rngs: nnx.Rngs):
        self.conv_block = get_conv_block(spatial_dims, in_channels, out_channels,
                                         act=act, norm=None, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv_block(x)
