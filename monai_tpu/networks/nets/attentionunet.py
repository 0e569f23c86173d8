"""Attention U-Net (reference: monai/networks/nets/attentionunet.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution
from ..layers.factories import Conv, get_norm_layer

__all__ = ["AttentionUnet", "AttentionBlock"]


class ConvBlock(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3,
                 strides: int = 1, dropout=0.0, *, rngs: nnx.Rngs):
        self.conv1 = Convolution(spatial_dims, in_channels, out_channels, strides=strides,
                                 kernel_size=kernel_size, act="relu", norm="batch", dropout=dropout,
                                 rngs=rngs)
        self.conv2 = Convolution(spatial_dims, out_channels, out_channels, strides=1,
                                 kernel_size=kernel_size, act="relu", norm="batch", dropout=dropout,
                                 rngs=rngs)

    def __call__(self, x):
        return self.conv2(self.conv1(x))


class UpConv(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3,
                 strides: int = 2, *, rngs: nnx.Rngs):
        self.up = Convolution(spatial_dims, in_channels, out_channels, strides=strides,
                              kernel_size=kernel_size, act="relu", norm="batch", is_transposed=True,
                              rngs=rngs)

    def __call__(self, x):
        return self.up(x)


class AttentionBlock(nnx.Module):
    """Additive attention gate (reference: attentionunet.py AttentionBlock)."""

    def __init__(self, spatial_dims: int, f_int: int, f_g: int, f_l: int, dropout=0.0, *, rngs: nnx.Rngs):
        self.W_g_conv = Conv["conv", spatial_dims](f_g, f_int, kernel_size=1, strides=1, bias=True,
                                                   padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.W_g_norm = get_norm_layer("batch", spatial_dims, f_int, rngs=rngs)
        self.W_x_conv = Conv["conv", spatial_dims](f_l, f_int, kernel_size=1, strides=1, bias=True,
                                                   padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.W_x_norm = get_norm_layer("batch", spatial_dims, f_int, rngs=rngs)
        self.psi_conv = Conv["conv", spatial_dims](f_int, 1, kernel_size=1, strides=1, bias=True,
                                                   padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.psi_norm = get_norm_layer("batch", spatial_dims, 1, rngs=rngs)

    def __call__(self, g, x):
        g1 = self.W_g_norm(self.W_g_conv(g))
        x1 = self.W_x_norm(self.W_x_conv(x))
        psi = jax.nn.relu(g1 + x1)
        psi = jax.nn.sigmoid(self.psi_norm(self.psi_conv(psi)))
        return x * psi


class AttentionLayer(nnx.Module):
    """One level: submodule (downsample+deeper) → upconv → gate → merge
    (reference: attentionunet.py AttentionLayer)."""

    def __init__(self, spatial_dims: int, in_channels: int, submodule, sub_out_channels: int,
                 up_kernel_size=3, strides: int = 2, dropout=0.0, *, rngs: nnx.Rngs):
        self.attention = AttentionBlock(spatial_dims, f_int=in_channels // 2, f_g=in_channels,
                                        f_l=in_channels, rngs=rngs)
        self.upconv = UpConv(spatial_dims, sub_out_channels, in_channels, up_kernel_size, strides,
                             rngs=rngs)
        self.submodule = submodule
        self.merge = Convolution(spatial_dims, 2 * in_channels, in_channels, act="relu", norm="batch",
                                 dropout=dropout, rngs=rngs)

    def __call__(self, x):
        fromlower = self.upconv(self.submodule(x))
        att = self.attention(g=fromlower, x=x)
        return self.merge(jnp.concatenate([att, fromlower], axis=-1))


class _Seq(nnx.Module):
    def __init__(self, mods):
        self.mods = nnx.List(mods)

    def __call__(self, x):
        for m in self.mods:
            x = m(x)
        return x


class AttentionUnet(nnx.Module):
    """(reference: attentionunet.py AttentionUnet)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 channels: Sequence[int], strides: Sequence[int], kernel_size=3, up_kernel_size=3,
                 dropout: float = 0.0, *, rngs: nnx.Rngs):
        if len(channels) < 2:
            raise ValueError("the length of `channels` should be no less than 2.")
        if len(strides) < len(channels) - 1:
            raise ValueError("the length of `strides` should equal `len(channels) - 1`.")
        self.head = ConvBlock(spatial_dims, in_channels, channels[0], kernel_size, dropout=dropout,
                              rngs=rngs)

        def _create_block(idx: int):
            """AttentionLayer at channel channels[idx], with submodule below."""
            if idx == len(channels) - 2:
                # bottom: submodule is a conv that downsamples channels[idx] -> channels[idx+1]
                sub = ConvBlock(spatial_dims, channels[idx], channels[idx + 1], kernel_size,
                                strides=strides[idx], dropout=dropout, rngs=rngs)
            else:
                down = ConvBlock(spatial_dims, channels[idx], channels[idx + 1], kernel_size,
                                 strides=strides[idx], dropout=dropout, rngs=rngs)
                deeper = _create_block(idx + 1)
                sub = _Seq([down, deeper])
            return AttentionLayer(spatial_dims, channels[idx], sub, channels[idx + 1],
                                  up_kernel_size, strides[idx], dropout, rngs=rngs)

        self.body = _create_block(0)
        self.reduce = Conv["conv", spatial_dims](channels[0], out_channels, kernel_size=1,
                                                 padding=[(0, 0)] * spatial_dims, bias=True, rngs=rngs)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x = self.head(x)
        x = self.body(x)
        x = self.reduce(x)
        perm_out = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm_out)
