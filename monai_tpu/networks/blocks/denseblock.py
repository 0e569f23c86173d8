"""Dense blocks (reference: monai/networks/blocks/denseblock.py:22 DenseBlock,
:52 ConvDenseBlock). Channel-last internals."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from .convolutions import Convolution, ResidualUnit

__all__ = ["DenseBlock", "ConvDenseBlock"]


class DenseBlock(nnx.Module):
    """Each layer's output is concatenated (channel-wise) to its input before the next
    layer (reference: denseblock.py:22)."""

    def __init__(self, layers: Sequence):
        self.layers = nnx.List(list(layers))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            out = layer(x)
            x = jnp.concatenate([x, out], axis=-1)
        return x


class ConvDenseBlock(DenseBlock):
    """DenseBlock of Convolution/ResidualUnit layers with growing input channels
    (reference: denseblock.py:52)."""

    def __init__(self, spatial_dims: int, in_channels: int, channels: Sequence[int],
                 dilations: Sequence[int] | None = None, kernel_size=3,
                 num_res_units: int = 0, adn_ordering: str = "NDA", act="PRELU",
                 norm="INSTANCE", dropout=None, bias: bool = True, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.kernel_size = kernel_size
        self.num_res_units = num_res_units
        self.adn_ordering = adn_ordering
        self.act = act
        self.norm = norm
        self.dropout = dropout
        self.bias = bias
        dilations = list(dilations) if dilations is not None else [1] * len(channels)
        if len(channels) != len(dilations):
            raise ValueError("channels and dilations must have the same length.")
        layers = []
        ch = in_channels
        for c, d in zip(channels, dilations):
            layers.append(self._get_layer(ch, c, d, rngs))
            ch += c
        super().__init__(layers)

    def _get_layer(self, in_channels: int, out_channels: int, dilation: int, rngs):
        if self.num_res_units > 0:
            return ResidualUnit(self.spatial_dims, in_channels, out_channels, strides=1,
                                kernel_size=self.kernel_size, subunits=self.num_res_units,
                                adn_ordering=self.adn_ordering, act=self.act,
                                norm=self.norm, dropout=self.dropout,
                                dilation=dilation, bias=self.bias, rngs=rngs)
        return Convolution(self.spatial_dims, in_channels, out_channels, strides=1,
                           kernel_size=self.kernel_size, adn_ordering=self.adn_ordering,
                           act=self.act, norm=self.norm, dropout=self.dropout,
                           dilation=dilation, bias=self.bias, rngs=rngs)
