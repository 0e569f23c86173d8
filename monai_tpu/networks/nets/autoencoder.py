"""AutoEncoder / VarAutoEncoder (reference: monai/networks/nets/autoencoder.py,
varautoencoder.py)."""
from __future__ import annotations

import math
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..blocks.convolutions import Convolution, ResidualUnit

__all__ = ["AutoEncoder", "VarAutoEncoder"]


class AutoEncoder(nnx.Module):
    """Symmetric conv autoencoder (reference: autoencoder.py AutoEncoder)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 channels: Sequence[int], strides: Sequence[int], kernel_size=3, up_kernel_size=3,
                 num_res_units: int = 0, inter_channels: Sequence | None = None, inter_dilations=None,
                 num_inter_units: int = 2, act="PRELU", norm="INSTANCE", dropout=None, bias: bool = True,
                 *, rngs: nnx.Rngs):
        self.dimensions = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.channels = list(channels)
        self.strides = list(strides)
        self.kernel_size = kernel_size
        self.up_kernel_size = up_kernel_size
        self.num_res_units = num_res_units
        self.act = act
        self.norm = norm
        self.dropout = dropout
        self.bias = bias
        self.num_inter_units = num_inter_units
        self.inter_channels = list(inter_channels) if inter_channels is not None else []
        self.inter_dilations = list(inter_dilations or [1] * len(self.inter_channels))

        self.encoded_channels = in_channels
        self.encode, self.encoded_channels = self._get_encode_module(self.encoded_channels, channels,
                                                                     strides, rngs)
        self.intermediate, self.encoded_channels = self._get_intermediate_module(self.encoded_channels,
                                                                                 num_inter_units, rngs)
        decode_channel_list = list(channels[-2::-1]) + [out_channels]
        self.decode, _ = self._get_decode_module(self.encoded_channels, decode_channel_list,
                                                 strides[::-1] or [1], rngs)

    def _get_encode_module(self, in_channels, channels, strides, rngs):
        layers = []
        layer_channels = in_channels
        for c, s in zip(channels, strides):
            layers.append(self._get_encode_layer(layer_channels, c, s, False, rngs))
            layer_channels = c
        return nnx.List(layers), layer_channels

    def _get_intermediate_module(self, in_channels, num_inter_units, rngs):
        if not self.inter_channels:
            return nnx.List([]), in_channels
        layers = []
        layer_channels = in_channels
        for dc, di in zip(self.inter_channels, self.inter_dilations):
            if self.num_inter_units > 0:
                layers.append(ResidualUnit(self.dimensions, layer_channels, dc, 1, self.kernel_size,
                                           self.num_inter_units, act=self.act, norm=self.norm,
                                           dropout=self.dropout, dilation=di, bias=self.bias, rngs=rngs))
            else:
                layers.append(Convolution(self.dimensions, layer_channels, dc, 1, self.kernel_size,
                                          act=self.act, norm=self.norm, dropout=self.dropout, dilation=di,
                                          bias=self.bias, rngs=rngs))
            layer_channels = dc
        return nnx.List(layers), layer_channels

    def _get_decode_module(self, in_channels, channels, strides, rngs):
        layers = []
        layer_channels = in_channels
        for i, (c, s) in enumerate(zip(channels, strides)):
            is_last = i == len(channels) - 1
            layers.append(self._get_decode_layer(layer_channels, c, s, is_last, rngs))
            layer_channels = c
        return nnx.List(layers), layer_channels

    def _get_encode_layer(self, in_channels, out_channels, strides, is_last, rngs):
        if self.num_res_units > 0:
            return ResidualUnit(self.dimensions, in_channels, out_channels, strides, self.kernel_size,
                                self.num_res_units, act=self.act, norm=self.norm, dropout=self.dropout,
                                bias=self.bias, last_conv_only=is_last, rngs=rngs)
        return Convolution(self.dimensions, in_channels, out_channels, strides, self.kernel_size,
                           act=self.act, norm=self.norm, dropout=self.dropout, bias=self.bias,
                           conv_only=is_last, rngs=rngs)

    def _get_decode_layer(self, in_channels, out_channels, strides, is_last, rngs):
        mods = [Convolution(self.dimensions, in_channels, out_channels, strides, self.up_kernel_size,
                            act=self.act, norm=self.norm, dropout=self.dropout, bias=self.bias,
                            conv_only=is_last and self.num_res_units == 0, is_transposed=True, rngs=rngs)]
        if self.num_res_units > 0:
            mods.append(ResidualUnit(self.dimensions, out_channels, out_channels, 1, self.up_kernel_size,
                                     1, act=self.act, norm=self.norm, dropout=self.dropout, bias=self.bias,
                                     last_conv_only=is_last, rngs=rngs))
        return nnx.List(mods)

    def _apply_channel_last(self, x):
        for layer in self.encode:
            x = layer(x)
        for layer in self.intermediate:
            x = layer(x)
        for layer in self.decode:
            if isinstance(layer, nnx.List):
                for m in layer:
                    x = m(x)
            else:
                x = layer(x)
        return x

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x = self._apply_channel_last(x)
        perm_out = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm_out)


class VarAutoEncoder(AutoEncoder):
    """Variational autoencoder (reference: varautoencoder.py)."""

    def __init__(self, spatial_dims: int, in_shape: Sequence[int], out_channels: int,
                 latent_size: int, channels: Sequence[int], strides: Sequence[int], kernel_size=3,
                 up_kernel_size=3, num_res_units: int = 0, inter_channels=None, inter_dilations=None,
                 num_inter_units: int = 2, act="PRELU", norm="INSTANCE", dropout=None, bias: bool = True,
                 use_sigmoid: bool = True, *, rngs: nnx.Rngs):
        self.in_channels, *self.in_shape = in_shape
        self.use_sigmoid = use_sigmoid
        self.latent_size = latent_size
        self.final_size = np.asarray(self.in_shape, dtype=int)
        super().__init__(spatial_dims, self.in_channels, out_channels, channels, strides, kernel_size,
                         up_kernel_size, num_res_units, inter_channels, inter_dilations, num_inter_units,
                         act, norm, dropout, bias, rngs=rngs)
        for s in strides:
            self.final_size = (self.final_size + s - 1) // s
        linear_size = int(np.prod(self.final_size)) * self.encoded_channels
        self.mu = nnx.Linear(linear_size, latent_size, rngs=rngs)
        self.logvar = nnx.Linear(linear_size, latent_size, rngs=rngs)
        self.decodeL = nnx.Linear(latent_size, linear_size, rngs=rngs)
        self._rngs = rngs

    def encode_forward(self, x):
        for layer in self.encode:
            x = layer(x)
        for layer in self.intermediate:
            x = layer(x)
        x = x.reshape(x.shape[0], -1)
        return self.mu(x), self.logvar(x)

    def decode_forward(self, z, use_sigmoid: bool = True):
        x = jax.nn.relu(self.decodeL(z))
        x = x.reshape((x.shape[0],) + tuple(int(s) for s in self.final_size) + (self.encoded_channels,))
        for layer in self.decode:
            if isinstance(layer, nnx.List):
                for m in layer:
                    x = m(x)
            else:
                x = layer(x)
        if use_sigmoid:
            x = jax.nn.sigmoid(x)
        return x

    def reparameterize(self, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        key = self._rngs.params() if hasattr(self._rngs, "params") else jax.random.PRNGKey(0)
        return mu + std * jax.random.normal(key, std.shape)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        mu, logvar = self.encode_forward(x)
        z = self.reparameterize(mu, logvar)
        out = self.decode_forward(z, self.use_sigmoid)
        perm_out = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
        return jnp.transpose(out, perm_out), mu, logvar, z
