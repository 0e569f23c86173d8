"""Classifier / Discriminator / Critic / Regressor / Generator heads
(reference: monai/networks/nets/classifier.py, regressor.py, generator.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..blocks.convolutions import Convolution, ResidualUnit
from ..layers.factories import get_act_fn

__all__ = ["Regressor", "Classifier", "Discriminator", "Critic", "Generator"]


class Regressor(nnx.Module):
    """Conv tower + linear head (reference: regressor.py)."""

    def __init__(self, in_shape: Sequence[int], out_shape: Sequence[int], channels: Sequence[int],
                 strides: Sequence[int], kernel_size=3, num_res_units: int = 2, act="PRELU",
                 norm="INSTANCE", dropout=None, bias: bool = True, *, rngs: nnx.Rngs):
        self.in_channels, *self.in_shape = in_shape
        self.dimensions = len(self.in_shape)
        self.out_shape = tuple(out_shape)
        layers = []
        echannel = self.in_channels
        self.final_size = np.asarray(self.in_shape, dtype=int)
        for i, (c, s) in enumerate(zip(channels, strides)):
            if num_res_units > 0:
                layers.append(ResidualUnit(self.dimensions, echannel, c, s, kernel_size, num_res_units,
                                           act=act, norm=norm, dropout=dropout, bias=bias,
                                           last_conv_only=(i == len(channels) - 1), rngs=rngs))
            else:
                layers.append(Convolution(self.dimensions, echannel, c, s, kernel_size, act=act,
                                          norm=norm, dropout=dropout, bias=bias,
                                          conv_only=(i == len(channels) - 1), rngs=rngs))
            echannel = c
            self.final_size = (self.final_size + s - 1) // s
        self.net = nnx.List(layers)
        linear_size = int(np.prod(self.final_size)) * echannel
        self.final = nnx.Linear(linear_size, int(np.prod(self.out_shape)), rngs=rngs)

    def _head(self, x):
        x = x.reshape(x.shape[0], -1)
        x = self.final(x)
        return x.reshape((x.shape[0],) + self.out_shape)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        for layer in self.net:
            x = layer(x)
        return self._head(x)


class Classifier(Regressor):
    """Regressor with (classes,) output and optional final activation
    (reference: classifier.py)."""

    def __init__(self, in_shape: Sequence[int], classes: int, channels: Sequence[int],
                 strides: Sequence[int], kernel_size=3, num_res_units: int = 2, act="PRELU",
                 norm="INSTANCE", dropout=None, bias: bool = True, last_act=None, *, rngs: nnx.Rngs):
        super().__init__(in_shape, (classes,), channels, strides, kernel_size, num_res_units, act,
                         norm, dropout, bias, rngs=rngs)
        self.last_act = get_act_fn(last_act) if last_act is not None else None

    def __call__(self, x):
        out = super().__call__(x)
        return self.last_act(out) if self.last_act is not None else out


class Discriminator(Classifier):
    """Single-logit sigmoid classifier (reference: classifier.py Discriminator)."""

    def __init__(self, in_shape: Sequence[int], channels: Sequence[int], strides: Sequence[int],
                 kernel_size=3, num_res_units: int = 2, act="PRELU", norm="INSTANCE", dropout=0.25,
                 bias: bool = True, last_act="SIGMOID", *, rngs: nnx.Rngs):
        super().__init__(in_shape, 1, channels, strides, kernel_size, num_res_units, act, norm,
                         dropout, bias, last_act, rngs=rngs)


class Critic(Classifier):
    """WGAN critic: no final activation, mean over output (reference: classifier.py Critic)."""

    def __init__(self, in_shape: Sequence[int], channels: Sequence[int], strides: Sequence[int],
                 kernel_size=3, num_res_units: int = 2, act="PRELU", norm="INSTANCE", dropout=0.25,
                 bias: bool = True, *, rngs: nnx.Rngs):
        super().__init__(in_shape, 1, channels, strides, kernel_size, num_res_units, act, norm,
                         dropout, bias, None, rngs=rngs)

    def __call__(self, x):
        out = super().__call__(x)
        return out.reshape(x.shape[0], -1).mean(axis=1, keepdims=True)


class Generator(nnx.Module):
    """Latent → image generator (reference: generator.py)."""

    def __init__(self, latent_shape: Sequence[int], start_shape: Sequence[int],
                 channels: Sequence[int], strides: Sequence[int], kernel_size=3,
                 num_res_units: int = 2, act="PRELU", norm="INSTANCE", dropout=None, bias: bool = True,
                 *, rngs: nnx.Rngs):
        self.in_channels, *self.start_shape = tuple(start_shape)
        self.dimensions = len(self.start_shape)
        self.latent_shape = tuple(latent_shape)
        latent_size = int(np.prod(self.latent_shape))
        start_size = int(np.prod(start_shape))
        self.linear = nnx.Linear(latent_size, start_size, rngs=rngs)
        layers = []
        echannel = self.in_channels
        for i, (c, s) in enumerate(zip(channels, strides)):
            is_last = i == len(channels) - 1
            layers.append(Convolution(self.dimensions, echannel, c, s, kernel_size, act=act, norm=norm,
                                      dropout=dropout, bias=bias, conv_only=is_last and num_res_units == 0,
                                      is_transposed=True, rngs=rngs))
            if num_res_units > 0:
                layers.append(ResidualUnit(self.dimensions, c, c, 1, kernel_size, num_res_units, act=act,
                                           norm=norm, dropout=dropout, bias=bias, last_conv_only=is_last,
                                           rngs=rngs))
            echannel = c
        self.conv = nnx.List(layers)

    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = self.linear(x)
        x = x.reshape((x.shape[0],) + tuple(self.start_shape) + (self.in_channels,))
        for layer in self.conv:
            x = layer(x)
        perm_out = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm_out)
