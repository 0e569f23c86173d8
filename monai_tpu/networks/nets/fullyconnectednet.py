"""Fully-connected networks (reference: monai/networks/nets/fullyconnectednet.py:31
FullyConnectedNet, :91 VarFullyConnectedNet)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.factories import get_act_layer

__all__ = ["FullyConnectedNet", "VarFullyConnectedNet"]


class _FCLayer(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, act, dropout, bias: bool, *, rngs: nnx.Rngs):
        self.linear = nnx.Linear(in_ch, out_ch, use_bias=bias, rngs=rngs)
        self.act = get_act_layer(act) if act is not None else None
        self.dropout = nnx.Dropout(rate=float(dropout), rngs=rngs) if dropout else None

    def __call__(self, x):
        x = self.linear(x)
        if self.act is not None:
            x = self.act(x)
        if self.dropout is not None:
            x = self.dropout(x)
        return x


class FullyConnectedNet(nnx.Module):
    """MLP with per-layer act+dropout (reference: fullyconnectednet.py:31)."""

    def __init__(self, in_channels: int, out_channels: int, hidden_channels: Sequence[int],
                 dropout=None, act="PRELU", bias: bool = True, adn_ordering=None,
                 *, rngs: nnx.Rngs):
        self.in_channels = in_channels
        self.out_channels = out_channels
        layers = []
        prev = in_channels
        for c in hidden_channels:
            layers.append(_FCLayer(prev, c, act, dropout, bias, rngs=rngs))
            prev = c
        self.hidden = nnx.List(layers)
        self.output = nnx.Linear(prev, out_channels, use_bias=bias, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        for layer in self.hidden:
            x = layer(x)
        return self.output(x)


class VarFullyConnectedNet(nnx.Module):
    """Variational MLP: encode -> (mu, logvar) -> reparameterize -> decode
    (reference: fullyconnectednet.py:91)."""

    def __init__(self, in_channels: int, out_channels: int, latent_size: int,
                 encode_channels: Sequence[int], decode_channels: Sequence[int],
                 dropout=None, act="PRELU", bias: bool = True, adn_ordering=None,
                 *, rngs: nnx.Rngs):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.latent_size = latent_size
        enc = []
        prev = in_channels
        for c in encode_channels:
            enc.append(_FCLayer(prev, c, act, dropout, bias, rngs=rngs))
            prev = c
        self.encode = nnx.List(enc)
        self.mu = nnx.Linear(prev, latent_size, rngs=rngs)
        self.logvar = nnx.Linear(prev, latent_size, rngs=rngs)
        self.decodeL = nnx.Linear(latent_size, prev, rngs=rngs)
        dec = []
        for c in decode_channels:
            dec.append(_FCLayer(prev, c, act, dropout, bias, rngs=rngs))
            prev = c
        self.decode = nnx.List(dec)
        self.final = nnx.Linear(prev, out_channels, use_bias=bias, rngs=rngs)
        self._rngs = rngs

    def encode_forward(self, x: jnp.ndarray):
        x = x.reshape(x.shape[0], -1)
        for layer in self.encode:
            x = layer(x)
        return self.mu(x), self.logvar(x)

    def decode_forward(self, z: jnp.ndarray, use_sigmoid: bool = True) -> jnp.ndarray:
        x = jax.nn.relu(self.decodeL(z))
        for layer in self.decode:
            x = layer(x)
        x = self.final(x)
        return jax.nn.sigmoid(x) if use_sigmoid else x

    def reparameterize(self, mu: jnp.ndarray, logvar: jnp.ndarray, key=None) -> jnp.ndarray:
        std = jnp.exp(0.5 * logvar)
        if key is None:
            key = self._rngs.params() if hasattr(self._rngs, "params") else jax.random.PRNGKey(0)
        return mu + std * jax.random.normal(key, std.shape)

    def __call__(self, x: jnp.ndarray, key=None):
        mu, logvar = self.encode_forward(x)
        z = self.reparameterize(mu, logvar, key)
        return self.decode_forward(z), mu, logvar, z
