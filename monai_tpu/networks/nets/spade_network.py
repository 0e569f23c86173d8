"""SPADE semantic image synthesis network
(reference: monai/networks/nets/spade_network.py:36 SPADENetResBlock, :127 SPADEEncoder,
:214 SPADEDecoder, :337 SPADENet). Channel-first public API, channel-last internals.
"""
from __future__ import annotations

import math
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.enums import StrEnum
from ..blocks.convolutions import Convolution
from ..blocks.spade_norm import SPADE
from ..layers.factories import get_act_layer

__all__ = ["SPADENet", "SPADENetResBlock", "SPADEEncoder", "SPADEDecoder"]


class SPADENetResBlock(nnx.Module):
    """Residual block with SPADE norms (reference: spade_network.py:36). Channel-last."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, label_nc: int,
                 spade_intermediate_channels: int = 128, norm="INSTANCE",
                 act=("LEAKYRELU", {"negative_slope": 0.2}), kernel_size: int = 3,
                 *, rngs: nnx.Rngs):
        self.int_channels = min(in_channels, out_channels)
        self.learned_shortcut = in_channels != out_channels
        self.conv_0 = Convolution(spatial_dims, in_channels, self.int_channels, act=None,
                                  norm=None, rngs=rngs)
        self.conv_1 = Convolution(spatial_dims, self.int_channels, out_channels, act=None,
                                  norm=None, rngs=rngs)
        self.activation = get_act_layer(act)
        self.norm_0 = SPADE(label_nc, in_channels, kernel_size, spatial_dims,
                            spade_intermediate_channels, norm, rngs=rngs)
        self.norm_1 = SPADE(label_nc, self.int_channels, kernel_size, spatial_dims,
                            spade_intermediate_channels, norm, rngs=rngs)
        if self.learned_shortcut:
            self.conv_s = Convolution(spatial_dims, in_channels, out_channels, act=None,
                                      norm=None, kernel_size=1, rngs=rngs)
            self.norm_s = SPADE(label_nc, in_channels, kernel_size, spatial_dims,
                                spade_intermediate_channels, norm, rngs=rngs)

    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        x_s = self.conv_s(self.norm_s(x, seg)) if self.learned_shortcut else x
        dx = self.conv_0(self.activation(self.norm_0(x, seg)))
        dx = self.conv_1(self.activation(self.norm_1(dx, seg)))
        return x_s + dx


class SPADEEncoder(nnx.Module):
    """VAE style-encoder (reference: spade_network.py:127). Channel-first public API."""

    def __init__(self, spatial_dims: int, in_channels: int, z_dim: int,
                 channels: Sequence[int], input_shape: Sequence[int], kernel_size: int = 3,
                 norm="INSTANCE", act=("LEAKYRELU", {"negative_slope": 0.2}),
                 *, rngs: nnx.Rngs):
        if len(input_shape) != spatial_dims:
            raise ValueError(f"Length of input_shape must match spatial_dims; got {input_shape}")
        for s_ind, s_ in enumerate(input_shape):
            if s_ % (2 ** len(channels)) != 0:
                raise ValueError(f"Input dim {s_ind} ({s_}) not divisible by 2**depth.")
        self.z_dim = z_dim
        self.channels = list(channels)
        self.latent_spatial_shape = [s_ // (2 ** len(channels)) for s_ in input_shape]
        blocks = []
        ch = in_channels
        for c in channels:
            blocks.append(Convolution(spatial_dims, ch, c, strides=2, kernel_size=kernel_size,
                                      norm=norm, act=act, rngs=rngs))
            ch = c
        self.blocks = nnx.List(blocks)
        flat = int(np.prod(self.latent_spatial_shape)) * channels[-1]
        self.fc_mu = nnx.Linear(flat, z_dim, rngs=rngs)
        self.fc_var = nnx.Linear(flat, z_dim, rngs=rngs)

    def _features(self, x_cf: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, x_cf.ndim)) + (1,)
        h = jnp.transpose(x_cf, perm_in)
        for blk in self.blocks:
            h = blk(h)
        return h.reshape(h.shape[0], -1)

    def __call__(self, x: jnp.ndarray):
        h = self._features(x)
        return self.fc_mu(h), self.fc_var(h)

    def encode(self, x: jnp.ndarray, key=None):
        mu, logvar = self(x)
        return self.reparameterize(mu, logvar, key)

    def reparameterize(self, mu: jnp.ndarray, logvar: jnp.ndarray, key=None) -> jnp.ndarray:
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key if key is not None else jax.random.PRNGKey(0), std.shape)
        return eps * std + mu


class SPADEDecoder(nnx.Module):
    """SPADE generator branch (reference: spade_network.py:214). Channel-first public API."""

    def __init__(self, spatial_dims: int, out_channels: int, label_nc: int,
                 input_shape: Sequence[int], channels: list[int], z_dim: int | None = None,
                 is_vae: bool = True, spade_intermediate_channels: int = 128,
                 norm="INSTANCE", act=("LEAKYRELU", {"negative_slope": 0.2}),
                 last_act=("LEAKYRELU", {"negative_slope": 0.2}), kernel_size: int = 3,
                 upsampling_mode: str = "nearest", *, rngs: nnx.Rngs):
        self.is_vae = is_vae
        self.label_nc = label_nc
        self.z_dim = z_dim
        self.spatial_dims = spatial_dims
        channels = list(channels)
        self.num_channels = list(channels)
        if len(input_shape) != spatial_dims:
            raise ValueError(f"Length of input_shape must match spatial_dims; got {input_shape}")
        for s_ind, s_ in enumerate(input_shape):
            if s_ % (2 ** len(channels)) != 0:
                raise ValueError(f"Input dim {s_ind} ({s_}) not divisible by 2**depth.")
        self.latent_spatial_shape = [s_ // (2 ** len(channels)) for s_ in input_shape]
        if not is_vae:
            self.conv_init = Convolution(spatial_dims, label_nc, channels[0],
                                         kernel_size=kernel_size, rngs=rngs)
            self.fc = None
        else:
            if z_dim is None:
                raise ValueError("z_dim must be provided in VAE mode.")
            self.fc = nnx.Linear(z_dim, int(np.prod(self.latent_spatial_shape)) * channels[0],
                                 rngs=rngs)
            self.conv_init = None
        chs = channels + [out_channels]
        self.blocks = nnx.List([
            SPADENetResBlock(spatial_dims, chs[i], chs[i + 1], label_nc,
                             spade_intermediate_channels, norm, act, kernel_size, rngs=rngs)
            for i in range(len(chs) - 1)])
        self.upsampling_mode = "nearest" if upsampling_mode == "nearest" else "linear"
        self.last_conv = Convolution(spatial_dims, chs[-1], out_channels,
                                     kernel_size=kernel_size, norm=None, act=last_act,
                                     rngs=rngs)

    def _upsample(self, x: jnp.ndarray) -> jnp.ndarray:
        new_shape = (x.shape[0],) + tuple(2 * s for s in x.shape[1:-1]) + (x.shape[-1],)
        return jax.image.resize(x, new_shape, method=self.upsampling_mode)

    def __call__(self, seg: jnp.ndarray, z: jnp.ndarray | None = None, key=None) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, seg.ndim)) + (1,)
        seg_cl = jnp.transpose(seg, perm_in)
        if not self.is_vae:
            target = (seg_cl.shape[0],) + tuple(self.latent_spatial_shape) + (seg_cl.shape[-1],)
            x = jax.image.resize(seg_cl, target, method="nearest")
            x = self.conv_init(x)
        else:
            if z is None and self.z_dim is not None:
                z = jax.random.normal(key if key is not None else jax.random.PRNGKey(0),
                                      (seg.shape[0], self.z_dim))
            x = self.fc(z)
            x = x.reshape((-1, self.num_channels[0], *self.latent_spatial_shape))
            x = jnp.transpose(x, (0,) + tuple(range(2, x.ndim)) + (1,))
        for blk in self.blocks:
            x = blk(x, seg_cl)
            x = self._upsample(x)
        x = self.last_conv(x)
        return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))


class SPADENet(nnx.Module):
    """Full SPADE network (reference: spade_network.py:337).

    In VAE mode, ``__call__`` returns (generated, z_mu, z_logvar); otherwise (generated,).
    """

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, label_nc: int,
                 input_shape: Sequence[int], channels: list[int], z_dim: int | None = None,
                 is_vae: bool = True, spade_intermediate_channels: int = 128,
                 norm="INSTANCE", act=("LEAKYRELU", {"negative_slope": 0.2}),
                 last_act=("LEAKYRELU", {"negative_slope": 0.2}), kernel_size: int = 3,
                 upsampling_mode: str = "nearest", *, rngs: nnx.Rngs):
        self.is_vae = is_vae
        if is_vae and z_dim is None:
            raise ValueError("z_dim cannot be None when is_vae is True.")
        if is_vae:
            self.encoder = SPADEEncoder(spatial_dims, in_channels, z_dim, channels,
                                        input_shape, kernel_size, norm, act, rngs=rngs)
        else:
            self.encoder = None
        self.decoder = SPADEDecoder(spatial_dims, out_channels, label_nc, input_shape,
                                    list(channels), z_dim, is_vae, spade_intermediate_channels,
                                    norm, act, last_act, kernel_size, upsampling_mode,
                                    rngs=rngs)

    def __call__(self, seg: jnp.ndarray, x: jnp.ndarray | None = None, key=None):
        if self.is_vae:
            z_mu, z_logvar = self.encoder(x)
            z = self.encoder.reparameterize(z_mu, z_logvar, key)
            return self.decoder(seg, z), z_mu, z_logvar
        return (self.decoder(seg, None, key),)

    def encode(self, x: jnp.ndarray, key=None):
        return self.encoder.encode(x, key) if self.is_vae else None

    def decode(self, seg: jnp.ndarray, z: jnp.ndarray | None = None):
        return self.decoder(seg, z)


class UpsamplingModes(StrEnum):
    """Decoder upsampling interpolation modes (reference: spade_network.py:30)."""

    bicubic = "bicubic"
    nearest = "nearest"
    bilinear = "bilinear"


__all__ += ["UpsamplingModes"]
