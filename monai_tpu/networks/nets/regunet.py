"""Registration networks: RegUNet / GlobalNet / LocalNet
(reference: monai/networks/nets/regunet.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..blocks.convolutions import Convolution
from ..blocks.upsample import interpolate
from ..layers.factories import Conv

__all__ = ["RegUNet", "GlobalNet", "LocalNet"]


class _ConvBlock(nnx.Module):
    def __init__(self, spatial_dims, in_ch, out_ch, *, rngs):
        self.conv1 = Convolution(spatial_dims, in_ch, out_ch, act="RELU", norm="BATCH", rngs=rngs)
        self.conv2 = Convolution(spatial_dims, out_ch, out_ch, act="RELU", norm="BATCH", rngs=rngs)

    def __call__(self, x):
        return self.conv2(self.conv1(x))


class RegUNet(nnx.Module):
    """UNet-style registration backbone emitting a DDF (reference: regunet.py RegUNet)."""

    def __init__(self, spatial_dims: int, in_channels: int, num_channel_initial: int, depth: int,
                 out_kernel_initializer: str = "kaiming_uniform", out_activation=None,
                 out_channels: int = 3, extract_levels: Sequence[int] | None = None,
                 pooling: bool = True, concat_skip: bool = False, encode_kernel_sizes=3,
                 *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.depth = depth
        self.out_channels = out_channels
        chans = [num_channel_initial * 2**i for i in range(depth + 1)]
        downs = []
        ch = in_channels
        for d in range(depth + 1):
            downs.append(_ConvBlock(spatial_dims, ch, chans[d], rngs=rngs))
            ch = chans[d]
        self.downs = nnx.List(downs)
        ups = []
        for d in reversed(range(depth)):
            ups.append(nnx.List([
                Conv["convtrans", spatial_dims](chans[d + 1], chans[d], kernel_size=2, strides=2,
                                                rngs=rngs),
                _ConvBlock(spatial_dims, chans[d] * 2, chans[d], rngs=rngs),
            ]))
        self.ups = nnx.List(ups)
        self.out_conv = Conv["conv", spatial_dims](chans[0], out_channels, kernel_size=3, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        skips = []
        for i, down in enumerate(self.downs):
            h = down(h)
            if i < self.depth:
                skips.append(h)
                window = (1,) + (2,) * self.spatial_dims + (1,)
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, window, window, "VALID")
        for i, up in enumerate(self.ups):
            mods = list(up)
            h = mods[0](h)
            skip = skips[-(i + 1)]
            h = mods[1](jnp.concatenate([h, skip], axis=-1))
        out = self.out_conv(h)
        perm_out = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
        return jnp.transpose(out, perm_out)


class GlobalNet(nnx.Module):
    """Affine-parameter registration net → DDF (reference: regunet.py GlobalNet)."""

    def __init__(self, image_size: Sequence[int], spatial_dims: int, in_channels: int,
                 num_channel_initial: int, depth: int, out_kernel_initializer="kaiming_uniform",
                 out_activation=None, pooling: bool = True, concat_skip: bool = False,
                 encode_kernel_sizes=3, *, rngs: nnx.Rngs):
        self.image_size = tuple(image_size)
        self.spatial_dims = spatial_dims
        chans = [num_channel_initial * 2**i for i in range(depth + 1)]
        downs = []
        ch = in_channels
        for d in range(depth + 1):
            downs.append(_ConvBlock(spatial_dims, ch, chans[d], rngs=rngs))
            ch = chans[d]
        self.downs = nnx.List(downs)
        self.depth = depth
        n_params = spatial_dims * (spatial_dims + 1)
        feat_size = int(np.prod([s // 2**depth for s in image_size])) * chans[-1]
        # initialize to the identity transform
        self.fc = nnx.Linear(feat_size, n_params,
                             kernel_init=nnx.initializers.zeros_init(),
                             bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                                 np.eye(spatial_dims, spatial_dims + 1).reshape(-1), dtype=dtype),
                             rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        for i, down in enumerate(self.downs):
            h = down(h)
            if i < self.depth:
                window = (1,) + (2,) * self.spatial_dims + (1,)
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, window, window, "VALID")
        theta = self.fc(h.reshape(h.shape[0], -1))
        theta = theta.reshape(-1, self.spatial_dims, self.spatial_dims + 1)
        # dense displacement from affine: ddf = (A - I) @ coords + t
        coords = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                          for s in self.image_size], indexing="ij"), axis=0)
        flat = coords.reshape(self.spatial_dims, -1)

        def _one(th):
            A = th[:, : self.spatial_dims] - jnp.eye(self.spatial_dims)
            t = th[:, self.spatial_dims]
            return (A @ flat + t[:, None]).reshape((self.spatial_dims,) + self.image_size)

        return jax.vmap(_one)(theta)


class LocalNet(RegUNet):
    """Multi-resolution extraction registration net (reference: regunet.py LocalNet)."""

    def __init__(self, spatial_dims: int, in_channels: int, num_channel_initial: int,
                 extract_levels: Sequence[int] = (0,), out_kernel_initializer="kaiming_uniform",
                 out_activation=None, out_channels: int = 3, pooling: bool = True,
                 use_additive_sampling: bool = True, concat_skip: bool = False, mode: str = "nearest",
                 align_corners=None, *, rngs: nnx.Rngs):
        depth = max(extract_levels)
        super().__init__(spatial_dims=spatial_dims, in_channels=in_channels,
                         num_channel_initial=num_channel_initial, depth=depth,
                         out_channels=out_channels, rngs=rngs)


class AffineHead(nnx.Module):
    """Affine-parameter head: flatten encoder features -> linear (identity-initialised)
    -> theta -> dense displacement field over ``image_size``
    (reference: regunet.py:236 AffineHead)."""

    def __init__(self, spatial_dims: int, image_size, decode_size, in_channels: int,
                 save_theta: bool = False, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.image_size = tuple(image_size)
        n_params = spatial_dims * (spatial_dims + 1)
        feat = int(np.prod(decode_size)) * in_channels
        self.fc = nnx.Linear(feat, n_params,
                             kernel_init=nnx.initializers.zeros_init(),
                             bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                                 np.eye(spatial_dims, spatial_dims + 1).reshape(-1), dtype=dtype),
                             rngs=rngs)
        self.save_theta = save_theta
        self.theta = None

    def __call__(self, x, image_size=None):
        if isinstance(x, (list, tuple)):
            x = x[0]
        size = tuple(image_size) if image_size is not None else self.image_size
        theta = self.fc(x.reshape(x.shape[0], -1)).reshape(-1, self.spatial_dims,
                                                           self.spatial_dims + 1)
        if self.save_theta:
            self.theta = theta
        coords = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in size],
                                        indexing="ij"), axis=0)
        flat = coords.reshape(self.spatial_dims, -1)

        def _one(th):
            A = th[:, : self.spatial_dims] - jnp.eye(self.spatial_dims)
            t = th[:, self.spatial_dims]
            return (A @ flat + t[:, None]).reshape((self.spatial_dims,) + size)

        return jax.vmap(_one)(theta)


class AdditiveUpSampleBlock(nnx.Module):
    """Deconv + resized-input additive skip: output = deconv(x) + mean of the
    channel-halved interpolated input (reference: regunet.py:378). Channel-last."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 mode: str = "nearest", align_corners=None, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.deconv = Conv["convtrans", spatial_dims](in_channels, out_channels,
                                                      kernel_size=2, strides=2, rngs=rngs)

    def __call__(self, x):
        up = self.deconv(x)
        out_sp = up.shape[1:-1]
        resized = x
        for ax, s in enumerate(out_sp, start=1):
            resized = jnp.repeat(resized, 2, axis=ax)[(slice(None),) * ax + (slice(0, s),)]
        b = resized.shape[0]
        c = resized.shape[-1]
        halved = resized.reshape(resized.shape[:-1] + (2, c // 2)).mean(axis=-2)
        return up + halved


__all__ += ["AffineHead", "AdditiveUpSampleBlock"]
