"""DiNTS building blocks (reference: monai/networks/blocks/dints_block.py:22
FactorizedIncreaseBlock, :72 FactorizedReduceBlock, :139 P3DActiConvNormBlock,
:224 ActiConvNormBlock). Channel-last internals."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.factories import get_act_layer, get_norm_layer

__all__ = ["ActiConvNormBlock", "FactorizedIncreaseBlock", "FactorizedReduceBlock",
           "P3DActiConvNormBlock"]

_INSTANCE = ("INSTANCE", {"affine": True})


class ActiConvNormBlock(nnx.Module):
    """act -> conv -> norm (reference: dints_block.py:224)."""

    def __init__(self, in_channel: int, out_channel: int, kernel_size: int = 3,
                 padding: int = 1, spatial_dims: int = 3, act_name="RELU",
                 norm_name=_INSTANCE, *, rngs: nnx.Rngs):
        self.act = get_act_layer(act_name)
        self.conv = nnx.Conv(in_channel, out_channel, kernel_size=(kernel_size,) * spatial_dims,
                             padding=(padding,) * spatial_dims, use_bias=False, rngs=rngs)
        self.norm = get_norm_layer(norm_name, spatial_dims, out_channel, rngs=rngs)

    def __call__(self, x):
        return self.norm(self.conv(self.act(x)))


class FactorizedIncreaseBlock(nnx.Module):
    """2x upsample -> act -> 1x1 conv -> norm (reference: dints_block.py:22)."""

    def __init__(self, in_channel: int, out_channel: int, spatial_dims: int = 3,
                 act_name="RELU", norm_name=_INSTANCE, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.act = get_act_layer(act_name)
        self.conv = nnx.Conv(in_channel, out_channel, kernel_size=(1,) * spatial_dims,
                             use_bias=False, rngs=rngs)
        self.norm = get_norm_layer(norm_name, spatial_dims, out_channel, rngs=rngs)

    def __call__(self, x):
        new_shape = (x.shape[0],) + tuple(2 * s for s in x.shape[1:-1]) + (x.shape[-1],)
        method = "trilinear" if self.spatial_dims == 3 else "bilinear"
        up = jax.image.resize(x, new_shape, method=method)
        return self.norm(self.conv(self.act(up)))


class FactorizedReduceBlock(nnx.Module):
    """2x downsample via two offset stride-2 1x1 convs (reference: dints_block.py:72)."""

    def __init__(self, in_channel: int, out_channel: int, spatial_dims: int = 3,
                 act_name="RELU", norm_name=_INSTANCE, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.act = get_act_layer(act_name)
        self.conv_1 = nnx.Conv(in_channel, out_channel // 2, kernel_size=(1,) * spatial_dims,
                               strides=(2,) * spatial_dims, padding="VALID", use_bias=False,
                               rngs=rngs)
        self.conv_2 = nnx.Conv(in_channel, out_channel - out_channel // 2,
                               kernel_size=(1,) * spatial_dims, strides=(2,) * spatial_dims,
                               padding="VALID", use_bias=False, rngs=rngs)
        self.norm = get_norm_layer(norm_name, spatial_dims, out_channel, rngs=rngs)

    def __call__(self, x):
        h = self.act(x)
        shifted = h[:, 1:, 1:, 1:, :] if self.spatial_dims == 3 else h[:, 1:, 1:, :]
        out = jnp.concatenate([self.conv_1(h), self.conv_2(shifted)], axis=-1)
        return self.norm(out)


class P3DActiConvNormBlock(nnx.Module):
    """Pseudo-3D factorized conv: act -> conv(k,k,1) -> conv(1,1,k) -> norm
    (reference: dints_block.py:139). p3dmode selects which axis gets the 1-kernel."""

    def __init__(self, in_channel: int, out_channel: int, kernel_size: int = 3,
                 padding: int = 1, p3dmode: int = 0, act_name="RELU",
                 norm_name=_INSTANCE, *, rngs: nnx.Rngs):
        k, p = kernel_size, padding
        if p3dmode == 0:    # (k, k, 1) then (1, 1, k)
            k0, k1 = (k, k, 1), (1, 1, k)
            p0, p1 = (p, p, 0), (0, 0, p)
        elif p3dmode == 1:  # (k, 1, k) then (1, k, 1)
            k0, k1 = (k, 1, k), (1, k, 1)
            p0, p1 = (p, 0, p), (0, p, 0)
        elif p3dmode == 2:  # (1, k, k) then (k, 1, 1)
            k0, k1 = (1, k, k), (k, 1, 1)
            p0, p1 = (0, p, p), (p, 0, 0)
        else:
            raise ValueError("p3dmode must be 0, 1, or 2.")
        self.act = get_act_layer(act_name)
        self.conv = nnx.Conv(in_channel, out_channel, kernel_size=k0, padding=p0,
                             use_bias=False, rngs=rngs)
        self.conv_1 = nnx.Conv(out_channel, out_channel, kernel_size=k1, padding=p1,
                               use_bias=False, rngs=rngs)
        self.norm = get_norm_layer(norm_name, 3, out_channel, rngs=rngs)

    def __call__(self, x):
        return self.norm(self.conv_1(self.conv(self.act(x))))
