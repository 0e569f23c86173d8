"""V-Net (reference: monai/networks/nets/vnet.py)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from ..layers.factories import Conv, get_act_layer, get_norm_layer

__all__ = ["VNet"]


def _conv5(spatial_dims, in_ch, out_ch, *, rngs):
    pad = [(2, 2)] * spatial_dims
    return Conv["conv", spatial_dims](in_ch, out_ch, kernel_size=5, strides=1, padding=pad, rngs=rngs)


class LUConv(nnx.Module):
    def __init__(self, spatial_dims: int, nchan: int, act, bias: bool = False, *, rngs: nnx.Rngs):
        self.act_function = get_act_layer(act)
        self.conv_block = _conv5(spatial_dims, nchan, nchan, rngs=rngs)
        self.bn = get_norm_layer("batch", spatial_dims, nchan, rngs=rngs)

    def __call__(self, x):
        return self.act_function(self.bn(self.conv_block(x)))


def _make_nconv(spatial_dims, nchan, depth, act, bias, rngs):
    return nnx.List([LUConv(spatial_dims, nchan, act, bias, rngs=rngs) for _ in range(depth)])


class InputTransition(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, act, bias: bool = False,
                 *, rngs: nnx.Rngs):
        if out_channels % in_channels != 0:
            raise ValueError(f"out channels should be divisible by in_channels. Got in_channels={in_channels}, out_channels={out_channels}.")
        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.act_function = get_act_layer(act)
        self.conv_block = _conv5(spatial_dims, in_channels, out_channels, rngs=rngs)
        self.bn = get_norm_layer("batch", spatial_dims, out_channels, rngs=rngs)

    def __call__(self, x):
        out = self.bn(self.conv_block(x))
        repeat_num = self.out_channels // self.in_channels
        x_rep = jnp.concatenate([x] * repeat_num, axis=-1)
        return self.act_function(out + x_rep)


class DownTransition(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, n_convs: int, act,
                 dropout_prob: float | None = None, bias: bool = False, *, rngs: nnx.Rngs):
        out_channels = 2 * in_channels
        self.down_conv = Conv["conv", spatial_dims](in_channels, out_channels, kernel_size=2, strides=2,
                                                    padding="VALID", rngs=rngs)
        self.bn1 = get_norm_layer("batch", spatial_dims, out_channels, rngs=rngs)
        self.act_function1 = get_act_layer(act)
        self.act_function2 = get_act_layer(act)
        self.ops = _make_nconv(spatial_dims, out_channels, n_convs, act, bias, rngs)
        self.dropout = nnx.Dropout(dropout_prob, rngs=rngs) if dropout_prob is not None else None

    def __call__(self, x):
        down = self.act_function1(self.bn1(self.down_conv(x)))
        out = self.dropout(down) if self.dropout is not None else down
        for op in self.ops:
            out = op(out)
        return self.act_function2(out + down)


class UpTransition(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, n_convs: int, act,
                 dropout_prob=None, *, rngs: nnx.Rngs):
        self.up_conv = Conv["convtrans", spatial_dims](in_channels, out_channels // 2, kernel_size=2,
                                                       strides=2, rngs=rngs)
        self.bn1 = get_norm_layer("batch", spatial_dims, out_channels // 2, rngs=rngs)
        self.dropout = nnx.Dropout(dropout_prob, rngs=rngs) if dropout_prob is not None else None
        self.dropout2 = nnx.Dropout(0.5, rngs=rngs)
        self.act_function1 = get_act_layer(act)
        self.act_function2 = get_act_layer(act)
        self.ops = _make_nconv(spatial_dims, out_channels, n_convs, act, False, rngs)

    def __call__(self, x, skipx):
        out = self.dropout(x) if self.dropout is not None else x
        skipxdo = self.dropout2(skipx)
        out = self.act_function1(self.bn1(self.up_conv(out)))
        xcat = jnp.concatenate([out, skipxdo], axis=-1)
        out = xcat
        for op in self.ops:
            out = op(out)
        return self.act_function2(out + xcat)


class OutputTransition(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, act, bias: bool = False,
                 *, rngs: nnx.Rngs):
        self.act_function1 = get_act_layer(act)
        self.conv_block = _conv5(spatial_dims, in_channels, out_channels, rngs=rngs)
        self.bn = get_norm_layer("batch", spatial_dims, out_channels, rngs=rngs)
        self.conv2 = Conv["conv", spatial_dims](out_channels, out_channels, kernel_size=1,
                                                padding=[(0, 0)] * spatial_dims, rngs=rngs)

    def __call__(self, x):
        out = self.act_function1(self.bn(self.conv_block(x)))
        return self.conv2(out)


class VNet(nnx.Module):
    """(reference: vnet.py VNet)."""

    def __init__(self, spatial_dims: int = 3, in_channels: int = 1, out_channels: int = 1,
                 act=("elu", {"inplace": True}), dropout_prob: float = 0.5, dropout_prob_down: float = 0.5,
                 dropout_prob_up=(0.5, 0.5), dropout_dim: int = 3, bias: bool = False, *, rngs: nnx.Rngs):
        if spatial_dims not in (2, 3):
            raise AssertionError("spatial_dims can only be 2 or 3.")
        self.in_tr = InputTransition(spatial_dims, in_channels, 16, act, bias, rngs=rngs)
        self.down_tr32 = DownTransition(spatial_dims, 16, 1, act, bias=bias, rngs=rngs)
        self.down_tr64 = DownTransition(spatial_dims, 32, 2, act, bias=bias, rngs=rngs)
        self.down_tr128 = DownTransition(spatial_dims, 64, 3, act, dropout_prob_down, bias, rngs=rngs)
        self.down_tr256 = DownTransition(spatial_dims, 128, 2, act, dropout_prob_down, bias, rngs=rngs)
        self.up_tr256 = UpTransition(spatial_dims, 256, 256, 2, act, dropout_prob_up[0], rngs=rngs)
        self.up_tr128 = UpTransition(spatial_dims, 256, 128, 2, act, dropout_prob_up[1], rngs=rngs)
        self.up_tr64 = UpTransition(spatial_dims, 128, 64, 1, act, rngs=rngs)
        self.up_tr32 = UpTransition(spatial_dims, 64, 32, 1, act, rngs=rngs)
        self.out_tr = OutputTransition(spatial_dims, 32, out_channels, act, bias, rngs=rngs)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        out16 = self.in_tr(x)
        out32 = self.down_tr32(out16)
        out64 = self.down_tr64(out32)
        out128 = self.down_tr128(out64)
        out256 = self.down_tr256(out128)
        x = self.up_tr256(out256, out128)
        x = self.up_tr128(x, out64)
        x = self.up_tr64(x, out32)
        x = self.up_tr32(x, out16)
        x = self.out_tr(x)
        perm_out = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm_out)


def get_acti_layer(act, nchan: int = 0):
    """Instantiate a VNet activation by factory spec, wiring PReLU's
    num_parameters (reference: vnet.py:24)."""
    from ..layers.factories import get_act_layer

    if act == "prelu":
        act = ("prelu", {"num_parameters": nchan})
    return get_act_layer(act)
