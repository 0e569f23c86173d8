"""DynUNet-style conv blocks (reference: monai/networks/blocks/dynunet_block.py and
unetr_block.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..layers.factories import Conv, get_act_layer, get_norm_layer

__all__ = ["UnetBasicBlock", "UnetResBlock", "UnetUpBlock", "UnetOutBlock",
           "UnetrBasicBlock", "UnetrUpBlock", "UnetrPrUpBlock", "get_conv_layer"]


def get_conv_layer(spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3, stride=1,
                   bias: bool = False, conv_only: bool = True, is_transposed: bool = False, *, rngs):
    ks = ensure_tuple_rep(kernel_size, spatial_dims)
    st = ensure_tuple_rep(stride, spatial_dims)
    if is_transposed:
        return Conv["convtrans", spatial_dims](in_channels, out_channels, kernel_size=st, strides=st,
                                               bias=bias, rngs=rngs)
    pad = [(k // 2, k // 2) for k in ks]
    return Conv["conv", spatial_dims](in_channels, out_channels, kernel_size=ks, strides=st,
                                      bias=bias, padding=pad, rngs=rngs)


class UnetBasicBlock(nnx.Module):
    """two conv-norm-act (reference: dynunet_block.py UnetBasicBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3,
                 stride=1, norm_name=("instance", {"affine": True}), act_name=("leakyrelu", {"negative_slope": 0.01}),
                 dropout=None, *, rngs: nnx.Rngs):
        self.conv1 = get_conv_layer(spatial_dims, in_channels, out_channels, kernel_size, stride, rngs=rngs)
        self.conv2 = get_conv_layer(spatial_dims, out_channels, out_channels, kernel_size, 1, rngs=rngs)
        self.norm1 = get_norm_layer(norm_name, spatial_dims, out_channels, rngs=rngs)
        self.norm2 = get_norm_layer(norm_name, spatial_dims, out_channels, rngs=rngs)
        self.act = get_act_layer(act_name)

    def __call__(self, x):
        x = self.act(self.norm1(self.conv1(x)))
        x = self.act(self.norm2(self.conv2(x)))
        return x


class UnetResBlock(nnx.Module):
    """residual two-conv block (reference: dynunet_block.py UnetResBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3,
                 stride=1, norm_name=("instance", {"affine": True}), act_name=("leakyrelu", {"negative_slope": 0.01}),
                 dropout=None, *, rngs: nnx.Rngs):
        self.conv1 = get_conv_layer(spatial_dims, in_channels, out_channels, kernel_size, stride, rngs=rngs)
        self.conv2 = get_conv_layer(spatial_dims, out_channels, out_channels, kernel_size, 1, rngs=rngs)
        self.norm1 = get_norm_layer(norm_name, spatial_dims, out_channels, rngs=rngs)
        self.norm2 = get_norm_layer(norm_name, spatial_dims, out_channels, rngs=rngs)
        self.act = get_act_layer(act_name)
        self.downsample = in_channels != out_channels or np.any(np.atleast_1d(stride) != 1)
        if self.downsample:
            self.conv3 = get_conv_layer(spatial_dims, in_channels, out_channels, 1, stride, rngs=rngs)
            self.norm3 = get_norm_layer(norm_name, spatial_dims, out_channels, rngs=rngs)

    def __call__(self, x):
        residual = x
        out = self.act(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        if self.downsample:
            residual = self.norm3(self.conv3(residual))
        return self.act(out + residual)


class UnetUpBlock(nnx.Module):
    """transposed-conv upsample + skip concat + basic/res block
    (reference: dynunet_block.py UnetUpBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3,
                 stride=1, upsample_kernel_size=2, norm_name=("instance", {"affine": True}),
                 act_name=("leakyrelu", {"negative_slope": 0.01}), dropout=None,
                 trans_bias: bool = False, *, rngs: nnx.Rngs):
        self.transp_conv = get_conv_layer(spatial_dims, in_channels, out_channels,
                                          stride=upsample_kernel_size, bias=trans_bias,
                                          is_transposed=True, rngs=rngs)
        self.conv_block = UnetBasicBlock(spatial_dims, out_channels * 2, out_channels, kernel_size, 1,
                                         norm_name, act_name, rngs=rngs)

    def __call__(self, inp, skip):
        out = self.transp_conv(inp)
        out = jnp.concatenate([out, skip], axis=-1)
        return self.conv_block(out)


class UnetOutBlock(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, dropout=None, *, rngs: nnx.Rngs):
        self.conv = get_conv_layer(spatial_dims, in_channels, out_channels, kernel_size=1, stride=1,
                                   bias=True, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class UnetrBasicBlock(nnx.Module):
    """UNETR encoder conv block (reference: unetr_block.py UnetrBasicBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3,
                 stride=1, norm_name=("instance", {"affine": True}), res_block: bool = True, *, rngs: nnx.Rngs):
        if res_block:
            self.layer = UnetResBlock(spatial_dims, in_channels, out_channels, kernel_size, stride,
                                      norm_name, rngs=rngs)
        else:
            self.layer = UnetBasicBlock(spatial_dims, in_channels, out_channels, kernel_size, stride,
                                        norm_name, rngs=rngs)

    def __call__(self, x):
        return self.layer(x)


class UnetrUpBlock(nnx.Module):
    """UNETR decoder block (reference: unetr_block.py UnetrUpBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, kernel_size=3,
                 upsample_kernel_size=2, norm_name=("instance", {"affine": True}), res_block: bool = True,
                 *, rngs: nnx.Rngs):
        self.transp_conv = get_conv_layer(spatial_dims, in_channels, out_channels,
                                          stride=upsample_kernel_size, is_transposed=True, rngs=rngs)
        if res_block:
            self.conv_block = UnetResBlock(spatial_dims, out_channels + out_channels, out_channels,
                                           kernel_size, 1, norm_name, rngs=rngs)
        else:
            self.conv_block = UnetBasicBlock(spatial_dims, out_channels + out_channels, out_channels,
                                             kernel_size, 1, norm_name, rngs=rngs)

    def __call__(self, inp, skip):
        out = self.transp_conv(inp)
        out = jnp.concatenate([out, skip], axis=-1)
        return self.conv_block(out)


class UnetrPrUpBlock(nnx.Module):
    """UNETR projection upsampling (reference: unetr_block.py UnetrPrUpBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, num_layer: int,
                 kernel_size=3, stride=1, upsample_kernel_size=2,
                 norm_name=("instance", {"affine": True}), conv_block: bool = False,
                 res_block: bool = False, *, rngs: nnx.Rngs):
        self.transp_conv_init = get_conv_layer(spatial_dims, in_channels, out_channels,
                                               stride=upsample_kernel_size, is_transposed=True, rngs=rngs)
        blocks = []
        for _ in range(num_layer):
            mods = [get_conv_layer(spatial_dims, out_channels, out_channels,
                                   stride=upsample_kernel_size, is_transposed=True, rngs=rngs)]
            if conv_block:
                if res_block:
                    mods.append(UnetResBlock(spatial_dims, out_channels, out_channels, kernel_size, 1,
                                             norm_name, rngs=rngs))
                else:
                    mods.append(UnetBasicBlock(spatial_dims, out_channels, out_channels, kernel_size, 1,
                                               norm_name, rngs=rngs))
            blocks.append(nnx.List(mods))
        self.blocks = nnx.List(blocks)

    def __call__(self, x):
        x = self.transp_conv_init(x)
        for mods in self.blocks:
            for m in mods:
                x = m(x)
        return x


def get_padding(kernel_size, stride):
    """SAME-style pad for the given kernel/stride (reference: dynunet_block.py:304)."""
    import numpy as np

    kernel_size_np = np.atleast_1d(kernel_size)
    stride_np = np.atleast_1d(stride)
    pad_np = (kernel_size_np - stride_np + 1) / 2
    if np.min(pad_np) < 0:
        raise AssertionError("padding value should not be negative, please change the kernel size and/or stride.")
    padding = tuple(int(p) for p in pad_np)
    return padding if len(padding) > 1 else padding[0]


def get_output_padding(kernel_size, stride, padding):
    """Transposed-conv output padding (reference: dynunet_block.py:315)."""
    import numpy as np

    kernel_size_np = np.atleast_1d(kernel_size)
    stride_np = np.atleast_1d(stride)
    padding_np = np.atleast_1d(padding)
    out_padding_np = 2 * padding_np + stride_np - kernel_size_np
    if np.min(out_padding_np) < 0:
        raise AssertionError("out_padding value should not be negative, please change the kernel size and/or stride.")
    out_padding = tuple(int(p) for p in out_padding_np)
    return out_padding if len(out_padding) > 1 else out_padding[0]
