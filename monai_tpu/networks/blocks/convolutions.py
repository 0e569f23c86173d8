"""Convolution + ResidualUnit blocks (reference: monai/networks/blocks/convolutions.py:25,174).

NNX modules, channel-last internal layout.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..layers.factories import Conv, get_act_layer, get_dropout_layer, get_norm_layer

__all__ = ["Convolution", "ResidualUnit", "same_padding", "stride_minus_kernel_padding"]


def same_padding(kernel_size, dilation=1):
    kernel_size_np = np.atleast_1d(kernel_size)
    dilation_np = np.atleast_1d(dilation)
    if np.any((kernel_size_np - 1) * dilation % 2 == 1):
        raise NotImplementedError(
            f"Same padding not available for kernel_size={kernel_size_np} and dilation={dilation_np}.")
    padding_np = (kernel_size_np - 1) / 2 * dilation_np
    return tuple(int(p) for p in padding_np) if len(padding_np) > 1 else int(padding_np[0])


def stride_minus_kernel_padding(kernel_size, stride):
    kernel_size_np = np.atleast_1d(kernel_size)
    stride_np = np.atleast_1d(stride)
    out_padding_np = stride_np - kernel_size_np
    return tuple(int(p) for p in out_padding_np) if len(out_padding_np) > 1 else int(out_padding_np[0])


class Convolution(nnx.Module):
    """conv/norm/act (+dropout) unit, optionally transposed
    (reference: blocks/convolutions.py:25)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 strides: Sequence[int] | int = 1, kernel_size: Sequence[int] | int = 3,
                 adn_ordering: str = "NDA", act: tuple | str | None = "PRELU",
                 norm: tuple | str | None = "INSTANCE", dropout: float | None = None,
                 dropout_dim: int = 1, dilation: Sequence[int] | int = 1, groups: int = 1,
                 bias: bool = True, conv_only: bool = False, is_transposed: bool = False,
                 padding: Sequence[int] | int | None = None, output_padding=None, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.is_transposed = is_transposed
        if padding is None:
            padding = same_padding(kernel_size, dilation)
        conv_type = Conv[Conv.CONVTRANS if is_transposed else Conv.CONV, spatial_dims]
        if is_transposed:
            # reference semantics (blocks/convolutions.py:25): torch ConvTranspose with
            # padding p and output_padding op = s + 2p - k. The lax.conv_transpose
            # equivalent pads the zero-dilated input with (k-1-p, k-1-p+op) per dim.
            ks = ensure_tuple_rep(kernel_size, spatial_dims)
            st = ensure_tuple_rep(strides, spatial_dims)
            pd = ensure_tuple_rep(padding, spatial_dims)
            if output_padding is None:
                op = tuple(s + 2 * p - k for s, p, k in zip(st, pd, ks))
            else:
                op = ensure_tuple_rep(output_padding, spatial_dims)
            explicit = [(k - 1 - p, k - 1 - p + o) for k, p, o in zip(ks, pd, op)]
            self.conv = conv_type(in_channels, out_channels, kernel_size=kernel_size, strides=strides,
                                  bias=bias, padding=explicit, rngs=rngs)
        else:
            self.conv = conv_type(in_channels, out_channels, kernel_size=kernel_size, strides=strides,
                                  dilation=dilation, groups=groups, bias=bias,
                                  padding=[(p, p) for p in ensure_tuple_rep(padding, spatial_dims)],
                                  rngs=rngs)
        self.conv_only = conv_only
        if conv_only:
            self.adn = None
            return
        ops = []
        for item in adn_ordering.upper():
            if item == "A" and act is not None:
                ops.append(get_act_layer(act))
            elif item == "N" and norm is not None:
                ops.append(get_norm_layer(norm, spatial_dims, out_channels, rngs=rngs))
            elif item == "D" and dropout is not None:
                ops.append(get_dropout_layer(dropout, dropout_dim, rngs=rngs))
        self.adn = nnx.List(ops)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv(x)
        if self.adn:
            for op in self.adn:
                x = op(x)
        return x


class ResidualUnit(nnx.Module):
    """Residual conv block (reference: blocks/convolutions.py:174)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 strides: Sequence[int] | int = 1, kernel_size: Sequence[int] | int = 3,
                 subunits: int = 2, adn_ordering: str = "NDA", act="PRELU", norm="INSTANCE",
                 dropout=None, dropout_dim: int = 1, dilation=1, bias: bool = True,
                 last_conv_only: bool = False, padding=None, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        if padding is None:
            padding = same_padding(kernel_size, dilation)
        subunits = max(1, subunits)
        convs = []
        schannels = in_channels
        sstrides = strides
        for su in range(subunits):
            conv_only = last_conv_only and su == (subunits - 1)
            convs.append(Convolution(spatial_dims, schannels, out_channels, strides=sstrides,
                                          kernel_size=kernel_size, adn_ordering=adn_ordering, act=act,
                                          norm=norm, dropout=dropout, dropout_dim=dropout_dim,
                                          dilation=dilation, bias=bias, conv_only=conv_only,
                                          padding=padding, rngs=rngs))
            schannels = out_channels
            sstrides = 1
        self.convs = nnx.List(convs)
        need_res_conv = np.any(np.atleast_1d(strides) != 1) or in_channels != out_channels
        if need_res_conv:
            rkernel_size = kernel_size
            rpadding = padding
            if np.all(np.atleast_1d(strides) == 1):
                rkernel_size, rpadding = 1, 0
            conv_type = Conv[Conv.CONV, spatial_dims]
            self.residual = conv_type(in_channels, out_channels, kernel_size=rkernel_size,
                                      strides=strides, bias=bias,
                                      padding=[(p, p) for p in ensure_tuple_rep(rpadding, spatial_dims)],
                                      rngs=rngs)
        else:
            self.residual = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = self.residual(x) if self.residual is not None else x
        cx = x
        for conv in self.convs:
            cx = conv(cx)
        return cx + res
