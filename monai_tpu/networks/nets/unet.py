"""UNet (reference: monai/networks/nets/unet.py:27).

Public API accepts channel-first (B, C, *spatial) like the reference; internally the
network runs channel-last (TPU lane-friendly).  Same recursive topology: each level is
down → skip(subblock) → up, with ResidualUnits when num_res_units > 0.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.convolutions import Convolution, ResidualUnit

__all__ = ["UNet", "Unet"]


class SkipConnection(nnx.Module):
    """Concatenate input with submodule output (reference:
    monai/networks/layers/simplelayers.py:131)."""

    def __init__(self, submodule, dim: int = -1, mode: str = "cat"):
        self.submodule = submodule
        self.dim = dim
        self.mode = mode

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self.submodule(x)
        if self.mode == "cat":
            return jnp.concatenate([x, y], axis=self.dim)
        if self.mode == "add":
            return x + y
        if self.mode == "mul":
            return x * y
        raise NotImplementedError(f"Unsupported mode {self.mode}.")


class _Level(nnx.Module):
    def __init__(self, down, subblock, up):
        self.down = down
        self.skip = SkipConnection(subblock)
        self.up = up

    def __call__(self, x):
        return self.up(self.skip(self.down(x)))


class UNet(nnx.Module):
    """Residual/plain UNet (reference: nets/unet.py:27)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 channels: Sequence[int], strides: Sequence[int], kernel_size: Sequence[int] | int = 3,
                 up_kernel_size: Sequence[int] | int = 3, num_res_units: int = 0, act="PRELU",
                 norm="INSTANCE", dropout: float = 0.0, bias: bool = True, adn_ordering: str = "NDA",
                 *, rngs: nnx.Rngs):
        if len(channels) < 2:
            raise ValueError("the length of `channels` should be no less than 2.")
        delta = len(strides) - (len(channels) - 1)
        if delta < 0:
            raise ValueError("the length of `strides` should equal to `len(channels) - 1`.")
        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.channels = channels
        self.strides = strides
        self.kernel_size = kernel_size
        self.up_kernel_size = up_kernel_size
        self.num_res_units = num_res_units
        self.act = act
        self.norm = norm
        self.dropout = dropout
        self.bias = bias
        self.adn_ordering = adn_ordering

        def _get_down_layer(inc: int, outc: int, s, is_top: bool):
            if self.num_res_units > 0:
                return ResidualUnit(spatial_dims, inc, outc, strides=s, kernel_size=self.kernel_size,
                                    subunits=self.num_res_units, act=act, norm=norm, dropout=dropout,
                                    bias=bias, adn_ordering=adn_ordering, rngs=rngs)
            return Convolution(spatial_dims, inc, outc, strides=s, kernel_size=self.kernel_size,
                               act=act, norm=norm, dropout=dropout, bias=bias,
                               adn_ordering=adn_ordering, rngs=rngs)

        def _get_bottom_layer(inc: int, outc: int):
            return _get_down_layer(inc, outc, 1, False)

        def _get_up_layer(inc: int, outc: int, s, is_top: bool):
            conv = Convolution(spatial_dims, inc, outc, strides=s, kernel_size=self.up_kernel_size,
                               act=act, norm=norm, dropout=dropout, bias=bias,
                               conv_only=is_top and self.num_res_units == 0, is_transposed=True,
                               adn_ordering=adn_ordering, rngs=rngs)
            if self.num_res_units > 0:
                ru = ResidualUnit(spatial_dims, outc, outc, strides=1, kernel_size=self.kernel_size,
                                  subunits=1, act=act, norm=norm, dropout=dropout, bias=bias,
                                  last_conv_only=is_top, adn_ordering=adn_ordering, rngs=rngs)
                return _Seq([conv, ru])
            return conv

        def _create_block(inc: int, outc: int, chs: Sequence[int], strs: Sequence[int], is_top: bool):
            c = chs[0]
            s = strs[0]
            if len(chs) > 2:
                subblock = _create_block(c, c, chs[1:], strs[1:], False)
                upc = c * 2
            else:
                subblock = _get_bottom_layer(c, chs[1])
                upc = c + chs[1]
            down = _get_down_layer(inc, c, s, is_top)
            up = _get_up_layer(upc, outc, s, is_top)
            return _Level(down, subblock, up)

        self.model = _create_block(in_channels, out_channels, self.channels, self.strides, True)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # channel-first public API → channel-last internal
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x = self.model(x)
        perm_out = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm_out)


class _Seq(nnx.Module):
    def __init__(self, mods):
        self.mods = nnx.List(mods)

    def __call__(self, x):
        for m in self.mods:
            x = m(x)
        return x


Unet = UNet
