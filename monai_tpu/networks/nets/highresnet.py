"""HighResNet (reference: monai/networks/nets/highresnet.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution
from ..layers.factories import get_act_layer, get_norm_layer
from ..layers.simplelayers import ChannelPad

__all__ = ["HighResBlock", "HighResNet"]

DEFAULT_LAYER_PARAMS_3D = (
    {"name": "conv_0", "n_features": 16, "kernel_size": 3},
    {"name": "res_1", "n_features": 16, "kernels": (3, 3), "repeat": 3},
    {"name": "res_2", "n_features": 32, "kernels": (3, 3), "repeat": 3},
    {"name": "res_3", "n_features": 64, "kernels": (3, 3), "repeat": 3},
    {"name": "conv_1", "n_features": 80, "kernel_size": 1},
    {"name": "conv_2", "kernel_size": 1},
)


class HighResBlock(nnx.Module):
    """Dilated residual block (reference: highresnet.py HighResBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 kernels: Sequence[int] = (3, 3), dilation: Sequence[int] | int = 1,
                 norm_type=("batch", {"affine": True}), acti_type=("relu", {}),
                 bias: bool = False, channel_matching: str = "pad", *, rngs: nnx.Rngs):
        self.chn_pad = ChannelPad(spatial_dims, in_channels, out_channels, mode=channel_matching,
                                  rngs=rngs)
        layers = []
        _in = in_channels
        for k in kernels:
            layers.append(get_norm_layer(norm_type, spatial_dims, _in, rngs=rngs))
            layers.append(get_act_layer(acti_type))
            layers.append(Convolution(spatial_dims, _in, out_channels, kernel_size=k,
                                      dilation=dilation, bias=bias, conv_only=True, rngs=rngs))
            _in = out_channels
        self.layers = nnx.List(layers)

    def __call__(self, x):
        h = x
        for layer in self.layers:
            h = layer(h)
        return h + self.chn_pad(x)


class HighResNet(nnx.Module):
    """(reference: highresnet.py HighResNet)."""

    def __init__(self, spatial_dims: int = 3, in_channels: int = 1, out_channels: int = 1,
                 norm_type=("batch", {"affine": True}), acti_type=("relu", {}),
                 dropout_prob: float | None = 0.0, bias: bool = False,
                 layer_params: Sequence[dict] = DEFAULT_LAYER_PARAMS_3D,
                 channel_matching: str = "pad", *, rngs: nnx.Rngs):
        blocks = []
        params = layer_params[0]
        _in_chns, _out_chns = in_channels, params["n_features"]
        blocks.append(Convolution(spatial_dims, _in_chns, _out_chns, kernel_size=params["kernel_size"],
                                  act=acti_type, norm=norm_type, bias=bias, adn_ordering="NA", rngs=rngs))
        for idx, params in enumerate(layer_params[1:-2]):
            _in_chns, _out_chns = _out_chns, params["n_features"]
            _dilation = 2**idx
            for _ in range(params["repeat"]):
                blocks.append(HighResBlock(spatial_dims, _in_chns, _out_chns, params["kernels"],
                                           dilation=_dilation, norm_type=norm_type, acti_type=acti_type,
                                           bias=bias, channel_matching=channel_matching, rngs=rngs))
                _in_chns = _out_chns
        params = layer_params[-2]
        _in_chns, _out_chns = _out_chns, params["n_features"]
        blocks.append(Convolution(spatial_dims, _in_chns, _out_chns, kernel_size=params["kernel_size"],
                                  act=acti_type, norm=norm_type, dropout=dropout_prob, bias=bias,
                                  adn_ordering="NAD", rngs=rngs))
        params = layer_params[-1]
        _in_chns = _out_chns
        blocks.append(Convolution(spatial_dims, _in_chns, out_channels, kernel_size=params["kernel_size"],
                                  act=None, norm=norm_type, bias=bias, adn_ordering="N", rngs=rngs))
        self.blocks = nnx.List(blocks)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        for blk in self.blocks:
            h = blk(h)
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(h, perm_out)
