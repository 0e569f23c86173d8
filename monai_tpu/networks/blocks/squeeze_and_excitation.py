"""Squeeze-and-excitation blocks (reference: monai/networks/blocks/squeeze_and_excitation.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.factories import Conv, get_act_layer, get_norm_layer

__all__ = ["ChannelSELayer", "ResidualSELayer", "SEBlock", "SEBottleneck", "SEResNetBottleneck",
           "SEResNeXtBottleneck"]


class ChannelSELayer(nnx.Module):
    """Channel attention (reference: squeeze_and_excitation.py ChannelSELayer)."""

    def __init__(self, spatial_dims: int, in_channels: int, r: int = 2, acti_type_1="relu",
                 acti_type_2="sigmoid", add_residual: bool = False, *, rngs: nnx.Rngs):
        self.add_residual = add_residual
        channels = int(in_channels // r)
        if channels <= 0:
            raise ValueError(f"r must be a positive number smaller than `in_channels`, got r={r}.")
        self.fc1 = nnx.Linear(in_channels, channels, rngs=rngs)
        self.fc2 = nnx.Linear(channels, in_channels, rngs=rngs)
        self.act1 = get_act_layer(acti_type_1)
        self.act2 = get_act_layer(acti_type_2)

    def __call__(self, x):
        # channel-last input
        squeezed = x.mean(axis=tuple(range(1, x.ndim - 1)))
        scale = self.act2(self.fc2(self.act1(self.fc1(squeezed))))
        scale = scale.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],))
        out = x * scale
        return out + x if self.add_residual else out


class ResidualSELayer(ChannelSELayer):
    """(reference: squeeze_and_excitation.py ResidualSELayer)."""

    def __init__(self, spatial_dims: int, in_channels: int, r: int = 2, acti_type_1="leakyrelu",
                 acti_type_2="relu", *, rngs: nnx.Rngs):
        super().__init__(spatial_dims, in_channels, r, acti_type_1, acti_type_2, add_residual=True,
                         rngs=rngs)


class SEBlock(nnx.Module):
    """conv-conv-conv + SE + residual (reference: squeeze_and_excitation.py SEBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, n_chns_1: int, n_chns_2: int, n_chns_3: int,
                 conv_param_1=None, conv_param_2=None, conv_param_3=None, project=None, r: int = 2,
                 acti_type_1="relu", acti_type_2="sigmoid", acti_type_final="relu", *, rngs: nnx.Rngs):
        from .convolutions import Convolution

        p1 = conv_param_1 or {"kernel_size": 1, "norm": "batch", "act": ("relu", {})}
        p2 = conv_param_2 or {"kernel_size": 3, "norm": "batch", "act": ("relu", {})}
        p3 = conv_param_3 or {"kernel_size": 1, "norm": "batch", "act": None}
        self.conv1 = Convolution(spatial_dims, in_channels, n_chns_1, rngs=rngs, **p1)
        self.conv2 = Convolution(spatial_dims, n_chns_1, n_chns_2, rngs=rngs, **p2)
        self.conv3 = Convolution(spatial_dims, n_chns_2, n_chns_3, rngs=rngs, **p3)
        self.se_layer = ChannelSELayer(spatial_dims, n_chns_3, r, acti_type_1, acti_type_2, rngs=rngs)
        if project is None and in_channels != n_chns_3:
            self.project = Conv["conv", spatial_dims](in_channels, n_chns_3, kernel_size=1,
                                                      padding=[(0, 0)] * spatial_dims, rngs=rngs)
        else:
            self.project = project
        self.act = get_act_layer(acti_type_final) if acti_type_final is not None else None

    def __call__(self, x):
        residual = x if self.project is None else self.project(x)
        h = self.conv3(self.conv2(self.conv1(x)))
        h = self.se_layer(h)
        h = h + residual
        return self.act(h) if self.act is not None else h


class SEBottleneck(SEBlock):
    """(reference: squeeze_and_excitation.py SEBottleneck)."""

    expansion = 4

    def __init__(self, spatial_dims: int, inplanes: int, planes: int, groups: int, reduction: int,
                 stride: int = 1, downsample=None, *, rngs: nnx.Rngs):
        p1 = {"kernel_size": 1, "norm": "batch", "act": ("relu", {}), "strides": 1, "bias": False}
        p2 = {"kernel_size": 3, "norm": "batch", "act": ("relu", {}), "strides": stride,
              "groups": groups, "bias": False}
        p3 = {"kernel_size": 1, "norm": "batch", "act": None, "bias": False}
        super().__init__(spatial_dims, inplanes, planes * 2, planes * 4, planes * 4,
                         p1, p2, p3, downsample, reduction, rngs=rngs)


class SEResNetBottleneck(SEBlock):
    expansion = 4

    def __init__(self, spatial_dims: int, inplanes: int, planes: int, groups: int, reduction: int,
                 stride: int = 1, downsample=None, *, rngs: nnx.Rngs):
        p1 = {"kernel_size": 1, "norm": "batch", "act": ("relu", {}), "strides": stride, "bias": False}
        p2 = {"kernel_size": 3, "norm": "batch", "act": ("relu", {}), "groups": groups, "bias": False}
        p3 = {"kernel_size": 1, "norm": "batch", "act": None, "bias": False}
        super().__init__(spatial_dims, inplanes, planes, planes, planes * 4, p1, p2, p3,
                         downsample, reduction, rngs=rngs)


class SEResNeXtBottleneck(SEBlock):
    expansion = 4

    def __init__(self, spatial_dims: int, inplanes: int, planes: int, groups: int, reduction: int,
                 stride: int = 1, downsample=None, base_width: int = 4, *, rngs: nnx.Rngs):
        width = int(planes * (base_width / 64)) * groups
        p1 = {"kernel_size": 1, "norm": "batch", "act": ("relu", {}), "bias": False}
        p2 = {"kernel_size": 3, "norm": "batch", "act": ("relu", {}), "strides": stride,
              "groups": groups, "bias": False}
        p3 = {"kernel_size": 1, "norm": "batch", "act": None, "bias": False}
        super().__init__(spatial_dims, inplanes, width, width, planes * 4, p1, p2, p3,
                         downsample, reduction, rngs=rngs)
