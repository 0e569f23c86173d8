"""ResNet 10-200 for 2D/3D (reference: monai/networks/nets/resnet.py)."""
from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import partial

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..layers.factories import Conv, Pool, get_act_layer, get_norm_layer

__all__ = ["ResNet", "ResNetBlock", "ResNetBottleneck", "resnet10", "resnet18", "resnet34",
           "resnet50", "resnet101", "resnet152", "resnet200"]


def _conv(spatial_dims, in_planes, out_planes, kernel_size=3, stride=1, bias=False, *, rngs):
    ks = ensure_tuple_rep(kernel_size, spatial_dims)
    pad = [(k // 2, k // 2) for k in ks]
    return Conv["conv", spatial_dims](in_planes, out_planes, kernel_size=ks, strides=stride, bias=bias,
                                      padding=pad, rngs=rngs)


class ResNetBlock(nnx.Module):
    expansion = 1

    def __init__(self, in_planes: int, planes: int, spatial_dims: int = 3, stride: int = 1,
                 downsample=None, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        self.conv1 = _conv(spatial_dims, in_planes, planes, 3, stride, rngs=rngs)
        self.bn1 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.act = get_act_layer(act)
        self.conv2 = _conv(spatial_dims, planes, planes, 3, 1, rngs=rngs)
        self.bn2 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x):
        residual = x
        out = self.act(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.act(out + residual)


class ResNetBottleneck(nnx.Module):
    expansion = 4

    def __init__(self, in_planes: int, planes: int, spatial_dims: int = 3, stride: int = 1,
                 downsample=None, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        self.conv1 = _conv(spatial_dims, in_planes, planes, 1, 1, rngs=rngs)
        self.bn1 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.conv2 = _conv(spatial_dims, planes, planes, 3, stride, rngs=rngs)
        self.bn2 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.conv3 = _conv(spatial_dims, planes, planes * self.expansion, 1, 1, rngs=rngs)
        self.bn3 = get_norm_layer(norm, spatial_dims, planes * self.expansion, rngs=rngs)
        self.act = get_act_layer(act)
        self.downsample = downsample

    def __call__(self, x):
        residual = x
        out = self.act(self.bn1(self.conv1(x)))
        out = self.act(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.act(out + residual)


class _Downsample(nnx.Module):
    def __init__(self, spatial_dims, in_planes, planes, stride, norm, *, rngs):
        self.conv = _conv(spatial_dims, in_planes, planes, 1, stride, rngs=rngs)
        self.bn = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)

    def __call__(self, x):
        return self.bn(self.conv(x))


class ResNet(nnx.Module):
    """(reference: resnet.py ResNet)."""

    def __init__(self, block, layers: Sequence[int], block_inplanes: Sequence[int],
                 spatial_dims: int = 3, n_input_channels: int = 3, conv1_t_size: int = 7,
                 conv1_t_stride: int = 1, no_max_pool: bool = False, shortcut_type: str = "B",
                 widen_factor: float = 1.0, num_classes: int = 400, feed_forward: bool = True,
                 bias_downsample: bool = True, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        if isinstance(block, str):
            block = ResNetBlock if block == "basic" else ResNetBottleneck
        block_inplanes = [int(x * widen_factor) for x in block_inplanes]
        self.in_planes = block_inplanes[0]
        self.no_max_pool = no_max_pool
        self.spatial_dims = spatial_dims
        conv1_ks = ensure_tuple_rep(conv1_t_size, spatial_dims)
        self.conv1 = Conv["conv", spatial_dims](n_input_channels, self.in_planes, kernel_size=conv1_ks,
                                                strides=conv1_t_stride if spatial_dims == 2 else
                                                ensure_tuple_rep(conv1_t_stride, spatial_dims),
                                                bias=False, padding=[(k // 2, k // 2) for k in conv1_ks],
                                                rngs=rngs)
        self.bn1 = get_norm_layer(norm, spatial_dims, self.in_planes, rngs=rngs)
        self.act = get_act_layer(act)
        self.maxpool = Pool["max", spatial_dims](kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, block_inplanes[0], layers[0], spatial_dims, 1, norm, act, rngs)
        self.layer2 = self._make_layer(block, block_inplanes[1], layers[1], spatial_dims, 2, norm, act, rngs)
        self.layer3 = self._make_layer(block, block_inplanes[2], layers[2], spatial_dims, 2, norm, act, rngs)
        self.layer4 = self._make_layer(block, block_inplanes[3], layers[3], spatial_dims, 2, norm, act, rngs)
        self.fc = nnx.Linear(block_inplanes[3] * block.expansion, num_classes, rngs=rngs) if feed_forward else None

    def _make_layer(self, block, planes, blocks, spatial_dims, stride, norm, act, rngs):
        downsample = None
        if stride != 1 or self.in_planes != planes * block.expansion:
            downsample = _Downsample(spatial_dims, self.in_planes, planes * block.expansion, stride,
                                     norm, rngs=rngs)
        layers = [block(self.in_planes, planes, spatial_dims, stride, downsample, act, norm, rngs=rngs)]
        self.in_planes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.in_planes, planes, spatial_dims, act=act, norm=norm, rngs=rngs))
        return nnx.List(layers)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x = self.act(self.bn1(self.conv1(x)))
        if not self.no_max_pool:
            x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            for blk in layer:
                x = blk(x)
        x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        if self.fc is not None:
            x = self.fc(x)
        return x


def _resnet(block, layers, block_inplanes, **kwargs):
    return ResNet(block, layers, block_inplanes, **kwargs)


def resnet10(**kwargs):
    return _resnet(ResNetBlock, [1, 1, 1, 1], [64, 128, 256, 512], **kwargs)


def resnet18(**kwargs):
    return _resnet(ResNetBlock, [2, 2, 2, 2], [64, 128, 256, 512], **kwargs)


def resnet34(**kwargs):
    return _resnet(ResNetBlock, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)


def resnet50(**kwargs):
    return _resnet(ResNetBottleneck, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)


def resnet101(**kwargs):
    return _resnet(ResNetBottleneck, [3, 4, 23, 3], [64, 128, 256, 512], **kwargs)


def resnet152(**kwargs):
    return _resnet(ResNetBottleneck, [3, 8, 36, 3], [64, 128, 256, 512], **kwargs)


def resnet200(**kwargs):
    return _resnet(ResNetBottleneck, [3, 24, 36, 3], [64, 128, 256, 512], **kwargs)
