"""DenseNet-121/169/201/264 (reference: monai/networks/nets/densenet.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ..layers.factories import Conv, Pool, get_act_layer, get_norm_layer

__all__ = ["DenseNet", "DenseNet121", "DenseNet169", "DenseNet201", "DenseNet264",
           "densenet121", "densenet169", "densenet201", "densenet264"]


class _DenseLayer(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, growth_rate: int, bn_size: int,
                 dropout_prob: float, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        mid = bn_size * growth_rate
        self.norm1 = get_norm_layer(norm, spatial_dims, in_channels, rngs=rngs)
        self.act1 = get_act_layer(act)
        self.conv1 = Conv["conv", spatial_dims](in_channels, mid, kernel_size=1, bias=False,
                                                padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.norm2 = get_norm_layer(norm, spatial_dims, mid, rngs=rngs)
        self.act2 = get_act_layer(act)
        self.conv2 = Conv["conv", spatial_dims](mid, growth_rate, kernel_size=3, bias=False, rngs=rngs)
        self.dropout = nnx.Dropout(rate=dropout_prob, rngs=rngs) if dropout_prob > 0 else None

    def __call__(self, x):
        y = self.conv1(self.act1(self.norm1(x)))
        y = self.conv2(self.act2(self.norm2(y)))
        if self.dropout is not None:
            y = self.dropout(y)
        return jnp.concatenate([x, y], axis=-1)


class _DenseBlock(nnx.Module):
    def __init__(self, spatial_dims: int, layers: int, in_channels: int, bn_size: int,
                 growth_rate: int, dropout_prob: float, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        layer_list = []
        for i in range(layers):
            layer_list.append(_DenseLayer(spatial_dims, in_channels, growth_rate, bn_size,
                                          dropout_prob, act, norm, rngs=rngs))
            in_channels += growth_rate
        self.layers = nnx.List(layer_list)
        self.out_channels = in_channels

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class _Transition(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, act=("relu", {}),
                 norm="batch", *, rngs: nnx.Rngs):
        self.norm = get_norm_layer(norm, spatial_dims, in_channels, rngs=rngs)
        self.act = get_act_layer(act)
        self.conv = Conv["conv", spatial_dims](in_channels, out_channels, kernel_size=1, bias=False,
                                               padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.pool = Pool["avg", spatial_dims](kernel_size=2, stride=2)

    def __call__(self, x):
        return self.pool(self.conv(self.act(self.norm(x))))


class DenseNet(nnx.Module):
    """DenseNet backbone + classifier (reference: densenet.py:—)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 init_features: int = 64, growth_rate: int = 32,
                 block_config: Sequence[int] = (6, 12, 24, 16), bn_size: int = 4,
                 act=("relu", {}), norm="batch", dropout_prob: float = 0.0, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.conv0 = Conv["conv", spatial_dims](in_channels, init_features, kernel_size=7, strides=2,
                                                bias=False, padding=[(3, 3)] * spatial_dims, rngs=rngs)
        self.norm0 = get_norm_layer(norm, spatial_dims, init_features, rngs=rngs)
        self.act0 = get_act_layer(act)
        self.pool0 = Pool["max", spatial_dims](kernel_size=3, stride=2, padding=1)
        in_ch = init_features
        blocks = []
        for i, num_layers in enumerate(block_config):
            block = _DenseBlock(spatial_dims, num_layers, in_ch, bn_size, growth_rate, dropout_prob,
                                act, norm, rngs=rngs)
            blocks.append(block)
            in_ch = block.out_channels
            if i == len(block_config) - 1:
                blocks.append(get_norm_layer(norm, spatial_dims, in_ch, rngs=rngs))
            else:
                out_ch = in_ch // 2
                blocks.append(_Transition(spatial_dims, in_ch, out_ch, act, norm, rngs=rngs))
                in_ch = out_ch
        self.blocks = nnx.List(blocks)
        self.final_act = get_act_layer(act)
        self.classifier = nnx.Linear(in_ch, out_channels, rngs=rngs)

    def forward_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """Headless feature map (channel-first), e.g. for NetAdapter head swaps
        (the reference DenseNet exposes its `features` Sequential the same way)."""
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x = self.pool0(self.act0(self.norm0(self.conv0(x))))
        for block in self.blocks:
            x = block(x)
        x = self.final_act(x)
        return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.forward_features(x)
        h = jnp.mean(h, axis=tuple(range(2, h.ndim)))  # global average pool
        return self.classifier(h)


def DenseNet121(spatial_dims: int, in_channels: int, out_channels: int, *, rngs: nnx.Rngs, **kwargs):
    return DenseNet(spatial_dims, in_channels, out_channels, init_features=64, growth_rate=32,
                    block_config=(6, 12, 24, 16), rngs=rngs, **kwargs)


def DenseNet169(spatial_dims: int, in_channels: int, out_channels: int, *, rngs: nnx.Rngs, **kwargs):
    return DenseNet(spatial_dims, in_channels, out_channels, init_features=64, growth_rate=32,
                    block_config=(6, 12, 32, 32), rngs=rngs, **kwargs)


def DenseNet201(spatial_dims: int, in_channels: int, out_channels: int, *, rngs: nnx.Rngs, **kwargs):
    return DenseNet(spatial_dims, in_channels, out_channels, init_features=64, growth_rate=32,
                    block_config=(6, 12, 48, 32), rngs=rngs, **kwargs)


def DenseNet264(spatial_dims: int, in_channels: int, out_channels: int, *, rngs: nnx.Rngs, **kwargs):
    return DenseNet(spatial_dims, in_channels, out_channels, init_features=64, growth_rate=32,
                    block_config=(6, 12, 64, 48), rngs=rngs, **kwargs)


densenet121 = DenseNet121
densenet169 = DenseNet169
densenet201 = DenseNet201
densenet264 = DenseNet264
