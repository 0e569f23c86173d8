"""QuickNAT: 2D dense encoder-decoder for neuroanatomy segmentation
(reference: monai/networks/nets/quicknat.py:280 Quicknat, :104 ConvConcatDenseBlock).

TPU-native max-pool/max-unpool: with non-overlapping 2x2 windows the pool is a reshape
+ max and the "indices" are a one-hot in-window argmax mask, so unpooling is a
broadcast-multiply — no scatter, fully fusible by XLA.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution
from ..blocks.squeeze_and_excitation import ChannelSELayer

__all__ = ["Quicknat", "QuickNAT"]


def _max_pool_with_mask(x: jnp.ndarray):
    """2x2/stride-2 max pool (ceil mode) on channel-last x; returns (pooled, argmax mask)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % 2, (-w) % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    hh, ww = x.shape[1] // 2, x.shape[2] // 2
    win = x.reshape(b, hh, 2, ww, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, 4, c)
    pooled = win.max(axis=3)
    onehot = jax.nn.one_hot(jnp.argmax(win, axis=3), 4, axis=3, dtype=x.dtype)
    return pooled, (onehot, (h, w))


def _max_unpool(x: jnp.ndarray, mask) -> jnp.ndarray:
    """Place pooled values back at their argmax positions (channel-last)."""
    onehot, (h, w) = mask
    b, hh, ww, c = x.shape
    win = x[:, :, :, None, :] * onehot  # (B, hh, ww, 4, C)
    out = win.reshape(b, hh, ww, 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 2, ww * 2, c)
    return out[:, :h, :w, :]


class _SpatialSELayer(nnx.Module):
    """Spatial squeeze-excite (SSE): 1x1 conv to a single sigmoid gate map."""

    def __init__(self, in_channels: int, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(in_channels, 1, kernel_size=(1, 1), rngs=rngs)

    def __call__(self, x):
        return x * jax.nn.sigmoid(self.conv(x))


class _CSSELayer(nnx.Module):
    """Concurrent channel+spatial SE (CSSE)."""

    def __init__(self, in_channels: int, *, rngs: nnx.Rngs):
        self.cse = ChannelSELayer(2, in_channels, r=2, rngs=rngs)
        self.sse = _SpatialSELayer(in_channels, rngs=rngs)

    def __call__(self, x):
        return jnp.maximum(self.cse(x), self.sse(x))


class ConvConcatDenseBlock(nnx.Module):
    """Three convs with dense concatenation (reference: quicknat.py:104). Channel-last."""

    def __init__(self, in_channels: int, se_block: str = "None", dropout: float = 0.0,
                 kernel_size: int = 5, num_filters: int = 64,
                 act=("prelu", {}), norm="instance", *, rngs: nnx.Rngs):
        k = kernel_size
        self.conv1 = Convolution(2, in_channels, num_filters, kernel_size=k, act=act,
                                 norm=norm, adn_ordering="NA", rngs=rngs)
        self.conv2 = Convolution(2, in_channels + num_filters, num_filters, kernel_size=k,
                                 act=act, norm=norm, adn_ordering="NA", rngs=rngs)
        self.conv3 = Convolution(2, in_channels + 2 * num_filters, num_filters, kernel_size=1,
                                 act=act, norm=norm, adn_ordering="NA", rngs=rngs)
        se = se_block.upper() if isinstance(se_block, str) else "NONE"
        if se == "CSE":
            self.se_layer = ChannelSELayer(2, num_filters, r=2, rngs=rngs)
        elif se == "SSE":
            self.se_layer = _SpatialSELayer(num_filters, rngs=rngs)
        elif se == "CSSE":
            self.se_layer = _CSSELayer(num_filters, rngs=rngs)
        else:
            self.se_layer = None
        self.dropout = nnx.Dropout(rate=dropout, rngs=rngs) if dropout > 0 else None

    def __call__(self, x):
        o1 = self.conv1(x)
        o2 = self.conv2(jnp.concatenate([x, o1], axis=-1))
        o3 = self.conv3(jnp.concatenate([o1, o2, x], axis=-1))
        if self.se_layer is not None:
            o3 = self.se_layer(o3)
        if self.dropout is not None:
            o3 = self.dropout(o3)
        return o3


class Quicknat(nnx.Module):
    """(reference: quicknat.py:280). 4 encoders/decoders around a bottleneck, with
    max-pool indices carried across to the matching max-unpool."""

    def __init__(self, num_classes: int = 33, num_channels: int = 1, num_filters: int = 64,
                 kernel_size: int = 5, kernel_c: int = 1, stride_conv: int = 1, pool: int = 2,
                 stride_pool: int = 2, se_block: str = "None", drop_out: float = 0.0,
                 act=("prelu", {}), norm="instance", adn_ordering: str = "NA",
                 *, rngs: nnx.Rngs):
        common = dict(se_block=se_block, dropout=drop_out, kernel_size=kernel_size,
                      num_filters=num_filters, act=act, norm=norm, rngs=rngs)
        f = num_filters
        self.enc1 = ConvConcatDenseBlock(num_channels, **common)
        self.enc2 = ConvConcatDenseBlock(f, **common)
        self.enc3 = ConvConcatDenseBlock(f, **common)
        self.enc4 = ConvConcatDenseBlock(f, **common)
        self.bottleneck = ConvConcatDenseBlock(f, **common)
        self.dec4 = ConvConcatDenseBlock(2 * f, **common)
        self.dec3 = ConvConcatDenseBlock(2 * f, **common)
        self.dec2 = ConvConcatDenseBlock(2 * f, **common)
        self.dec1 = ConvConcatDenseBlock(2 * f, **common)
        self.classifier = nnx.Conv(f, num_classes, kernel_size=(kernel_c, kernel_c),
                                   strides=(stride_conv, stride_conv), rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.transpose(x, (0, 2, 3, 1))
        x1 = self.enc1(h)
        p2, m2 = _max_pool_with_mask(x1)
        x2 = self.enc2(p2)
        p3, m3 = _max_pool_with_mask(x2)
        x3 = self.enc3(p3)
        p4, m4 = _max_pool_with_mask(x3)
        x4 = self.enc4(p4)
        pb, mb = _max_pool_with_mask(x4)
        b = _max_unpool(self.bottleneck(pb), mb)
        u4 = _max_unpool(self.dec4(jnp.concatenate([x4, b], axis=-1)), m4)
        u3 = _max_unpool(self.dec3(jnp.concatenate([x3, u4], axis=-1)), m3)
        u2 = _max_unpool(self.dec2(jnp.concatenate([x2, u3], axis=-1)), m2)
        u1 = self.dec1(jnp.concatenate([x1, u2], axis=-1))
        logits = self.classifier(u1)
        return jnp.transpose(logits, (0, 3, 1, 2))


QuickNAT = Quicknat


class Bottleneck(ConvConcatDenseBlock):
    """Encoder/decoder linking dense block (reference: quicknat.py:252 Bottleneck)."""

    def __init__(self, in_channels: int, se_layer=None, dropout=None, un_pool=None,
                 max_pool=None, **kwargs):
        kwargs.setdefault("se_block", "None")
        super().__init__(in_channels, **kwargs)
        self.max_pool = max_pool
        self.un_pool = un_pool

    def __call__(self, x, indices=None):
        if self.max_pool is not None:
            x, indices = _max_pool_with_mask(x)
        out = super().__call__(x)
        if self.un_pool is not None and indices is not None:
            out = _max_unpool(out, indices)
        return out, indices


class ClassifierBlock(nnx.Module):
    """1x1 conv classifier head without top activation (reference: quicknat.py:66)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 strides: int = 1, kernel_size: int = 1, act=None, adn_ordering="A",
                 *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(in_channels, out_channels,
                             kernel_size=(kernel_size,) * spatial_dims,
                             strides=(strides,) * spatial_dims, rngs=rngs)

    def __call__(self, x, indices=None):
        return self.conv(x), None


class SequentialWithIdx(nnx.Module):
    """Sequential container threading (x, indices) through members
    (reference: quicknat.py:49 SequentialWithIdx)."""

    def __init__(self, *mods):
        self.mods = nnx.List(list(mods))

    def __call__(self, x, indices=None):
        for m in self.mods:
            x, indices = m(x, indices)
        return x, indices


class SkipConnectionWithIdx(nnx.Module):
    """Skip connection (cat/add/mul) whose submodule threads pooling indices
    (reference: quicknat.py:35 SkipConnectionWithIdx)."""

    def __init__(self, submodule, dim: int = -1, mode: str = "cat"):
        self.submodule = submodule
        self.dim = dim
        self.mode = mode

    def __call__(self, x, indices=None):
        y, indices = self.submodule(x, indices)
        if self.mode == "cat":
            return jnp.concatenate([x, y], axis=self.dim), indices
        if self.mode == "add":
            return x + y, indices
        if self.mode == "mul":
            return x * y, indices
        raise ValueError(f"unsupported mode {self.mode}")


__all__ += ["Bottleneck", "ClassifierBlock", "SequentialWithIdx", "SkipConnectionWithIdx"]
