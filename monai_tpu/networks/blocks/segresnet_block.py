"""SegResNet building blocks (reference: monai/networks/blocks/segresnet_block.py:30).

``ResBlock`` itself lives with the SegResNet net (nets/segresnet.py); this module
re-exports it plus the conv/upsample helpers for API parity."""
from __future__ import annotations

from flax import nnx

from ..nets.segresnet import ResBlock
from .upsample import UpSample

__all__ = ["ResBlock", "get_conv_layer", "get_upsample_layer"]


def get_conv_layer(spatial_dims: int, in_channels: int, out_channels: int,
                   kernel_size: int = 3, stride: int = 1, bias: bool = False,
                   *, rngs: nnx.Rngs):
    """3x3 (or given) conv with same padding (reference: segresnet_block.py:21)."""
    from .convolutions import Convolution

    return Convolution(spatial_dims, in_channels, out_channels, strides=stride,
                       kernel_size=kernel_size, bias=bias, conv_only=True, rngs=rngs)


def get_upsample_layer(spatial_dims: int, in_channels: int,
                       upsample_mode: str = "nontrainable", scale_factor: int = 2,
                       *, rngs: nnx.Rngs | None = None):
    """UpSample preset used by SegResNet (reference: segresnet_block.py:30)."""
    return UpSample(spatial_dims=spatial_dims, in_channels=in_channels,
                    out_channels=in_channels, scale_factor=scale_factor,
                    mode=upsample_mode, interp_mode="linear", align_corners=False,
                    rngs=rngs)
