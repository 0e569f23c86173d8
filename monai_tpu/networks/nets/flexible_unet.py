"""FlexibleUNet: swappable-backbone UNet (reference: monai/networks/nets/flexible_unet.py:219).

Backbones: efficientnet-b0..l2 (TPU-native EfficientNet encoder) or resnet10..resnet50
feature extractors. Channel-last internals; channel-first public API.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ..layers.factories import Conv
from .basic_unet import UpCat
from .efficientnet import EfficientNetEncoder, efficientnet_params

__all__ = ["FlexibleUNet", "FlexUNet", "FLEXUNET_BACKBONE", "FlexUNetEncoderRegister"]


class _BackboneRegistry:
    """Registry mapping backbone names to encoder constructors
    (reference: flexible_unet.py:33 FlexUNetEncoderRegister)."""

    def __init__(self):
        self.register_dict: dict = {}

    def register_class(self, cls):
        names = cls.get_encoder_names()
        params = cls.get_encoder_parameters()
        channels = cls.num_channels_per_output()
        counts = cls.num_outputs()
        for name, par, chans, cnt in zip(names, params, channels, counts):
            self.register_dict[name] = {
                "type": cls, "feature_number": cnt, "feature_channel": chans, "parameter": par,
            }


FLEXUNET_BACKBONE = _BackboneRegistry()
FLEXUNET_BACKBONE.register_class(EfficientNetEncoder)

from .resnet import ResNetEncoder  # noqa: E402  (after registry creation: avoids cycle)

FLEXUNET_BACKBONE.register_class(ResNetEncoder)

FlexUNetEncoderRegister = _BackboneRegistry  # reference class name (flexible_unet.py:33)


class UNetDecoder(nnx.Module):
    """Stack of UpCat blocks walking back up the feature pyramid
    (reference: flexible_unet.py:85)."""

    def __init__(self, spatial_dims: int, encoder_channels: Sequence[int],
                 decoder_channels: Sequence[int], act, norm, dropout, bias: bool,
                 upsample: str, pre_conv, interp_mode: str, align_corners,
                 is_pad: bool, *, rngs: nnx.Rngs):
        if len(encoder_channels) < 2:
            raise ValueError("the length of `encoder_channels` should be no less than 2.")
        if len(decoder_channels) != len(encoder_channels) - 1:
            raise ValueError("`len(decoder_channels)` should equal to `len(encoder_channels) - 1`.")
        in_channels = [encoder_channels[-1]] + list(decoder_channels[:-1])
        skip_channels = list(encoder_channels[1:-1][::-1]) + [0]
        halves = [True] * (len(skip_channels) - 1) + [False]
        self.blocks = nnx.List([
            UpCat(spatial_dims, in_c, skip_c, out_c, act, norm, bias, dropout, upsample,
                  pre_conv, interp_mode, align_corners=True if align_corners is None else align_corners,
                  halves=halve, is_pad=is_pad, rngs=rngs)
            for in_c, skip_c, out_c, halve in zip(in_channels, skip_channels, decoder_channels, halves)
        ])

    def __call__(self, features: list[jnp.ndarray], skip_connect: int = 4) -> jnp.ndarray:
        skips = features[:-1][::-1]
        feats = features[1:][::-1]
        x = feats[0]
        for i, block in enumerate(self.blocks):
            skip = skips[i] if i < skip_connect else None
            x = block(x, skip)
        return x


class SegmentationHead(nnx.Module):
    """conv(k3) [+ upsample] [+ act] (reference: flexible_unet.py:175)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 kernel_size: int = 3, act=None, scale_factor: float = 1.0, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(in_channels, out_channels, kernel_size=(kernel_size,) * spatial_dims,
                             padding="SAME", rngs=rngs)
        self.scale_factor = scale_factor
        self.spatial_dims = spatial_dims
        from ..layers.factories import get_act_layer

        self.act = get_act_layer(act) if act is not None else None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv(x)
        if self.scale_factor > 1.0:
            import jax.image

            f = int(self.scale_factor)
            new_shape = (x.shape[0],) + tuple(int(s * f) for s in x.shape[1:-1]) + (x.shape[-1],)
            x = jax.image.resize(x, new_shape, method="nearest")
        if self.act is not None:
            x = self.act(x)
        return x


class FlexibleUNet(nnx.Module):
    """UNet with a pluggable encoder backbone (reference: flexible_unet.py:219).

    The input spatial size must be a multiple of 32 (5 encoder levels), unless
    ``is_pad`` padding makes odd sizes line up.
    """

    def __init__(self, in_channels: int, out_channels: int, backbone: str,
                 pretrained: bool = False, decoder_channels: tuple = (256, 128, 64, 32, 16),
                 spatial_dims: int = 2, norm=("batch", {"eps": 1e-3, "momentum": 0.1}),
                 act=("relu", {}), dropout=0.0, decoder_bias: bool = False,
                 upsample: str = "nontrainable", pre_conv: str = "default",
                 interp_mode: str = "nearest", is_pad: bool = True, *, rngs: nnx.Rngs):
        if backbone not in FLEXUNET_BACKBONE.register_dict:
            raise ValueError(f"invalid model_name {backbone} found, must be one of "
                             f"{list(FLEXUNET_BACKBONE.register_dict)}.")
        if spatial_dims not in (2, 3):
            raise ValueError("spatial_dims can only be 2 or 3.")
        encoder = FLEXUNET_BACKBONE.register_dict[backbone]
        self.backbone = backbone
        self.spatial_dims = spatial_dims
        params = dict(encoder["parameter"])
        params.update({"spatial_dims": spatial_dims, "in_channels": in_channels,
                       "pretrained": pretrained})
        encoder_feature_num = encoder["feature_number"]
        if encoder_feature_num > 5:
            raise ValueError("Flexible unet can only accept no more than 5 encoder feature maps.")
        decoder_channels = tuple(decoder_channels)[:encoder_feature_num]
        self.skip_connect = encoder_feature_num - 1
        encoder_channels = tuple([in_channels] + list(encoder["feature_channel"]))
        self.encoder = encoder["type"](**params, rngs=rngs)
        self.decoder = UNetDecoder(spatial_dims, encoder_channels, decoder_channels, act, norm,
                                   dropout, decoder_bias, upsample, pre_conv, interp_mode,
                                   None, is_pad, rngs=rngs)
        self.segmentation_head = SegmentationHead(spatial_dims, decoder_channels[-1],
                                                  out_channels, kernel_size=3, act=None,
                                                  scale_factor=1.0, rngs=rngs)

    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, inputs.ndim)) + (1,)
        x = jnp.transpose(inputs, perm_in)
        feats = self.encoder._features(x)  # channel-last multi-scale features
        out = self.decoder(feats, self.skip_connect)
        out = self.segmentation_head(out)
        perm_out = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
        return jnp.transpose(out, perm_out)


FlexUNet = FlexibleUNet
