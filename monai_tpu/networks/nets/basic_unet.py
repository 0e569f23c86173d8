"""BasicUNet (reference: monai/networks/nets/basic_unet.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.convolutions import Convolution
from ..blocks.upsample import UpSample
from ..layers.factories import Pool

__all__ = ["BasicUNet", "BasicUnet", "Basicunet"]


class TwoConv(nnx.Module):
    """two conv-norm-act units (reference: basic_unet.py:28)."""

    def __init__(self, spatial_dims: int, in_chns: int, out_chns: int, act, norm, bias: bool,
                 dropout=0.0, *, rngs: nnx.Rngs):
        self.conv_0 = Convolution(spatial_dims, in_chns, out_chns, act=act, norm=norm, dropout=dropout,
                                  bias=bias, padding=1, adn_ordering="NDA", rngs=rngs)
        self.conv_1 = Convolution(spatial_dims, out_chns, out_chns, act=act, norm=norm, dropout=dropout,
                                  bias=bias, padding=1, adn_ordering="NDA", rngs=rngs)

    def __call__(self, x):
        return self.conv_1(self.conv_0(x))


class Down(nnx.Module):
    """maxpool + two convs (reference: basic_unet.py:69)."""

    def __init__(self, spatial_dims: int, in_chns: int, out_chns: int, act, norm, bias: bool,
                 dropout=0.0, *, rngs: nnx.Rngs):
        self.max_pool = Pool["max", spatial_dims](kernel_size=2)
        self.convs = TwoConv(spatial_dims, in_chns, out_chns, act, norm, bias, dropout, rngs=rngs)

    def __call__(self, x):
        return self.convs(self.max_pool(x))


class UpCat(nnx.Module):
    """upsample + concat skip + two convs (reference: basic_unet.py:104)."""

    def __init__(self, spatial_dims: int, in_chns: int, cat_chns: int, out_chns: int, act, norm,
                 bias: bool, dropout=0.0, upsample: str = "deconv", pre_conv="default",
                 interp_mode: str = "linear", align_corners: bool = True, halves: bool = True,
                 is_pad: bool = True, *, rngs: nnx.Rngs):
        up_chns = in_chns // 2 if halves and upsample != "nontrainable" else in_chns
        self.upsample = UpSample(spatial_dims, in_chns, up_chns, 2, mode=upsample, pre_conv=pre_conv,
                                 interp_mode=interp_mode, align_corners=align_corners, rngs=rngs)
        self.convs = TwoConv(spatial_dims, cat_chns + up_chns, out_chns, act, norm, bias, dropout,
                             rngs=rngs)
        self.is_pad = is_pad

    def __call__(self, x, x_e=None):
        x_0 = self.upsample(x)
        if x_e is not None:
            if self.is_pad:
                # pad if odd spatial shapes
                pads = [(0, 0)]
                for d in range(1, x_e.ndim - 1):
                    pads.append((0, max(0, x_e.shape[d] - x_0.shape[d])))
                pads.append((0, 0))
                if any(p[1] > 0 for p in pads):
                    x_0 = jnp.pad(x_0, pads)
            x = self.convs(jnp.concatenate([x_e, x_0], axis=-1))
        else:
            x = self.convs(x_0)
        return x


class BasicUNet(nnx.Module):
    """5-level UNet with fixed topology (reference: basic_unet.py:—)."""

    def __init__(self, spatial_dims: int = 3, in_channels: int = 1, out_channels: int = 2,
                 features: Sequence[int] = (32, 32, 64, 128, 256, 32),
                 act=("LeakyReLU", {"negative_slope": 0.1}), norm=("instance", {"affine": True}),
                 bias: bool = True, dropout=0.0, upsample: str = "deconv", *, rngs: nnx.Rngs):
        fea = ensure_tuple_rep(features, 6)
        self.conv_0 = TwoConv(spatial_dims, in_channels, fea[0], act, norm, bias, dropout, rngs=rngs)
        self.down_1 = Down(spatial_dims, fea[0], fea[1], act, norm, bias, dropout, rngs=rngs)
        self.down_2 = Down(spatial_dims, fea[1], fea[2], act, norm, bias, dropout, rngs=rngs)
        self.down_3 = Down(spatial_dims, fea[2], fea[3], act, norm, bias, dropout, rngs=rngs)
        self.down_4 = Down(spatial_dims, fea[3], fea[4], act, norm, bias, dropout, rngs=rngs)
        self.upcat_4 = UpCat(spatial_dims, fea[4], fea[3], fea[3], act, norm, bias, dropout, upsample, rngs=rngs)
        self.upcat_3 = UpCat(spatial_dims, fea[3], fea[2], fea[2], act, norm, bias, dropout, upsample, rngs=rngs)
        self.upcat_2 = UpCat(spatial_dims, fea[2], fea[1], fea[1], act, norm, bias, dropout, upsample, rngs=rngs)
        self.upcat_1 = UpCat(spatial_dims, fea[1], fea[0], fea[5], act, norm, bias, dropout, upsample,
                             halves=False, rngs=rngs)
        from ..layers.factories import Conv

        self.final_conv = Conv["conv", spatial_dims](fea[5], out_channels, kernel_size=1,
                                                     padding=[(0, 0)] * spatial_dims, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x0 = self.conv_0(x)
        x1 = self.down_1(x0)
        x2 = self.down_2(x1)
        x3 = self.down_3(x2)
        x4 = self.down_4(x3)
        u4 = self.upcat_4(x4, x3)
        u3 = self.upcat_3(u4, x2)
        u2 = self.upcat_2(u3, x1)
        u1 = self.upcat_1(u2, x0)
        logits = self.final_conv(u1)
        perm_out = (0, logits.ndim - 1) + tuple(range(1, logits.ndim - 1))
        return jnp.transpose(logits, perm_out)


BasicUnet = Basicunet = BasicUNet
