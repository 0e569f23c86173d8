"""BasicUNet++ (reference: monai/networks/nets/basic_unetplusplus.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..layers.factories import Conv
from .basic_unet import Down, TwoConv, UpCat

__all__ = ["BasicUNetPlusPlus", "BasicUnetPlusPlus", "BasicunetPlusPlus"]


class BasicUNetPlusPlus(nnx.Module):
    """Nested-skip UNet++ (reference: basic_unetplusplus.py)."""

    def __init__(self, spatial_dims: int = 3, in_channels: int = 1, out_channels: int = 2,
                 features: Sequence[int] = (32, 32, 64, 128, 256, 32), deep_supervision: bool = False,
                 act=("LeakyReLU", {"negative_slope": 0.1}), norm=("instance", {"affine": True}),
                 bias: bool = True, dropout=0.0, upsample: str = "deconv", *, rngs: nnx.Rngs):
        self.deep_supervision = deep_supervision
        fea = ensure_tuple_rep(features, 6)
        self.conv_0_0 = TwoConv(spatial_dims, in_channels, fea[0], act, norm, bias, dropout, rngs=rngs)
        self.conv_1_0 = Down(spatial_dims, fea[0], fea[1], act, norm, bias, dropout, rngs=rngs)
        self.conv_2_0 = Down(spatial_dims, fea[1], fea[2], act, norm, bias, dropout, rngs=rngs)
        self.conv_3_0 = Down(spatial_dims, fea[2], fea[3], act, norm, bias, dropout, rngs=rngs)
        self.conv_4_0 = Down(spatial_dims, fea[3], fea[4], act, norm, bias, dropout, rngs=rngs)

        self.upcat_0_1 = UpCat(spatial_dims, fea[1], fea[0], fea[0], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)
        self.upcat_1_1 = UpCat(spatial_dims, fea[2], fea[1], fea[1], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)
        self.upcat_2_1 = UpCat(spatial_dims, fea[3], fea[2], fea[2], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)
        self.upcat_3_1 = UpCat(spatial_dims, fea[4], fea[3], fea[3], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)

        self.upcat_0_2 = UpCat(spatial_dims, fea[1], fea[0] * 2, fea[0], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)
        self.upcat_1_2 = UpCat(spatial_dims, fea[2], fea[1] * 2, fea[1], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)
        self.upcat_2_2 = UpCat(spatial_dims, fea[3], fea[2] * 2, fea[2], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)

        self.upcat_0_3 = UpCat(spatial_dims, fea[1], fea[0] * 3, fea[0], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)
        self.upcat_1_3 = UpCat(spatial_dims, fea[2], fea[1] * 3, fea[1], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)

        self.upcat_0_4 = UpCat(spatial_dims, fea[1], fea[0] * 4, fea[5], act, norm, bias, dropout,
                               upsample, halves=False, rngs=rngs)

        self.final_conv_0_1 = Conv["conv", spatial_dims](fea[0], out_channels, kernel_size=1,
                                                         padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.final_conv_0_2 = Conv["conv", spatial_dims](fea[0], out_channels, kernel_size=1,
                                                         padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.final_conv_0_3 = Conv["conv", spatial_dims](fea[0], out_channels, kernel_size=1,
                                                         padding=[(0, 0)] * spatial_dims, rngs=rngs)
        self.final_conv_0_4 = Conv["conv", spatial_dims](fea[5], out_channels, kernel_size=1,
                                                         padding=[(0, 0)] * spatial_dims, rngs=rngs)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x_0_0 = self.conv_0_0(x)
        x_1_0 = self.conv_1_0(x_0_0)
        x_0_1 = self.upcat_0_1(x_1_0, x_0_0)
        x_2_0 = self.conv_2_0(x_1_0)
        x_1_1 = self.upcat_1_1(x_2_0, x_1_0)
        x_0_2 = self.upcat_0_2(x_1_1, jnp.concatenate([x_0_0, x_0_1], axis=-1))
        x_3_0 = self.conv_3_0(x_2_0)
        x_2_1 = self.upcat_2_1(x_3_0, x_2_0)
        x_1_2 = self.upcat_1_2(x_2_1, jnp.concatenate([x_1_0, x_1_1], axis=-1))
        x_0_3 = self.upcat_0_3(x_1_2, jnp.concatenate([x_0_0, x_0_1, x_0_2], axis=-1))
        x_4_0 = self.conv_4_0(x_3_0)
        x_3_1 = self.upcat_3_1(x_4_0, x_3_0)
        x_2_2 = self.upcat_2_2(x_3_1, jnp.concatenate([x_2_0, x_2_1], axis=-1))
        x_1_3 = self.upcat_1_3(x_2_2, jnp.concatenate([x_1_0, x_1_1, x_1_2], axis=-1))
        x_0_4 = self.upcat_0_4(x_1_3, jnp.concatenate([x_0_0, x_0_1, x_0_2, x_0_3], axis=-1))

        def to_cf(t):
            return jnp.transpose(t, (0, t.ndim - 1) + tuple(range(1, t.ndim - 1)))

        out_0_4 = to_cf(self.final_conv_0_4(x_0_4))
        if self.deep_supervision:
            return [to_cf(self.final_conv_0_1(x_0_1)), to_cf(self.final_conv_0_2(x_0_2)),
                    to_cf(self.final_conv_0_3(x_0_3)), out_0_4]
        return [out_0_4]


BasicUnetPlusPlus = BasicunetPlusPlus = BasicUNetPlusPlus
