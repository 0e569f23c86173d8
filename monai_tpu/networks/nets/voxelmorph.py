"""VoxelMorph registration network (reference: monai/networks/nets/voxelmorph.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution
from ..blocks.warp import DVF2DDF, Warp
from .unet import UNet

__all__ = ["VoxelMorphUNet", "VoxelMorph"]


class VoxelMorphUNet(nnx.Module):
    """UNet backbone emitting a displacement field (reference: voxelmorph.py VoxelMorphUNet)."""

    def __init__(self, spatial_dims: int, in_channels: int, unet_out_channels: int,
                 channels: Sequence[int], final_conv_channels: Sequence[int],
                 final_conv_act="LEAKYRELU", kernel_size=3, up_kernel_size=3, act="LEAKYRELU",
                 norm=None, dropout: float = 0.0, bias: bool = True, use_maxpool: bool = True,
                 adn_ordering: str = "NDA", *, rngs: nnx.Rngs):
        self.unet = UNet(spatial_dims, in_channels, unet_out_channels,
                         channels=channels, strides=(2,) * (max(len(channels) - 1, 1)),
                         kernel_size=kernel_size, up_kernel_size=up_kernel_size, num_res_units=0,
                         act=act, norm=norm or "INSTANCE", dropout=dropout, bias=bias,
                         adn_ordering=adn_ordering, rngs=rngs)
        convs = []
        prev = unet_out_channels
        for c in final_conv_channels:
            convs.append(Convolution(spatial_dims, prev, c, act=final_conv_act, norm=None,
                                     dropout=dropout, bias=bias, rngs=rngs))
            prev = c
        convs.append(Convolution(spatial_dims, prev, spatial_dims, act=None, norm=None, bias=bias,
                                 conv_only=True, rngs=rngs))
        self.final_convs = nnx.List(convs)
        self.spatial_dims = spatial_dims

    def __call__(self, concatenated_pairs: jnp.ndarray) -> jnp.ndarray:
        x = self.unet(concatenated_pairs)
        # final convs operate channel-last
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        for c in self.final_convs:
            x = c(x)
        perm_out = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm_out)


class VoxelMorph(nnx.Module):
    """Pairwise registration framework (reference: voxelmorph.py VoxelMorph)."""

    def __init__(self, backbone: VoxelMorphUNet | None = None, integration_steps: int = 7,
                 half_res: bool = False, spatial_dims: int = 3, *, rngs: nnx.Rngs):
        self.backbone = backbone if backbone is not None else VoxelMorphUNet(
            spatial_dims=spatial_dims, in_channels=2, unet_out_channels=32,
            channels=(16, 32, 32, 32), final_conv_channels=(16, 16), rngs=rngs)
        self.diffeomorphic = integration_steps > 0
        if self.diffeomorphic:
            self.dvf2ddf = DVF2DDF(num_steps=integration_steps)
        self.warp = Warp()

    def __call__(self, moving: jnp.ndarray, fixed: jnp.ndarray):
        concat = jnp.concatenate([moving, fixed], axis=1)
        dvf = self.backbone(concat)
        ddf = self.dvf2ddf(dvf) if self.diffeomorphic else dvf
        warped = self.warp(moving, ddf)
        return warped, ddf
