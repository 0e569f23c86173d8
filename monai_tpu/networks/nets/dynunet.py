"""DynUNet — nnU-Net style dynamic UNet (reference: monai/networks/nets/dynunet.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..blocks.dynunet_block import UnetBasicBlock, UnetOutBlock, UnetResBlock, UnetUpBlock

__all__ = ["DynUNet"]


class DynUNet(nnx.Module):
    """(reference: dynunet.py DynUNet).

    Deep supervision returns a stacked (B, n_heads+1, C, *spatial) like the reference
    when ``deep_supervision=True`` (heads upsampled to full size).
    """

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 kernel_size: Sequence, strides: Sequence, upsample_kernel_size: Sequence,
                 filters: Sequence[int] | None = None, dropout=None,
                 norm_name=("INSTANCE", {"affine": True}), act_name=("leakyrelu", {"negative_slope": 0.01}),
                 deep_supervision: bool = False, deep_supr_num: int = 1, res_block: bool = False,
                 trans_bias: bool = False, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.kernel_size = kernel_size
        self.strides = strides
        self.upsample_kernel_size = upsample_kernel_size
        self.deep_supervision = deep_supervision
        self.deep_supr_num = deep_supr_num
        if filters is None:
            filters = [min(2 ** (5 + i), 320 if spatial_dims == 3 else 512) for i in range(len(strides))]
        self.filters = filters
        block = UnetResBlock if res_block else UnetBasicBlock

        self.input_block = block(spatial_dims, in_channels, filters[0], kernel_size[0], strides[0],
                                 norm_name, act_name, rngs=rngs)
        downs = []
        for i in range(1, len(strides) - 1):
            downs.append(block(spatial_dims, filters[i - 1], filters[i], kernel_size[i], strides[i],
                               norm_name, act_name, rngs=rngs))
        self.downsamples = nnx.List(downs)
        self.bottleneck = block(spatial_dims, filters[-2], filters[-1], kernel_size[-1], strides[-1],
                                norm_name, act_name, rngs=rngs)
        ups = []
        n_up = len(strides) - 1
        for i in range(n_up):
            # from deepest: in filters[-1-i], out filters[-2-i]
            ups.append(UnetUpBlock(spatial_dims, filters[-1 - i], filters[-2 - i],
                                   kernel_size[-2 - i], strides[-1 - i], upsample_kernel_size[-1 - i],
                                   norm_name, act_name, trans_bias=trans_bias, rngs=rngs))
        self.upsamples = nnx.List(ups)
        self.output_block = UnetOutBlock(spatial_dims, filters[0], out_channels, rngs=rngs)
        if deep_supervision:
            # head i reads decoder output ds_feats[-2-i], which has filters[i+1] channels
            self.deep_supervision_heads = nnx.List([
                UnetOutBlock(spatial_dims, filters[i + 1], out_channels, rngs=rngs)
                for i in range(deep_supr_num)
            ])

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        skips = []
        x = self.input_block(x)
        skips.append(x)
        for d in self.downsamples:
            x = d(x)
            skips.append(x)
        x = self.bottleneck(x)
        ds_feats = []
        for i, up in enumerate(self.upsamples):
            x = up(x, skips[-1 - i])
            ds_feats.append(x)
        out = self.output_block(x)
        perm_out = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
        out_cf = jnp.transpose(out, perm_out)
        if self.deep_supervision:
            import jax

            heads = []
            # heads over intermediate decoder outputs (excluding the final one)
            for i, head in enumerate(self.deep_supervision_heads):
                feat = ds_feats[-2 - i]
                h = head(feat)
                h_cf = jnp.transpose(h, (0, h.ndim - 1) + tuple(range(1, h.ndim - 1)))
                h_cf = jax.image.resize(h_cf, out_cf.shape, method="nearest")
                heads.append(h_cf)
            return jnp.stack([out_cf] + heads, axis=1)
        return out_cf


class DynUNetSkipLayer(nnx.Module):
    """Recursive skip-topology layer: downsample -> next_layer -> upsample with skip,
    optionally writing a deep-supervision head into the shared ``heads`` list
    (reference: dynunet.py:25 DynUNetSkipLayer; the torchscript-recursion rationale
    there does not apply to JAX, DynUNet above uses a plain loop — this class serves
    users assembling custom topologies)."""

    def __init__(self, index, downsample, upsample, next_layer, heads=None, super_head=None):
        self.downsample = downsample
        self.next_layer = next_layer
        self.upsample = upsample
        self.super_head = super_head
        self.heads = heads
        self.index = index

    def __call__(self, x):
        downout = self.downsample(x)
        nextout = self.next_layer(downout)
        upout = self.upsample(nextout, downout)
        if self.super_head is not None and self.heads is not None and self.index > 0:
            self.heads[self.index - 1] = self.super_head(upout)
        return upout


__all__ += ["DynUNetSkipLayer"]
