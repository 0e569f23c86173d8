"""MAISI diffusion UNet (reference:
monai/apps/generation/maisi/networks/diffusion_model_unet_maisi.py:53
DiffusionModelUNetMaisi).

Extends DiffusionModelUNet with body-region and voxel-spacing conditioning embeddings
added to the timestep embedding.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from .....networks.nets.diffusion_model_unet import DiffusionModelUNet

__all__ = ["DiffusionModelUNetMaisi"]


class _EmbedMLP(nnx.Module):
    """linear -> SiLU -> linear (reference: diffusion_model_unet_maisi.py:306)."""

    def __init__(self, input_dim: int, embed_dim: int, *, rngs: nnx.Rngs):
        self.lin1 = nnx.Linear(input_dim, embed_dim, rngs=rngs)
        self.lin2 = nnx.Linear(embed_dim, embed_dim, rngs=rngs)

    def __call__(self, x):
        return self.lin2(jax.nn.silu(self.lin1(x)))


class DiffusionModelUNetMaisi(DiffusionModelUNet):
    """(reference: diffusion_model_unet_maisi.py:53)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 resblock_updown: bool = False, num_head_channels=8,
                 with_conditioning: bool = False, transformer_num_layers: int = 1,
                 cross_attention_dim: int | None = None, num_class_embeds: int | None = None,
                 upcast_attention: bool = False, include_fc: bool = False,
                 use_combined_linear: bool = False, use_flash_attention: bool = False,
                 dropout_cattn: float = 0.0,
                 include_top_region_index_input: bool = False,
                 include_bottom_region_index_input: bool = False,
                 include_spacing_input: bool = False, *, rngs: nnx.Rngs):
        super().__init__(spatial_dims, in_channels, out_channels, num_res_blocks, channels,
                         attention_levels, norm_num_groups, norm_eps, resblock_updown,
                         num_head_channels, with_conditioning, transformer_num_layers,
                         cross_attention_dim, num_class_embeds, upcast_attention,
                         dropout_cattn, rngs=rngs)
        time_embed_dim = channels[0] * 4
        self.include_top_region_index_input = include_top_region_index_input
        self.include_bottom_region_index_input = include_bottom_region_index_input
        self.include_spacing_input = include_spacing_input
        if include_top_region_index_input:
            self.top_region_index_layer = _EmbedMLP(4, time_embed_dim, rngs=rngs)
        if include_bottom_region_index_input:
            self.bottom_region_index_layer = _EmbedMLP(4, time_embed_dim, rngs=rngs)
        if include_spacing_input:
            self.spacing_layer = _EmbedMLP(3, time_embed_dim, rngs=rngs)

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray, context=None,
                 class_labels=None, down_block_additional_residuals=None,
                 mid_block_additional_residual=None, top_region_index_tensor=None,
                 bottom_region_index_tensor=None, spacing_tensor=None):
        from .....networks.nets.diffusion_model_unet import get_timestep_embedding

        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        t_emb = get_timestep_embedding(jnp.atleast_1d(timesteps), self.base_channels)
        temb = self.time_embed(t_emb)
        if self.num_class_embeds is not None and class_labels is not None:
            temb = temb + self.class_embedding(class_labels)
        if self.include_top_region_index_input and top_region_index_tensor is not None:
            temb = temb + self.top_region_index_layer(top_region_index_tensor)
        if self.include_bottom_region_index_input and bottom_region_index_tensor is not None:
            temb = temb + self.bottom_region_index_layer(bottom_region_index_tensor)
        if self.include_spacing_input and spacing_tensor is not None:
            temb = temb + self.spacing_layer(spacing_tensor)

        from .....networks.nets.diffusion_model_unet import _AttnBlock, _ResBlock

        h = self.conv_in(h)
        skips = [h]
        for blocks in self.down_blocks:
            for blk in blocks:
                if isinstance(blk, _ResBlock):
                    h = blk(h, temb)
                    skips.append(h)
                elif isinstance(blk, _AttnBlock):
                    h = blk(h, context)
                    skips[-1] = h
                else:
                    h = blk(h)
                    skips.append(h)
        if down_block_additional_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_additional_residuals)]
        h = self.mid_block1(h, temb)
        h = self.mid_attn(h, context)
        h = self.mid_block2(h, temb)
        if mid_block_additional_residual is not None:
            h = h + mid_block_additional_residual
        for blocks in self.up_blocks:
            for blk in blocks:
                if isinstance(blk, _ResBlock):
                    skip = skips.pop()
                    h = blk(jnp.concatenate([h, skip], axis=-1), temb)
                elif isinstance(blk, _AttnBlock):
                    h = blk(h, context)
                else:
                    h = blk(h)
        h = self.conv_out(jax.nn.silu(self.norm_out(h)))
        return jnp.transpose(h, (0, h.ndim - 1) + tuple(range(1, h.ndim - 1)))
