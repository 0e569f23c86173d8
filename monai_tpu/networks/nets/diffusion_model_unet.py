"""Diffusion model UNet (reference: monai/networks/nets/diffusion_model_unet.py, 2053 LoC).

Compact TPU-native implementation: timestep sinusoidal embedding → MLP, residual blocks
with time conditioning, spatial self-attention (+ optional cross-attention context),
down/mid/up topology.  Channel-first public API; channel-last internals.
"""
from __future__ import annotations

import math
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.attention import CrossAttentionBlock, SABlock

__all__ = ["DiffusionModelUNet", "get_timestep_embedding"]


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int, max_period: int = 10000):
    """Sinusoidal timestep embeddings (reference: diffusion_model_unet.py)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32) / half_dim
    freqs = jnp.exp(exponent)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if embedding_dim % 2 == 1:
        embedding = jnp.pad(embedding, [(0, 0), (0, 1)])
    return embedding


class _TimeEmbed(nnx.Module):
    def __init__(self, in_dim: int, time_dim: int, *, rngs: nnx.Rngs):
        self.lin1 = nnx.Linear(in_dim, time_dim, rngs=rngs)
        self.lin2 = nnx.Linear(time_dim, time_dim, rngs=rngs)

    def __call__(self, t_emb):
        return self.lin2(jax.nn.silu(self.lin1(t_emb)))


class _ResBlock(nnx.Module):
    def __init__(self, spatial_dims: int, in_channels: int, temb_channels: int,
                 out_channels: int | None = None, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 *, rngs: nnx.Rngs):
        out_channels = out_channels or in_channels
        g1 = norm_num_groups
        while in_channels % g1:
            g1 -= 1
        g2 = norm_num_groups
        while out_channels % g2:
            g2 -= 1
        self.norm1 = nnx.GroupNorm(in_channels, num_groups=g1, epsilon=norm_eps, rngs=rngs)
        self.conv1 = nnx.Conv(in_channels, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.time_emb_proj = nnx.Linear(temb_channels, out_channels, rngs=rngs)
        self.norm2 = nnx.GroupNorm(out_channels, num_groups=g2, epsilon=norm_eps, rngs=rngs)
        self.conv2 = nnx.Conv(out_channels, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.skip = (nnx.Conv(in_channels, out_channels, kernel_size=(1,) * spatial_dims, rngs=rngs)
                     if in_channels != out_channels else None)

    def __call__(self, x, temb):
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        temb_proj = self.time_emb_proj(jax.nn.silu(temb))
        h = h + temb_proj.reshape(temb_proj.shape[:1] + (1,) * (h.ndim - 2) + temb_proj.shape[1:])
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        return h + (self.skip(x) if self.skip is not None else x)


class _AttnBlock(nnx.Module):
    """Spatial self-attention (+ optional cross-attention with context)."""

    def __init__(self, channels: int, num_head_channels: int = 64, norm_num_groups: int = 32,
                 cross_attention_dim: int | None = None, *, rngs: nnx.Rngs):
        g = norm_num_groups
        while channels % g:
            g -= 1
        self.norm = nnx.GroupNorm(channels, num_groups=g, rngs=rngs)
        heads = max(channels // num_head_channels, 1)
        self.attn = SABlock(channels, heads, rngs=rngs)
        if cross_attention_dim is not None:
            self.norm_cross = nnx.LayerNorm(channels, rngs=rngs)
            self.cross = CrossAttentionBlock(channels, heads, context_input_size=cross_attention_dim,
                                             rngs=rngs)
        else:
            self.cross = None

    def __call__(self, x, context=None):
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        h = self.norm(x).reshape(b, -1, c)
        h = self.attn(h)
        if self.cross is not None and context is not None:
            h = h + self.cross(self.norm_cross(h), context=context)
        return x + h.reshape((b,) + spatial + (c,))


class DiffusionModelUNet(nnx.Module):
    """(reference: diffusion_model_unet.py DiffusionModelUNet)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 norm_num_groups: int = 32, norm_eps: float = 1e-6, resblock_updown: bool = False,
                 num_head_channels: int | Sequence[int] = 8, with_conditioning: bool = False,
                 transformer_num_layers: int = 1, cross_attention_dim: int | None = None,
                 num_class_embeds: int | None = None, upcast_attention: bool = False,
                 dropout_cattn: float = 0.0, include_fc: bool = True, use_combined_linear: bool = False,
                 use_flash_attention: bool = False, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.with_conditioning = with_conditioning
        n_levels = len(channels)
        num_res_blocks = ensure_tuple_rep(num_res_blocks, n_levels)
        head_ch = ensure_tuple_rep(num_head_channels, n_levels)
        time_dim = channels[0] * 4
        self.base_channels = channels[0]
        self.conv_in = nnx.Conv(in_channels, channels[0], kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.time_embed = _TimeEmbed(channels[0], time_dim, rngs=rngs)
        self.num_class_embeds = num_class_embeds
        if num_class_embeds is not None:
            self.class_embedding = nnx.Embed(num_class_embeds, time_dim, rngs=rngs)
        ca_dim = cross_attention_dim if with_conditioning else None

        # down path
        downs = []
        ch = channels[0]
        self.skip_channels = [ch]
        for lvl in range(n_levels):
            out_ch = channels[lvl]
            blocks = []
            for _ in range(num_res_blocks[lvl]):
                blocks.append(_ResBlock(spatial_dims, ch, time_dim, out_ch, norm_num_groups, norm_eps,
                                        rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    blocks.append(_AttnBlock(ch, head_ch[lvl], norm_num_groups, ca_dim, rngs=rngs))
                self.skip_channels.append(ch)
            is_last = lvl == n_levels - 1
            if not is_last:
                blocks.append(nnx.Conv(ch, ch, kernel_size=(3,) * spatial_dims,
                                       strides=(2,) * spatial_dims, rngs=rngs))
                self.skip_channels.append(ch)
            downs.append(nnx.List(blocks))
        self.down_blocks = nnx.List(downs)

        # mid
        self.mid_block1 = _ResBlock(spatial_dims, ch, time_dim, ch, norm_num_groups, norm_eps, rngs=rngs)
        self.mid_attn = _AttnBlock(ch, head_ch[-1], norm_num_groups, ca_dim, rngs=rngs)
        self.mid_block2 = _ResBlock(spatial_dims, ch, time_dim, ch, norm_num_groups, norm_eps, rngs=rngs)

        # up path
        ups = []
        skip_idx = len(self.skip_channels) - 1
        for lvl in reversed(range(n_levels)):
            out_ch = channels[lvl]
            blocks = []
            for _ in range(num_res_blocks[lvl] + 1):
                skip_ch = self.skip_channels[skip_idx]
                skip_idx -= 1
                blocks.append(_ResBlock(spatial_dims, ch + skip_ch, time_dim, out_ch, norm_num_groups,
                                        norm_eps, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    blocks.append(_AttnBlock(ch, head_ch[lvl], norm_num_groups, ca_dim, rngs=rngs))
            if lvl > 0:
                blocks.append(nnx.ConvTranspose(ch, ch, kernel_size=(2,) * spatial_dims,
                                                strides=(2,) * spatial_dims, rngs=rngs))
            ups.append(nnx.List(blocks))
        self.up_blocks = nnx.List(ups)

        g = norm_num_groups
        while ch % g:
            g -= 1
        self.norm_out = nnx.GroupNorm(ch, num_groups=g, epsilon=norm_eps, rngs=rngs)
        self.conv_out = nnx.Conv(ch, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs)

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray, context: jnp.ndarray | None = None,
                 class_labels: jnp.ndarray | None = None, down_block_additional_residuals=None,
                 mid_block_additional_residual=None):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        t_emb = get_timestep_embedding(jnp.atleast_1d(timesteps), self.base_channels)
        temb = self.time_embed(t_emb)
        if self.num_class_embeds is not None and class_labels is not None:
            temb = temb + self.class_embedding(class_labels)
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
                else:  # downsample conv
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
                else:  # upsample
                    h = blk(h)
        h = self.conv_out(jax.nn.silu(self.norm_out(h)))
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(h, perm_out)


class DiffusionModelEncoder(nnx.Module):
    """Classifier/encoder over noisy inputs: the down path of DiffusionModelUNet plus a
    linear head (reference: diffusion_model_unet.py:1877 DiffusionModelEncoder)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 resblock_updown: bool = False, num_head_channels=8,
                 with_conditioning: bool = False, transformer_num_layers: int = 1,
                 cross_attention_dim: int | None = None, num_class_embeds: int | None = None,
                 upcast_attention: bool = False, *, rngs: nnx.Rngs):
        n_levels = len(channels)
        nrb = ensure_tuple_rep(num_res_blocks, n_levels)
        head_ch = ensure_tuple_rep(num_head_channels, n_levels)
        ca_dim = cross_attention_dim if with_conditioning else None
        time_dim = channels[0] * 4
        self.base_channels = channels[0]
        self.out_channels = out_channels
        self.conv_in = nnx.Conv(in_channels, channels[0], kernel_size=(3,) * spatial_dims,
                                rngs=rngs)
        self.time_embed = _TimeEmbed(channels[0], time_dim, rngs=rngs)
        self.num_class_embeds = num_class_embeds
        if num_class_embeds is not None:
            self.class_embedding = nnx.Embed(num_class_embeds, time_dim, rngs=rngs)
        downs = []
        ch = channels[0]
        for lvl in range(n_levels):
            out_ch = channels[lvl]
            blocks = []
            for _ in range(nrb[lvl]):
                blocks.append(_ResBlock(spatial_dims, ch, time_dim, out_ch, norm_num_groups,
                                        norm_eps, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    blocks.append(_AttnBlock(ch, head_ch[lvl], norm_num_groups, ca_dim,
                                             rngs=rngs))
            blocks.append(nnx.Conv(ch, ch, kernel_size=(3,) * spatial_dims,
                                   strides=(2,) * spatial_dims, rngs=rngs))
            downs.append(nnx.List(blocks))
        self.down_blocks = nnx.List(downs)
        self.out_lin = nnx.Linear(ch, out_channels, rngs=rngs)

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 context: jnp.ndarray | None = None,
                 class_labels: jnp.ndarray | None = None) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        t_emb = get_timestep_embedding(jnp.atleast_1d(timesteps), self.base_channels)
        temb = self.time_embed(t_emb)
        if self.num_class_embeds is not None and class_labels is not None:
            temb = temb + self.class_embedding(class_labels)
        h = self.conv_in(h)
        for blocks in self.down_blocks:
            for blk in blocks:
                if isinstance(blk, _ResBlock):
                    h = blk(h, temb)
                elif isinstance(blk, _AttnBlock):
                    h = blk(h, context)
                else:
                    h = blk(h)
        h = h.mean(axis=tuple(range(1, h.ndim - 1)))  # global average pool
        return self.out_lin(h)
