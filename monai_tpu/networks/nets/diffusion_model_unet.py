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


# ---------------------------------------------------------------------------
# Public building blocks (reference: diffusion_model_unet.py get_down_block /
# get_mid_block / get_up_block factories and their block classes). The compact
# DiffusionModelUNet above composes _ResBlock/_AttnBlock inline; these classes
# expose the same reference block granularity for custom assembly. All operate
# channels-last like the rest of this module.
# ---------------------------------------------------------------------------
DiffusionUNetResnetBlock = _ResBlock
SpatialTransformer = _AttnBlock
DiffusionUNetTransformerBlock = _AttnBlock


class DiffusionUnetDownsample(nnx.Module):
    """Stride-2 downsampler (conv or avg-pool)
    (reference: diffusion_model_unet.py DiffusionUnetDownsample)."""

    def __init__(self, spatial_dims: int, num_channels: int, use_conv: bool = True,
                 out_channels: int | None = None, padding: int = 1, *, rngs: nnx.Rngs):
        out_channels = out_channels or num_channels
        self.use_conv = use_conv
        if use_conv:
            self.op = nnx.Conv(num_channels, out_channels, kernel_size=(3,) * spatial_dims,
                               strides=(2,) * spatial_dims,
                               padding=[(padding, padding)] * spatial_dims, rngs=rngs)
        else:
            if out_channels != num_channels:
                raise ValueError("out_channels must equal num_channels when use_conv=False")
            self.spatial_dims = spatial_dims

    def __call__(self, x, emb=None):
        if self.use_conv:
            return self.op(x)
        window = (1,) + (2,) * self.spatial_dims + (1,)
        return jax.lax.reduce_window(x, 0.0, jax.lax.add, window, window, "VALID") / (
            2 ** self.spatial_dims)


class WrappedUpsample(nnx.Module):
    """2x nearest upsample + conv (reference: diffusion_model_unet.py WrappedUpsample)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int | None = None,
                 *, rngs: nnx.Rngs):
        out_channels = out_channels or in_channels
        self.spatial_dims = spatial_dims
        self.conv = nnx.Conv(in_channels, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs)

    def __call__(self, x, emb=None):
        for ax in range(1, self.spatial_dims + 1):
            x = jnp.repeat(x, 2, axis=ax)
        return self.conv(x)


class _DownBlockBase(nnx.Module):
    def __init__(self, spatial_dims, in_channels, out_channels, temb_channels,
                 num_res_blocks=1, norm_num_groups=32, norm_eps=1e-6, add_downsample=True,
                 downsample_padding=1, num_head_channels=1, cross_attention_dim=None,
                 with_attn=False, *, rngs):
        resnets, attns = [], []
        for i in range(num_res_blocks):
            ci = in_channels if i == 0 else out_channels
            resnets.append(_ResBlock(spatial_dims, ci, temb_channels, out_channels,
                                     norm_num_groups, norm_eps, rngs=rngs))
            if with_attn:
                attns.append(_AttnBlock(out_channels, num_head_channels, norm_num_groups,
                                        cross_attention_dim, rngs=rngs))
        self.resnets = nnx.List(resnets)
        self.attentions = nnx.List(attns) if attns else None
        self.downsampler = (DiffusionUnetDownsample(spatial_dims, out_channels,
                                                    padding=downsample_padding, rngs=rngs)
                            if add_downsample else None)

    def __call__(self, hidden_states, temb, context=None):
        output_states = []
        for i, res in enumerate(self.resnets):
            hidden_states = res(hidden_states, temb)
            if self.attentions is not None:
                hidden_states = self.attentions[i](hidden_states, context)
            output_states.append(hidden_states)
        if self.downsampler is not None:
            hidden_states = self.downsampler(hidden_states, temb)
            output_states.append(hidden_states)
        return hidden_states, output_states


class DownBlock(_DownBlockBase):
    """Resnet down stage (reference: diffusion_model_unet.py DownBlock)."""

    def __init__(self, spatial_dims, in_channels, out_channels, temb_channels, **kw):
        super().__init__(spatial_dims, in_channels, out_channels, temb_channels,
                         with_attn=False, **kw)


class AttnDownBlock(_DownBlockBase):
    """Resnet + self-attention down stage (reference: AttnDownBlock)."""

    def __init__(self, spatial_dims, in_channels, out_channels, temb_channels, **kw):
        kw.pop("cross_attention_dim", None)
        super().__init__(spatial_dims, in_channels, out_channels, temb_channels,
                         with_attn=True, **kw)


class CrossAttnDownBlock(_DownBlockBase):
    """Resnet + cross-attention down stage (reference: CrossAttnDownBlock)."""

    def __init__(self, spatial_dims, in_channels, out_channels, temb_channels,
                 cross_attention_dim=None, **kw):
        super().__init__(spatial_dims, in_channels, out_channels, temb_channels,
                         cross_attention_dim=cross_attention_dim, with_attn=True, **kw)


class AttnMidBlock(nnx.Module):
    """resnet - attention - resnet mid stage (reference: AttnMidBlock)."""

    def __init__(self, spatial_dims, in_channels, temb_channels, norm_num_groups=32,
                 norm_eps=1e-6, num_head_channels=1, cross_attention_dim=None, *, rngs):
        self.resnet_1 = _ResBlock(spatial_dims, in_channels, temb_channels, in_channels,
                                  norm_num_groups, norm_eps, rngs=rngs)
        self.attention = _AttnBlock(in_channels, num_head_channels, norm_num_groups,
                                    cross_attention_dim, rngs=rngs)
        self.resnet_2 = _ResBlock(spatial_dims, in_channels, temb_channels, in_channels,
                                  norm_num_groups, norm_eps, rngs=rngs)

    def __call__(self, hidden_states, temb, context=None):
        hidden_states = self.resnet_1(hidden_states, temb)
        hidden_states = self.attention(hidden_states, context)
        return self.resnet_2(hidden_states, temb)


class CrossAttnMidBlock(AttnMidBlock):
    """resnet - cross-attention - resnet mid stage (reference: CrossAttnMidBlock)."""


class _UpBlockBase(nnx.Module):
    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, num_res_blocks=1, norm_num_groups=32, norm_eps=1e-6,
                 add_upsample=True, num_head_channels=1, cross_attention_dim=None,
                 with_attn=False, *, rngs):
        resnets, attns = [], []
        for i in range(num_res_blocks):
            res_skip = in_channels if (i == num_res_blocks - 1) else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(_ResBlock(spatial_dims, res_in + res_skip, temb_channels,
                                     out_channels, norm_num_groups, norm_eps, rngs=rngs))
            if with_attn:
                attns.append(_AttnBlock(out_channels, num_head_channels, norm_num_groups,
                                        cross_attention_dim, rngs=rngs))
        self.resnets = nnx.List(resnets)
        self.attentions = nnx.List(attns) if attns else None
        self.upsampler = (WrappedUpsample(spatial_dims, out_channels, rngs=rngs)
                          if add_upsample else None)

    def __call__(self, hidden_states, res_hidden_states_list, temb, context=None):
        res_hidden_states_list = list(res_hidden_states_list)
        for i, res in enumerate(self.resnets):
            skip = res_hidden_states_list.pop()
            hidden_states = res(jnp.concatenate([hidden_states, skip], axis=-1), temb)
            if self.attentions is not None:
                hidden_states = self.attentions[i](hidden_states, context)
        if self.upsampler is not None:
            hidden_states = self.upsampler(hidden_states, temb)
        return hidden_states


class UpBlock(_UpBlockBase):
    """Resnet up stage with skip concat (reference: UpBlock)."""

    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, **kw):
        super().__init__(spatial_dims, in_channels, prev_output_channel, out_channels,
                         temb_channels, with_attn=False, **kw)


class AttnUpBlock(_UpBlockBase):
    """Resnet + self-attention up stage (reference: AttnUpBlock)."""

    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, **kw):
        kw.pop("cross_attention_dim", None)
        super().__init__(spatial_dims, in_channels, prev_output_channel, out_channels,
                         temb_channels, with_attn=True, **kw)


class CrossAttnUpBlock(_UpBlockBase):
    """Resnet + cross-attention up stage (reference: CrossAttnUpBlock)."""

    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, cross_attention_dim=None, **kw):
        super().__init__(spatial_dims, in_channels, prev_output_channel, out_channels,
                         temb_channels, cross_attention_dim=cross_attention_dim,
                         with_attn=True, **kw)


__all__ += ["DiffusionUNetResnetBlock", "SpatialTransformer", "DiffusionUNetTransformerBlock",
            "DiffusionUnetDownsample", "WrappedUpsample", "DownBlock", "AttnDownBlock",
            "CrossAttnDownBlock", "AttnMidBlock", "CrossAttnMidBlock", "UpBlock",
            "AttnUpBlock", "CrossAttnUpBlock"]


# ---------------------------------------------------------------------------
# module-level block factories (reference: diffusion_model_unet.py:1313
# get_down_block, :1384 get_mid_block, :1430 get_up_block, :49 zero_module).
# DiffusionModelUNet above builds these structures inline; the factories expose
# the same building blocks for custom UNet assembly (ControlNet, SPADE, MAISI).
# ---------------------------------------------------------------------------
def zero_module(module: nnx.Module) -> nnx.Module:
    """Zero all parameters of an nnx module in place and return it (reference:
    diffusion_model_unet.py:49)."""
    state = nnx.state(module, nnx.Param)
    nnx.update(module, jax.tree_util.tree_map(jnp.zeros_like, state))
    return module


def get_down_block(spatial_dims: int, in_channels: int, out_channels: int, temb_channels: int,
                   num_res_blocks: int = 1, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                   add_downsample: bool = True, resblock_updown: bool = False,
                   with_attn: bool = False, with_cross_attn: bool = False,
                   num_head_channels: int = 8, transformer_num_layers: int = 1,
                   cross_attention_dim: int | None = None, *, rngs: nnx.Rngs, **_kwargs) -> nnx.List:
    """One encoder level: res blocks (+ attention) (+ stride-2 downsample conv)
    (reference: diffusion_model_unet.py:1313)."""
    blocks = []
    ch = in_channels
    ca_dim = cross_attention_dim if with_cross_attn else None
    for _ in range(num_res_blocks):
        blocks.append(_ResBlock(spatial_dims, ch, temb_channels, out_channels,
                                norm_num_groups, norm_eps, rngs=rngs))
        ch = out_channels
        if with_attn or with_cross_attn:
            blocks.append(_AttnBlock(ch, num_head_channels, norm_num_groups, ca_dim, rngs=rngs))
    if add_downsample:
        blocks.append(nnx.Conv(ch, ch, kernel_size=(3,) * spatial_dims,
                               strides=(2,) * spatial_dims, rngs=rngs))
    return nnx.List(blocks)


def get_mid_block(spatial_dims: int, in_channels: int, temb_channels: int,
                  norm_num_groups: int = 32, norm_eps: float = 1e-6,
                  with_conditioning: bool = False, num_head_channels: int = 8,
                  transformer_num_layers: int = 1, cross_attention_dim: int | None = None,
                  *, rngs: nnx.Rngs, **_kwargs) -> nnx.List:
    """The res-attn-res bottleneck (reference: diffusion_model_unet.py:1384)."""
    ca_dim = cross_attention_dim if with_conditioning else None
    return nnx.List([
        _ResBlock(spatial_dims, in_channels, temb_channels, in_channels,
                  norm_num_groups, norm_eps, rngs=rngs),
        _AttnBlock(in_channels, num_head_channels, norm_num_groups, ca_dim, rngs=rngs),
        _ResBlock(spatial_dims, in_channels, temb_channels, in_channels,
                  norm_num_groups, norm_eps, rngs=rngs),
    ])


def get_up_block(spatial_dims: int, in_channels: int, prev_output_channel: int,
                 out_channels: int, temb_channels: int, num_res_blocks: int = 1,
                 norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 add_upsample: bool = True, resblock_updown: bool = False,
                 with_attn: bool = False, with_cross_attn: bool = False,
                 num_head_channels: int = 8, transformer_num_layers: int = 1,
                 cross_attention_dim: int | None = None, *, rngs: nnx.Rngs, **_kwargs) -> nnx.List:
    """One decoder level: res blocks over concat(skip, x) (+ attention)
    (+ stride-2 transposed-conv upsample) (reference:
    diffusion_model_unet.py:1430)."""
    blocks = []
    ch = prev_output_channel
    ca_dim = cross_attention_dim if with_cross_attn else None
    for i in range(num_res_blocks):
        skip_ch = in_channels if i == num_res_blocks - 1 else out_channels
        blocks.append(_ResBlock(spatial_dims, ch + skip_ch, temb_channels, out_channels,
                                norm_num_groups, norm_eps, rngs=rngs))
        ch = out_channels
        if with_attn or with_cross_attn:
            blocks.append(_AttnBlock(ch, num_head_channels, norm_num_groups, ca_dim, rngs=rngs))
    if add_upsample:
        blocks.append(nnx.ConvTranspose(ch, ch, kernel_size=(2,) * spatial_dims,
                                        strides=(2,) * spatial_dims, rngs=rngs))
    return nnx.List(blocks)
