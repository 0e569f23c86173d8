"""Diffusion UNet with SPADE-conditioned decoder
(reference: monai/networks/nets/spade_diffusion_model_unet.py:673 SPADEDiffusionModelUNet).

Down path and mid block are identical to DiffusionModelUNet; the up-path residual blocks
replace their GroupNorms with SPADE norms conditioned on a semantic map.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.spade_norm import SPADE
from .diffusion_model_unet import DiffusionModelUNet, _AttnBlock, get_timestep_embedding

__all__ = ["SPADEDiffusionModelUNet"]


class _SPADEDiffResBlock(nnx.Module):
    """Timestep-conditioned ResBlock with SPADE norms
    (reference: spade_diffusion_model_unet.py:63 SPADEResnetBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, temb_channels: int,
                 label_nc: int, out_channels: int | None = None, norm_num_groups: int = 32,
                 norm_eps: float = 1e-6, spade_intermediate_channels: int = 128,
                 *, rngs: nnx.Rngs):
        out_channels = out_channels or in_channels
        self.norm1 = SPADE(label_nc, in_channels, kernel_size=3, spatial_dims=spatial_dims,
                           hidden_channels=spade_intermediate_channels,
                           norm=("GROUP", {"num_groups": min(norm_num_groups, in_channels),
                                           "epsilon": norm_eps}), rngs=rngs)
        self.conv1 = nnx.Conv(in_channels, out_channels, kernel_size=(3,) * spatial_dims,
                              rngs=rngs)
        self.time_emb_proj = nnx.Linear(temb_channels, out_channels, rngs=rngs)
        self.norm2 = SPADE(label_nc, out_channels, kernel_size=3, spatial_dims=spatial_dims,
                           hidden_channels=spade_intermediate_channels,
                           norm=("GROUP", {"num_groups": min(norm_num_groups, out_channels),
                                           "epsilon": norm_eps}), rngs=rngs)
        self.conv2 = nnx.Conv(out_channels, out_channels, kernel_size=(3,) * spatial_dims,
                              rngs=rngs)
        self.skip = (nnx.Conv(in_channels, out_channels, kernel_size=(1,) * spatial_dims,
                              rngs=rngs) if in_channels != out_channels else None)

    def __call__(self, x, temb, seg):
        h = self.conv1(jax.nn.silu(self.norm1(x, seg)))
        tp = self.time_emb_proj(jax.nn.silu(temb))
        h = h + tp.reshape(tp.shape[:1] + (1,) * (h.ndim - 2) + tp.shape[1:])
        h = self.conv2(jax.nn.silu(self.norm2(h, seg)))
        return h + (self.skip(x) if self.skip is not None else x)


class SPADEDiffusionModelUNet(DiffusionModelUNet):
    """(reference: spade_diffusion_model_unet.py:673). ``__call__`` takes ``seg``."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, label_nc: int,
                 num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 resblock_updown: bool = False, num_head_channels: int | Sequence[int] = 8,
                 with_conditioning: bool = False, transformer_num_layers: int = 1,
                 cross_attention_dim: int | None = None, num_class_embeds: int | None = None,
                 upcast_attention: bool = False, spade_intermediate_channels: int = 128,
                 *, rngs: nnx.Rngs):
        super().__init__(spatial_dims, in_channels, out_channels, num_res_blocks, channels,
                         attention_levels, norm_num_groups, norm_eps, resblock_updown,
                         num_head_channels, with_conditioning, transformer_num_layers,
                         cross_attention_dim, num_class_embeds, upcast_attention, rngs=rngs)
        self.label_nc = label_nc
        n_levels = len(channels)
        nrb = ensure_tuple_rep(num_res_blocks, n_levels)
        head_ch = ensure_tuple_rep(num_head_channels, n_levels)
        ca_dim = cross_attention_dim if with_conditioning else None
        time_dim = channels[0] * 4
        # rebuild the up path with SPADE-conditioned resblocks
        ups = []
        ch = channels[-1]
        skip_idx = len(self.skip_channels) - 1
        for lvl in reversed(range(n_levels)):
            out_ch = channels[lvl]
            blocks = []
            for _ in range(nrb[lvl] + 1):
                skip_ch = self.skip_channels[skip_idx]
                skip_idx -= 1
                blocks.append(_SPADEDiffResBlock(spatial_dims, ch + skip_ch, time_dim,
                                                 label_nc, out_ch, norm_num_groups, norm_eps,
                                                 spade_intermediate_channels, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    blocks.append(_AttnBlock(ch, head_ch[lvl], norm_num_groups, ca_dim,
                                             rngs=rngs))
            if lvl > 0:
                blocks.append(nnx.ConvTranspose(ch, ch, kernel_size=(2,) * spatial_dims,
                                                strides=(2,) * spatial_dims, rngs=rngs))
            ups.append(nnx.List(blocks))
        self.up_blocks = nnx.List(ups)

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray, seg: jnp.ndarray,
                 context: jnp.ndarray | None = None, class_labels: jnp.ndarray | None = None):
        from .diffusion_model_unet import _ResBlock

        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        seg_cl = jnp.transpose(seg, (0,) + tuple(range(2, seg.ndim)) + (1,))
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
                else:
                    h = blk(h)
                    skips.append(h)
        h = self.mid_block1(h, temb)
        h = self.mid_attn(h, context)
        h = self.mid_block2(h, temb)
        for blocks in self.up_blocks:
            for blk in blocks:
                if isinstance(blk, _SPADEDiffResBlock):
                    skip = skips.pop()
                    h = blk(jnp.concatenate([h, skip], axis=-1), temb, seg_cl)
                elif isinstance(blk, _AttnBlock):
                    h = blk(h, context)
                else:
                    h = blk(h)
        h = self.conv_out(jax.nn.silu(self.norm_out(h)))
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(h, perm_out)


# ---------------------------------------------------------------------------
# Public building blocks (reference: spade_diffusion_model_unet.py SPADEUpBlock /
# SPADEAttnUpBlock / SPADECrossAttnUpBlock / SPADEDiffResBlock): up stages whose
# resblocks are SPADE-conditioned on a semantic map, channels-last.
# ---------------------------------------------------------------------------
SPADEDiffResBlock = _SPADEDiffResBlock


class _SPADEUpBase(nnx.Module):
    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, label_nc, num_res_blocks=1, norm_num_groups=32,
                 norm_eps=1e-6, add_upsample=True, num_head_channels=1,
                 cross_attention_dim=None, spade_intermediate_channels=128,
                 with_attn=False, *, rngs):
        from .diffusion_model_unet import WrappedUpsample

        resnets, attns = [], []
        for i in range(num_res_blocks):
            res_skip = in_channels if (i == num_res_blocks - 1) else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(_SPADEDiffResBlock(spatial_dims, res_in + res_skip, temb_channels,
                                              label_nc, out_channels, norm_num_groups,
                                              norm_eps, spade_intermediate_channels, rngs=rngs))
            if with_attn:
                attns.append(_AttnBlock(out_channels, num_head_channels, norm_num_groups,
                                        cross_attention_dim, rngs=rngs))
        self.resnets = nnx.List(resnets)
        self.attentions = nnx.List(attns) if attns else None
        self.upsampler = (WrappedUpsample(spatial_dims, out_channels, rngs=rngs)
                          if add_upsample else None)

    def __call__(self, hidden_states, res_hidden_states_list, temb, seg, context=None):
        res_hidden_states_list = list(res_hidden_states_list)
        for i, res in enumerate(self.resnets):
            skip = res_hidden_states_list.pop()
            hidden_states = res(jnp.concatenate([hidden_states, skip], axis=-1), temb, seg)
            if self.attentions is not None:
                hidden_states = self.attentions[i](hidden_states, context)
        if self.upsampler is not None:
            hidden_states = self.upsampler(hidden_states)
        return hidden_states


class SPADEUpBlock(_SPADEUpBase):
    """SPADE resnet up stage (reference: SPADEUpBlock)."""

    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, label_nc, **kw):
        super().__init__(spatial_dims, in_channels, prev_output_channel, out_channels,
                         temb_channels, label_nc, with_attn=False, **kw)


class SPADEAttnUpBlock(_SPADEUpBase):
    """SPADE resnet + self-attention up stage (reference: SPADEAttnUpBlock)."""

    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, label_nc, **kw):
        kw.pop("cross_attention_dim", None)
        super().__init__(spatial_dims, in_channels, prev_output_channel, out_channels,
                         temb_channels, label_nc, with_attn=True, **kw)


class SPADECrossAttnUpBlock(_SPADEUpBase):
    """SPADE resnet + cross-attention up stage (reference: SPADECrossAttnUpBlock)."""

    def __init__(self, spatial_dims, in_channels, prev_output_channel, out_channels,
                 temb_channels, label_nc, cross_attention_dim=None, **kw):
        super().__init__(spatial_dims, in_channels, prev_output_channel, out_channels,
                         temb_channels, label_nc, cross_attention_dim=cross_attention_dim,
                         with_attn=True, **kw)


__all__ += ["SPADEDiffResBlock", "SPADEUpBlock", "SPADEAttnUpBlock", "SPADECrossAttnUpBlock"]


def get_spade_up_block(spatial_dims, in_channels, prev_output_channel, out_channels,
                       temb_channels, num_res_blocks, norm_num_groups=32, norm_eps=1e-6,
                       add_upsample=True, resblock_updown=False, with_attn=False,
                       with_cross_attn=False, num_head_channels=1, transformer_num_layers=1,
                       label_nc=3, cross_attention_dim=None, upcast_attention=False,
                       spade_intermediate_channels=128, *, rngs, **_kwargs):
    """Build the right SPADE decoder stage for the attention flags (reference:
    spade_diffusion_model_unet.py:594)."""
    common = dict(spatial_dims=spatial_dims, in_channels=in_channels,
                  prev_output_channel=prev_output_channel, out_channels=out_channels,
                  temb_channels=temb_channels, label_nc=label_nc,
                  num_res_blocks=num_res_blocks, norm_num_groups=norm_num_groups,
                  norm_eps=norm_eps, add_upsample=add_upsample,
                  num_head_channels=num_head_channels,
                  spade_intermediate_channels=spade_intermediate_channels, rngs=rngs)
    if with_attn:
        return SPADEAttnUpBlock(**common)
    if with_cross_attn:
        return SPADECrossAttnUpBlock(cross_attention_dim=cross_attention_dim, **common)
    return SPADEUpBlock(**common)
