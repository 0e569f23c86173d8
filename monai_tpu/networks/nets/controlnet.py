"""ControlNet (reference: monai/networks/nets/controlnet.py) — a conditioned copy of the
diffusion UNet's encoder emitting residuals for each skip + the mid block."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from .diffusion_model_unet import _AttnBlock, _ResBlock, _TimeEmbed, get_timestep_embedding

__all__ = ["ControlNet"]


class _ZeroConv(nnx.Module):
    """1x1 conv initialized to zero (ControlNet's gating trick)."""

    def __init__(self, spatial_dims: int, channels: int, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(channels, channels, kernel_size=(1,) * spatial_dims,
                             kernel_init=nnx.initializers.zeros_init(),
                             bias_init=nnx.initializers.zeros_init(), rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class ControlNet(nnx.Module):
    """(reference: controlnet.py ControlNet)."""

    def __init__(self, spatial_dims: int, in_channels: int, num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 norm_num_groups: int = 32, norm_eps: float = 1e-6, resblock_updown: bool = False,
                 num_head_channels: int | Sequence[int] = 8, with_conditioning: bool = False,
                 transformer_num_layers: int = 1, cross_attention_dim: int | None = None,
                 num_class_embeds: int | None = None, upcast_attention: bool = False,
                 conditioning_embedding_in_channels: int = 1,
                 conditioning_embedding_num_channels: Sequence[int] = (16, 32, 96, 256),
                 *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        n_levels = len(channels)
        num_res_blocks = ensure_tuple_rep(num_res_blocks, n_levels)
        head_ch = ensure_tuple_rep(num_head_channels, n_levels)
        time_dim = channels[0] * 4
        self.base_channels = channels[0]
        ca_dim = cross_attention_dim if with_conditioning else None

        self.conv_in = nnx.Conv(in_channels, channels[0], kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.time_embed = _TimeEmbed(channels[0], time_dim, rngs=rngs)

        # conditioning embedding tower: image-space cond → feature space of conv_in
        cond_layers = []
        ch_c = conditioning_embedding_in_channels
        for c in conditioning_embedding_num_channels:
            cond_layers.append(nnx.Conv(ch_c, c, kernel_size=(3,) * spatial_dims,
                                        strides=(1,) * spatial_dims, rngs=rngs))
            ch_c = c
        cond_layers.append(nnx.Conv(ch_c, channels[0], kernel_size=(3,) * spatial_dims,
                                    kernel_init=nnx.initializers.zeros_init(),
                                    bias_init=nnx.initializers.zeros_init(), rngs=rngs))
        self.controlnet_cond_embedding = nnx.List(cond_layers)

        downs = []
        zero_convs = [_ZeroConv(spatial_dims, channels[0], rngs=rngs)]
        ch = channels[0]
        for lvl in range(n_levels):
            out_ch = channels[lvl]
            blocks = []
            for _ in range(num_res_blocks[lvl]):
                blocks.append(_ResBlock(spatial_dims, ch, time_dim, out_ch, norm_num_groups, norm_eps,
                                        rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    blocks.append(_AttnBlock(ch, head_ch[lvl], norm_num_groups, ca_dim, rngs=rngs))
                zero_convs.append(_ZeroConv(spatial_dims, ch, rngs=rngs))
            if lvl != n_levels - 1:
                blocks.append(nnx.Conv(ch, ch, kernel_size=(3,) * spatial_dims,
                                       strides=(2,) * spatial_dims, rngs=rngs))
                zero_convs.append(_ZeroConv(spatial_dims, ch, rngs=rngs))
            downs.append(nnx.List(blocks))
        self.down_blocks = nnx.List(downs)
        self.controlnet_down_blocks = nnx.List(zero_convs)
        self.mid_block1 = _ResBlock(spatial_dims, ch, time_dim, ch, norm_num_groups, norm_eps, rngs=rngs)
        self.mid_attn = _AttnBlock(ch, head_ch[-1], norm_num_groups, ca_dim, rngs=rngs)
        self.mid_block2 = _ResBlock(spatial_dims, ch, time_dim, ch, norm_num_groups, norm_eps, rngs=rngs)
        self.controlnet_mid_block = _ZeroConv(spatial_dims, ch, rngs=rngs)

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray, controlnet_cond: jnp.ndarray,
                 conditioning_scale: float = 1.0, context: jnp.ndarray | None = None,
                 class_labels=None):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        cond = jnp.transpose(controlnet_cond, perm_in)
        t_emb = get_timestep_embedding(jnp.atleast_1d(timesteps), self.base_channels)
        temb = self.time_embed(t_emb)
        h = self.conv_in(h)
        for i, m in enumerate(self.controlnet_cond_embedding):
            cond = m(cond)
            if i < len(self.controlnet_cond_embedding) - 1:
                cond = jax.nn.silu(cond)
        h = h + cond
        outs = [h]
        for blocks in self.down_blocks:
            for blk in blocks:
                if isinstance(blk, _ResBlock):
                    h = blk(h, temb)
                    outs.append(h)
                elif isinstance(blk, _AttnBlock):
                    h = blk(h, context)
                    outs[-1] = h
                else:
                    h = blk(h)
                    outs.append(h)
        h = self.mid_block1(h, temb)
        h = self.mid_attn(h, context)
        h = self.mid_block2(h, temb)
        down_residuals = [zc(o) * conditioning_scale
                          for zc, o in zip(self.controlnet_down_blocks, outs)]
        mid_residual = self.controlnet_mid_block(h) * conditioning_scale
        return down_residuals, mid_residual


class ControlNetConditioningEmbedding(nnx.Module):
    """Encode the conditioning image into the latent space: SiLU conv stack with
    stride-2 downsamples, zero-initialised output conv
    (reference: controlnet.py:44). Channels-last."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 channels, *, rngs: nnx.Rngs):
        self.conv_in = nnx.Conv(in_channels, channels[0], kernel_size=(3,) * spatial_dims,
                                rngs=rngs)
        blocks = []
        for i in range(len(channels) - 1):
            blocks.append(nnx.Conv(channels[i], channels[i], kernel_size=(3,) * spatial_dims,
                                   rngs=rngs))
            blocks.append(nnx.Conv(channels[i], channels[i + 1],
                                   kernel_size=(3,) * spatial_dims,
                                   strides=(2,) * spatial_dims, rngs=rngs))
        self.blocks = nnx.List(blocks)
        self.conv_out = nnx.Conv(channels[-1], out_channels, kernel_size=(3,) * spatial_dims,
                                 kernel_init=nnx.initializers.zeros_init(),
                                 bias_init=nnx.initializers.zeros_init(), rngs=rngs)

    def __call__(self, x):
        h = jax.nn.silu(self.conv_in(x))
        for blk in self.blocks:
            h = jax.nn.silu(blk(h))
        return self.conv_out(h)


__all__ += ["ControlNetConditioningEmbedding"]


# reference: controlnet.py:~30 re-exports zero_module from diffusion_model_unet
from .diffusion_model_unet import zero_module  # noqa: E402,F401
