"""MAISI ControlNet (reference:
monai/apps/generation/maisi/networks/controlnet_maisi.py:22 ControlNetMaisi)."""
from __future__ import annotations

from collections.abc import Sequence

from flax import nnx

from .....networks.nets.controlnet import ControlNet

__all__ = ["ControlNetMaisi"]


class ControlNetMaisi(ControlNet):
    """(reference: controlnet_maisi.py:22). ``use_checkpointing`` is accepted for API
    parity; rematerialization is controlled by jax.checkpoint at the training-step level
    in this framework."""

    def __init__(self, spatial_dims: int, in_channels: int,
                 num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 resblock_updown: bool = False, num_head_channels=8,
                 with_conditioning: bool = False, transformer_num_layers: int = 1,
                 cross_attention_dim: int | None = None, num_class_embeds: int | None = None,
                 upcast_attention: bool = False,
                 conditioning_embedding_in_channels: int = 1,
                 conditioning_embedding_num_channels: Sequence[int] = (16, 32, 96, 256),
                 use_checkpointing: bool = True, include_fc: bool = False,
                 use_combined_linear: bool = False, use_flash_attention: bool = False,
                 *, rngs: nnx.Rngs):
        super().__init__(spatial_dims=spatial_dims, in_channels=in_channels,
                         num_res_blocks=num_res_blocks, channels=channels,
                         attention_levels=attention_levels, norm_num_groups=norm_num_groups,
                         norm_eps=norm_eps, num_head_channels=num_head_channels,
                         with_conditioning=with_conditioning,
                         transformer_num_layers=transformer_num_layers,
                         cross_attention_dim=cross_attention_dim,
                         num_class_embeds=num_class_embeds,
                         conditioning_embedding_in_channels=conditioning_embedding_in_channels,
                         conditioning_embedding_num_channels=conditioning_embedding_num_channels,
                         rngs=rngs)
        self.use_checkpointing = use_checkpointing
