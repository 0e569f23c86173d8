"""MAISI variational autoencoder (reference:
monai/apps/generation/maisi/networks/autoencoderkl_maisi.py:885 AutoencoderKlMaisi).

The reference's memory machinery (num_splits tiled convolutions, float16 GroupNorm,
CPU offload) exists to fit huge 3D volumes on a single GPU. Under XLA the equivalent
levers are rematerialization (`jax.checkpoint`) and compiler-scheduled HBM reuse, so
those arguments are accepted for API parity and the tiling is left to the compiler.
"""
from __future__ import annotations

from collections.abc import Sequence

from flax import nnx

from .....networks.nets.autoencoderkl import AutoencoderKL

__all__ = ["AutoencoderKlMaisi"]


class AutoencoderKlMaisi(AutoencoderKL):
    """(reference: autoencoderkl_maisi.py:885)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 num_res_blocks: Sequence[int], num_channels: Sequence[int],
                 attention_levels: Sequence[bool], latent_channels: int = 3,
                 norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 with_encoder_nonlocal_attn: bool = False,
                 with_decoder_nonlocal_attn: bool = False,
                 include_fc: bool = False, use_combined_linear: bool = False,
                 use_flash_attention: bool = False, use_checkpointing: bool = False,
                 use_convtranspose: bool = False, norm_float16: bool = False,
                 num_splits: int = 16, dim_split: int = 0, print_info: bool = False,
                 save_mem: bool = True, *, rngs: nnx.Rngs):
        super().__init__(spatial_dims, in_channels, out_channels, num_res_blocks,
                         num_channels, attention_levels, latent_channels,
                         norm_num_groups, norm_eps, with_encoder_nonlocal_attn,
                         with_decoder_nonlocal_attn, include_fc, use_combined_linear,
                         use_flash_attention, use_checkpointing, use_convtranspose,
                         rngs=rngs)
        # accepted for API parity; XLA handles the memory tiling these control in torch
        self.num_splits = num_splits
        self.dim_split = dim_split
        self.print_info = print_info
        self.save_mem = save_mem
