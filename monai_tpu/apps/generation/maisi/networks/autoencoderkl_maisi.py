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


# ---------------------------------------------------------------------------
# Reference-name building blocks (reference: autoencoderkl_maisi.py MaisiGroupNorm3D
# / MaisiConvolution / MaisiUpsample / MaisiDownsample / MaisiResBlock /
# MaisiEncoder / MaisiDecoder). In torch these exist to split work along one dim
# and offload to CPU; under XLA that memory scheduling is the compiler's job, so
# each accepts the split/print/save_mem arguments for parity and computes the
# plain operation, channels-last.
# ---------------------------------------------------------------------------
import jax as _jax
import jax.numpy as _jnp

from .....networks.nets.autoencoderkl import (
    AEKLDownsample as _AEKLDownsample,
    AEKLResBlock as _AEKLResBlock,
    Decoder as _Decoder,
    Encoder as _Encoder,
)


class MaisiGroupNorm3D(nnx.Module):
    """GroupNorm with optional f32->f16 stat cast flag (reference: MaisiGroupNorm3D)."""

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5,
                 affine: bool = True, norm_float16: bool = False, num_splits: int = 16,
                 dim_split: int = 0, print_info: bool = False, save_mem: bool = True,
                 *, rngs: nnx.Rngs):
        self.norm = nnx.GroupNorm(num_channels, num_groups=num_groups, epsilon=eps,
                                  use_bias=affine, use_scale=affine, rngs=rngs)
        self.norm_float16 = norm_float16

    def __call__(self, x):
        y = self.norm(x)
        return y.astype(_jnp.float16) if self.norm_float16 else y


class MaisiConvolution(nnx.Module):
    """Plain convolution; split/offload args accepted for parity
    (reference: MaisiConvolution)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 num_splits: int = 16, dim_split: int = 0, print_info: bool = False,
                 save_mem: bool = True, strides=1, kernel_size=3, padding=None,
                 conv_only: bool = True, *, rngs: nnx.Rngs, **kwargs):
        s = (strides,) * spatial_dims if isinstance(strides, int) else tuple(strides)
        k = (kernel_size,) * spatial_dims if isinstance(kernel_size, int) else tuple(kernel_size)
        self.conv = nnx.Conv(in_channels, out_channels, kernel_size=k, strides=s, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class MaisiUpsample(nnx.Module):
    """2x nearest upsample + conv (reference: MaisiUpsample)."""

    def __init__(self, spatial_dims: int, in_channels: int, use_convtranspose: bool = False,
                 num_splits: int = 16, dim_split: int = 0, print_info: bool = False,
                 save_mem: bool = True, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        if use_convtranspose:
            self.conv = nnx.ConvTranspose(in_channels, in_channels,
                                          kernel_size=(2,) * spatial_dims,
                                          strides=(2,) * spatial_dims, rngs=rngs)
            self.upsample_first = False
        else:
            self.conv = nnx.Conv(in_channels, in_channels, kernel_size=(3,) * spatial_dims,
                                 rngs=rngs)
            self.upsample_first = True

    def __call__(self, x):
        if not self.upsample_first:
            return self.conv(x)
        for ax in range(1, self.spatial_dims + 1):
            x = _jnp.repeat(x, 2, axis=ax)
        return self.conv(x)


class MaisiDownsample(_AEKLDownsample):
    """Asymmetric-pad stride-2 conv (reference: MaisiDownsample)."""

    def __init__(self, spatial_dims: int, in_channels: int, num_splits: int = 16,
                 dim_split: int = 0, print_info: bool = False, save_mem: bool = True,
                 *, rngs: nnx.Rngs):
        super().__init__(spatial_dims, in_channels, rngs=rngs)


class MaisiResBlock(_AEKLResBlock):
    """VAE residual block (reference: MaisiResBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, norm_num_groups: int,
                 norm_eps: float, out_channels: int, num_splits: int = 16,
                 dim_split: int = 0, norm_float16: bool = False, print_info: bool = False,
                 save_mem: bool = True, *, rngs: nnx.Rngs):
        super().__init__(spatial_dims, in_channels, out_channels, norm_num_groups,
                         norm_eps, rngs=rngs)


class MaisiEncoder(_Encoder):
    """VAE encoder stage (reference: MaisiEncoder)."""

    def __init__(self, spatial_dims: int, in_channels: int, num_channels, out_channels: int,
                 num_res_blocks, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 attention_levels=None, with_nonlocal_attn: bool = True,
                 num_splits: int = 16, dim_split: int = 0, norm_float16: bool = False,
                 print_info: bool = False, save_mem: bool = True, *, rngs: nnx.Rngs,
                 **kwargs):
        super().__init__(spatial_dims, in_channels, num_channels, out_channels,
                         num_res_blocks, norm_num_groups, norm_eps, attention_levels,
                         with_nonlocal_attn, rngs=rngs)


class MaisiDecoder(_Decoder):
    """VAE decoder stage (reference: MaisiDecoder)."""

    def __init__(self, spatial_dims: int, num_channels, in_channels: int, out_channels: int,
                 num_res_blocks, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 attention_levels=None, with_nonlocal_attn: bool = True,
                 use_convtranspose: bool = False, num_splits: int = 16, dim_split: int = 0,
                 norm_float16: bool = False, print_info: bool = False, save_mem: bool = True,
                 *, rngs: nnx.Rngs, **kwargs):
        super().__init__(spatial_dims, num_channels, in_channels, out_channels,
                         num_res_blocks, norm_num_groups, norm_eps, attention_levels,
                         with_nonlocal_attn, use_convtranspose, rngs=rngs)


__all__ += ["MaisiGroupNorm3D", "MaisiConvolution", "MaisiUpsample", "MaisiDownsample",
            "MaisiResBlock", "MaisiEncoder", "MaisiDecoder"]
