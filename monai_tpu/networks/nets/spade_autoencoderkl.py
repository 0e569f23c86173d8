"""AutoencoderKL with SPADE-conditioned decoder
(reference: monai/networks/nets/spade_autoencoderkl.py:309 SPADEAutoencoderKL).

The encoder is identical to AutoencoderKL; decoder residual blocks swap their
GroupNorms for SPADE norms conditioned on a semantic map.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.spade_norm import SPADE
from .autoencoderkl import AutoencoderKL, _SpatialAttn

__all__ = ["SPADEAutoencoderKL"]


class _SPADEResBlock(nnx.Module):
    """Decoder ResBlock with SPADE norms (reference: spade_autoencoderkl.py:36)."""

    def __init__(self, spatial_dims, in_ch, out_ch, label_nc, groups, eps,
                 spade_intermediate_channels, *, rngs):
        self.norm1 = SPADE(label_nc, in_ch, kernel_size=3, spatial_dims=spatial_dims,
                           hidden_channels=spade_intermediate_channels,
                           norm=("GROUP", {"num_groups": min(groups, in_ch), "epsilon": eps}),
                           rngs=rngs)
        self.conv1 = nnx.Conv(in_ch, out_ch, kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.norm2 = SPADE(label_nc, out_ch, kernel_size=3, spatial_dims=spatial_dims,
                           hidden_channels=spade_intermediate_channels,
                           norm=("GROUP", {"num_groups": min(groups, out_ch), "epsilon": eps}),
                           rngs=rngs)
        self.conv2 = nnx.Conv(out_ch, out_ch, kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.skip = nnx.Conv(in_ch, out_ch, kernel_size=(1,) * spatial_dims, rngs=rngs) \
            if in_ch != out_ch else None

    def __call__(self, x, seg):
        h = self.conv1(jax.nn.silu(self.norm1(x, seg)))
        h = self.conv2(jax.nn.silu(self.norm2(h, seg)))
        return h + (self.skip(x) if self.skip is not None else x)


class SPADEAutoencoderKL(AutoencoderKL):
    """(reference: spade_autoencoderkl.py:309). ``decode``/``__call__`` take a semantic map."""

    def __init__(self, spatial_dims: int, label_nc: int, in_channels: int = 1,
                 out_channels: int = 1, num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 latent_channels: int = 3, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 with_encoder_nonlocal_attn: bool = True,
                 with_decoder_nonlocal_attn: bool = True,
                 spade_intermediate_channels: int = 128, *, rngs: nnx.Rngs):
        from ...utils.misc import ensure_tuple_rep

        super().__init__(spatial_dims, in_channels, out_channels, num_res_blocks, channels,
                         attention_levels, latent_channels, norm_num_groups, norm_eps,
                         with_encoder_nonlocal_attn, with_decoder_nonlocal_attn, rngs=rngs)
        self.label_nc = label_nc
        # rebuild the decoder with SPADE-conditioned resblocks
        n_levels = len(channels)
        nrb = ensure_tuple_rep(num_res_blocks, n_levels)
        ch = channels[-1]
        dec = [nnx.Conv(latent_channels, ch, kernel_size=(3,) * spatial_dims, rngs=rngs)]
        if with_decoder_nonlocal_attn:
            dec.append(_SPADEResBlock(spatial_dims, ch, ch, label_nc, norm_num_groups,
                                      norm_eps, spade_intermediate_channels, rngs=rngs))
            dec.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            dec.append(_SPADEResBlock(spatial_dims, ch, ch, label_nc, norm_num_groups,
                                      norm_eps, spade_intermediate_channels, rngs=rngs))
        for lvl in reversed(range(n_levels)):
            out_ch = channels[lvl]
            for _ in range(nrb[lvl] + 1):
                dec.append(_SPADEResBlock(spatial_dims, ch, out_ch, label_nc, norm_num_groups,
                                          norm_eps, spade_intermediate_channels, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    dec.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            if lvl != 0:
                dec.append(nnx.ConvTranspose(ch, ch, kernel_size=(2,) * spatial_dims,
                                             strides=(2,) * spatial_dims, rngs=rngs))
        g = norm_num_groups
        while ch % g:
            g -= 1
        dec.append(nnx.GroupNorm(ch, num_groups=g, epsilon=norm_eps, rngs=rngs))
        dec.append(nnx.Conv(ch, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs))
        self.decoder = nnx.List(dec)

    def decode(self, z: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, z.ndim)) + (1,)
        h = jnp.transpose(z, perm_in)
        seg_cl = jnp.transpose(seg, (0,) + tuple(range(2, seg.ndim)) + (1,))
        mods = list(self.decoder)
        n = len(mods)
        for i, m in enumerate(mods):
            if isinstance(m, _SPADEResBlock):
                h = m(h, seg_cl)
            elif isinstance(m, nnx.GroupNorm) and i == n - 2:
                h = jax.nn.silu(m(h))
            else:
                h = m(h)
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(h, perm_out)

    def reconstruct(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        z_mu, _ = self.encode(x)
        return self.decode(z_mu, seg)

    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray):
        z_mu, z_sigma = self.encode(x)
        z = self.sampling(z_mu, z_sigma)
        return self.decode(z, seg), z_mu, z_sigma

    def decode_stage_2_outputs(self, z: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        return self.decode(z, seg)


# Reference-name export (reference: spade_autoencoderkl.py SPADEResBlock)
SPADEResBlock = _SPADEResBlock
__all__ += ["SPADEResBlock"]
