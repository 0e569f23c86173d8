"""AutoencoderKL — VAE with KL-regularized latent for latent diffusion
(reference: monai/networks/nets/autoencoderkl.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..blocks.attention import SABlock

__all__ = ["AutoencoderKL"]


def _gn(ch, groups, eps, rngs):
    g = groups
    while ch % g:
        g -= 1
    return nnx.GroupNorm(ch, num_groups=g, epsilon=eps, rngs=rngs)


class _ResBlock(nnx.Module):
    def __init__(self, spatial_dims, in_ch, out_ch, groups, eps, *, rngs):
        self.norm1 = _gn(in_ch, groups, eps, rngs)
        self.conv1 = nnx.Conv(in_ch, out_ch, kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.norm2 = _gn(out_ch, groups, eps, rngs)
        self.conv2 = nnx.Conv(out_ch, out_ch, kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.skip = nnx.Conv(in_ch, out_ch, kernel_size=(1,) * spatial_dims, rngs=rngs) \
            if in_ch != out_ch else None

    def __call__(self, x):
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        return h + (self.skip(x) if self.skip is not None else x)


class _SpatialAttn(nnx.Module):
    def __init__(self, ch, groups, eps, *, rngs):
        self.norm = _gn(ch, groups, eps, rngs)
        self.attn = SABlock(ch, max(ch // 64, 1), rngs=rngs)

    def __call__(self, x):
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        h = self.norm(x).reshape(b, -1, c)
        h = self.attn(h)
        return x + h.reshape((b,) + spatial + (c,))


class AutoencoderKL(nnx.Module):
    """(reference: autoencoderkl.py AutoencoderKL)."""

    def __init__(self, spatial_dims: int, in_channels: int = 1, out_channels: int = 1,
                 num_res_blocks: Sequence[int] | int = (2, 2, 2, 2),
                 channels: Sequence[int] = (32, 64, 64, 64),
                 attention_levels: Sequence[bool] = (False, False, True, True),
                 latent_channels: int = 3, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 with_encoder_nonlocal_attn: bool = True, with_decoder_nonlocal_attn: bool = True,
                 include_fc: bool = True, use_combined_linear: bool = False,
                 use_flash_attention: bool = False, use_checkpoint: bool = False,
                 use_convtranspose: bool = False, *, rngs: nnx.Rngs):
        from ...utils.misc import ensure_tuple_rep

        self.spatial_dims = spatial_dims
        self.latent_channels = latent_channels
        n_levels = len(channels)
        num_res_blocks = ensure_tuple_rep(num_res_blocks, n_levels)

        # encoder
        enc = [nnx.Conv(in_channels, channels[0], kernel_size=(3,) * spatial_dims, rngs=rngs)]
        ch = channels[0]
        for lvl in range(n_levels):
            out_ch = channels[lvl]
            for _ in range(num_res_blocks[lvl]):
                enc.append(_ResBlock(spatial_dims, ch, out_ch, norm_num_groups, norm_eps, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    enc.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            if lvl != n_levels - 1:
                enc.append(nnx.Conv(ch, ch, kernel_size=(3,) * spatial_dims,
                                    strides=(2,) * spatial_dims, rngs=rngs))
        if with_encoder_nonlocal_attn:
            enc.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
            enc.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            enc.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
        enc.append(_gn(ch, norm_num_groups, norm_eps, rngs))
        enc.append(nnx.Conv(ch, latent_channels * 2, kernel_size=(3,) * spatial_dims, rngs=rngs))
        self.encoder = nnx.List(enc)

        # decoder
        dec = [nnx.Conv(latent_channels, ch, kernel_size=(3,) * spatial_dims, rngs=rngs)]
        if with_decoder_nonlocal_attn:
            dec.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
            dec.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            dec.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
        for lvl in reversed(range(n_levels)):
            out_ch = channels[lvl]
            for _ in range(num_res_blocks[lvl] + 1):
                dec.append(_ResBlock(spatial_dims, ch, out_ch, norm_num_groups, norm_eps, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    dec.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            if lvl != 0:
                dec.append(nnx.ConvTranspose(ch, ch, kernel_size=(2,) * spatial_dims,
                                             strides=(2,) * spatial_dims, rngs=rngs))
        dec.append(_gn(ch, norm_num_groups, norm_eps, rngs))
        dec.append(nnx.Conv(ch, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs))
        self.decoder = nnx.List(dec)
        self._rngs = rngs

    def _run(self, mods, x, final_silu_at: int = 2):
        n = len(mods)
        for i, m in enumerate(mods):
            if isinstance(m, nnx.GroupNorm) and i == n - 2:
                x = jax.nn.silu(m(x))
            else:
                x = m(x)
        return x

    def encode(self, x: jnp.ndarray):
        """→ (z_mu, z_sigma) channel-first (reference: autoencoderkl.py encode)."""
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        h = self._run(list(self.encoder), h)
        z_mu, z_logvar = jnp.split(h, 2, axis=-1)
        z_logvar = jnp.clip(z_logvar, -30.0, 20.0)
        z_sigma = jnp.exp(0.5 * z_logvar)
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(z_mu, perm_out), jnp.transpose(z_sigma, perm_out)

    def sampling(self, z_mu: jnp.ndarray, z_sigma: jnp.ndarray, key=None) -> jnp.ndarray:
        key = self._rngs.params() if key is None and hasattr(self._rngs, "params") else (
            key or jax.random.PRNGKey(0))
        eps = jax.random.normal(key, z_mu.shape, dtype=z_mu.dtype)
        return z_mu + z_sigma * eps

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, z.ndim)) + (1,)
        h = jnp.transpose(z, perm_in)
        h = self._run(list(self.decoder), h)
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(h, perm_out)

    def reconstruct(self, x: jnp.ndarray) -> jnp.ndarray:
        z_mu, _ = self.encode(x)
        return self.decode(z_mu)

    def __call__(self, x: jnp.ndarray):
        z_mu, z_sigma = self.encode(x)
        z = self.sampling(z_mu, z_sigma)
        return self.decode(z), z_mu, z_sigma

    def encode_stage_2_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        z_mu, z_sigma = self.encode(x)
        return self.sampling(z_mu, z_sigma)

    def decode_stage_2_outputs(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decode(z)


# ---------------------------------------------------------------------------
# Public building blocks (reference: autoencoderkl.py AEKLResBlock / AsymmetricPad /
# AEKLDownsample / Encoder / Decoder). AutoencoderKL above builds its stages as
# flat module lists; these expose the reference block granularity, channels-last.
# ---------------------------------------------------------------------------
AEKLResBlock = _ResBlock


class AsymmetricPad(nnx.Module):
    """Pad (0, 1) on every spatial dim — the reference pads asymmetrically before
    its stride-2 encoder conv (reference: autoencoderkl.py AsymmetricPad)."""

    def __init__(self, spatial_dims: int):
        self.spatial_dims = spatial_dims

    def __call__(self, x):
        pads = [(0, 0)] + [(0, 1)] * self.spatial_dims + [(0, 0)]
        return jnp.pad(x, pads)


class AEKLDownsample(nnx.Module):
    """Asymmetric pad + stride-2 VALID conv (reference: autoencoderkl.py AEKLDownsample)."""

    def __init__(self, spatial_dims: int, in_channels: int, *, rngs: nnx.Rngs):
        self.pad = AsymmetricPad(spatial_dims)
        self.conv = nnx.Conv(in_channels, in_channels, kernel_size=(3,) * spatial_dims,
                             strides=(2,) * spatial_dims, padding="VALID", rngs=rngs)

    def __call__(self, x):
        return self.conv(self.pad(x))


class Encoder(nnx.Module):
    """Standalone VAE encoder stage: the same res/attn/downsample stack
    AutoencoderKL builds inline (reference: autoencoderkl.py Encoder)."""

    def __init__(self, spatial_dims: int, in_channels: int, channels, out_channels: int,
                 num_res_blocks, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 attention_levels=None, with_nonlocal_attn: bool = True, *, rngs: nnx.Rngs):
        n_levels = len(channels)
        attention_levels = attention_levels or (False,) * n_levels
        mods = [nnx.Conv(in_channels, channels[0], kernel_size=(3,) * spatial_dims, rngs=rngs)]
        ch = channels[0]
        for lvl in range(n_levels):
            out_ch = channels[lvl]
            for _ in range(num_res_blocks[lvl] if not isinstance(num_res_blocks, int)
                           else num_res_blocks):
                mods.append(_ResBlock(spatial_dims, ch, out_ch, norm_num_groups, norm_eps, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    mods.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            if lvl != n_levels - 1:
                mods.append(AEKLDownsample(spatial_dims, ch, rngs=rngs))
        if with_nonlocal_attn:
            mods.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
            mods.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            mods.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
        mods.append(_gn(ch, norm_num_groups, norm_eps, rngs))
        mods.append(nnx.Conv(ch, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs))
        self.blocks = nnx.List(mods)

    def __call__(self, x):
        n = len(self.blocks)
        for i, m in enumerate(self.blocks):
            x = m(x)
            if isinstance(m, nnx.GroupNorm) and i == n - 2:
                x = jax.nn.silu(x)
        return x


class Decoder(nnx.Module):
    """Standalone VAE decoder stage (reference: autoencoderkl.py Decoder)."""

    def __init__(self, spatial_dims: int, channels, in_channels: int, out_channels: int,
                 num_res_blocks, norm_num_groups: int = 32, norm_eps: float = 1e-6,
                 attention_levels=None, with_nonlocal_attn: bool = True,
                 use_convtranspose: bool = False, *, rngs: nnx.Rngs):
        n_levels = len(channels)
        attention_levels = attention_levels or (False,) * n_levels
        ch = channels[-1]
        mods = [nnx.Conv(in_channels, ch, kernel_size=(3,) * spatial_dims, rngs=rngs)]
        if with_nonlocal_attn:
            mods.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
            mods.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            mods.append(_ResBlock(spatial_dims, ch, ch, norm_num_groups, norm_eps, rngs=rngs))
        for lvl in reversed(range(n_levels)):
            out_ch = channels[lvl]
            for _ in range((num_res_blocks[lvl] if not isinstance(num_res_blocks, int)
                            else num_res_blocks) + 1):
                mods.append(_ResBlock(spatial_dims, ch, out_ch, norm_num_groups, norm_eps, rngs=rngs))
                ch = out_ch
                if attention_levels[lvl]:
                    mods.append(_SpatialAttn(ch, norm_num_groups, norm_eps, rngs=rngs))
            if lvl != 0:
                mods.append(nnx.ConvTranspose(ch, ch, kernel_size=(2,) * spatial_dims,
                                              strides=(2,) * spatial_dims, rngs=rngs))
        mods.append(_gn(ch, norm_num_groups, norm_eps, rngs))
        mods.append(nnx.Conv(ch, out_channels, kernel_size=(3,) * spatial_dims, rngs=rngs))
        self.blocks = nnx.List(mods)

    def __call__(self, x):
        n = len(self.blocks)
        for i, m in enumerate(self.blocks):
            x = m(x)
            if isinstance(m, nnx.GroupNorm) and i == n - 2:
                x = jax.nn.silu(x)
        return x


__all__ += ["AEKLResBlock", "AsymmetricPad", "AEKLDownsample", "Encoder", "Decoder"]
