"""Restormer: efficient transformer for high-resolution image restoration
(reference: monai/networks/nets/restormer.py:90 Restormer, :24 MDTATransformerBlock).

Channel-last internals; pixel-(un)shuffle down/upsampling expressed as reshapes
(space-to-depth) that XLA compiles to free layout changes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.cablock import CABlock, FeedForward

__all__ = ["Restormer", "MDTATransformerBlock", "OverlapPatchEmbed"]


def _pixel_unshuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Space-to-depth on channel-last x: (B, *S, C) -> (B, *S/r, C*r^d)."""
    b = x.shape[0]
    spatial = x.shape[1:-1]
    c = x.shape[-1]
    d = len(spatial)
    shape = [b]
    for s in spatial:
        shape += [s // r, r]
    shape.append(c)
    h = x.reshape(shape)
    # move the r factors next to channels
    perm = [0] + [1 + 2 * i for i in range(d)] + [2 + 2 * i for i in range(d)] + [1 + 2 * d]
    h = h.transpose(perm)
    return h.reshape((b,) + tuple(s // r for s in spatial) + (c * r ** d,))


def _pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Depth-to-space on channel-last x: (B, *S, C*r^d) -> (B, *S*r, C)."""
    b = x.shape[0]
    spatial = x.shape[1:-1]
    d = len(spatial)
    c = x.shape[-1] // (r ** d)
    h = x.reshape((b,) + tuple(spatial) + (r,) * d + (c,))
    perm = [0]
    for i in range(d):
        perm += [1 + i, 1 + d + i]
    perm.append(1 + 2 * d)
    h = h.transpose(perm)
    return h.reshape((b,) + tuple(s * r for s in spatial) + (c,))


class MDTATransformerBlock(nnx.Module):
    """Instance-norm + MDTA + GDFN with residuals (reference: restormer.py:24)."""

    def __init__(self, spatial_dims: int, dim: int, num_heads: int,
                 ffn_expansion_factor: float, bias: bool, layer_norm_use_bias: bool = False,
                 flash_attention: bool = False, *, rngs: nnx.Rngs):
        self.norm1 = nnx.GroupNorm(dim, num_groups=dim, use_bias=layer_norm_use_bias,
                                   use_scale=layer_norm_use_bias, rngs=rngs)
        self.attn = CABlock(spatial_dims, dim, num_heads, bias, flash_attention, rngs=rngs)
        self.norm2 = nnx.GroupNorm(dim, num_groups=dim, use_bias=layer_norm_use_bias,
                                   use_scale=layer_norm_use_bias, rngs=rngs)
        self.ffn = FeedForward(spatial_dims, dim, ffn_expansion_factor, bias, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + self.attn(self.norm1(x))
        return x + self.ffn(self.norm2(x))


class OverlapPatchEmbed(nnx.Module):
    """Overlapped 3x3 patch embedding (reference: restormer.py:61). Channel-last."""

    def __init__(self, spatial_dims: int, in_channels: int = 3, embed_dim: int = 48,
                 bias: bool = False, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(in_channels, embed_dim, kernel_size=(3,) * spatial_dims,
                             padding="SAME", use_bias=bias, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class Restormer(nnx.Module):
    """(reference: restormer.py:90). Channel-first public API."""

    def __init__(self, spatial_dims: int = 2, in_channels: int = 3, out_channels: int = 3,
                 dim: int = 48, num_blocks: tuple = (1, 1, 1, 1), heads: tuple = (1, 1, 1, 1),
                 num_refinement_blocks: int = 4, ffn_expansion_factor: float = 2.66,
                 bias: bool = False, layer_norm_use_bias: bool = True,
                 dual_pixel_task: bool = False, flash_attention: bool = False,
                 *, rngs: nnx.Rngs):
        if len(num_blocks) <= 1 or len(num_blocks) != len(heads) or min(num_blocks) < 1:
            raise ValueError("num_blocks must have >1 positive entries matching heads.")
        self.spatial_dims = spatial_dims
        num_steps = len(num_blocks) - 1
        self.num_steps = num_steps
        mult = 2 ** spatial_dims  # channel factor of one pixel-(un)shuffle
        self.patch_embed = OverlapPatchEmbed(spatial_dims, in_channels, dim, bias, rngs=rngs)

        def blocks(d, h, n):
            return nnx.List([MDTATransformerBlock(spatial_dims, d, h, ffn_expansion_factor,
                                                  bias, layer_norm_use_bias, flash_attention,
                                                  rngs=rngs) for _ in range(n)])

        enc, downs = [], []
        for n in range(num_steps):
            cur = dim * 2 ** n
            enc.append(blocks(cur, heads[n], num_blocks[n]))
            # conv to cur*2/mult then unshuffle (x mult) -> 2*cur channels at half res
            downs.append(nnx.Conv(cur, (cur * 2) // mult, kernel_size=(3,) * spatial_dims,
                                  padding="SAME", use_bias=bias, rngs=rngs))
        self.encoder_levels = nnx.List(enc)
        self.downsamples = nnx.List(downs)
        latent_dim = dim * 2 ** num_steps
        self.latent = blocks(latent_dim, heads[num_steps], num_blocks[num_steps])

        ups, dec, reduces = [], [], []
        for n in reversed(range(num_steps)):
            cur = dim * 2 ** n
            nxt = dim * 2 ** (n + 1)
            # conv nxt -> cur*mult then shuffle (/mult) -> cur channels at double res
            ups.append(nnx.Conv(nxt, cur * mult, kernel_size=(3,) * spatial_dims,
                                padding="SAME", use_bias=bias, rngs=rngs))
            if n != 0:
                reduces.append(nnx.Conv(nxt, cur, kernel_size=(1,) * spatial_dims,
                                        use_bias=bias, rngs=rngs))
                dec_dim = cur
            else:
                dec_dim = nxt
            dec.append(blocks(dec_dim, heads[n], num_blocks[n]))
        self.upsamples = nnx.List(ups)
        self.decoder_levels = nnx.List(dec)
        self.reduce_channels = nnx.List(reduces)
        self.refinement = blocks(dim * 2, heads[0], num_refinement_blocks)
        self.dual_pixel_task = dual_pixel_task
        if dual_pixel_task:
            self.skip_conv = nnx.Conv(dim, dim * 2, kernel_size=(1,) * spatial_dims,
                                      use_bias=bias, rngs=rngs)
        self.output = nnx.Conv(dim * 2, out_channels, kernel_size=(3,) * spatial_dims,
                               padding="SAME", use_bias=bias, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if any(s <= 2 ** self.num_steps for s in x.shape[2:]):
            raise ValueError("All spatial dims must exceed 2**num_steps.")
        h = jnp.transpose(x, (0,) + tuple(range(2, x.ndim)) + (1,))
        h = self.patch_embed(h)
        skips = []
        for enc, down in zip(self.encoder_levels, self.downsamples):
            for blk in enc:
                h = blk(h)
            skips.append(h)
            h = _pixel_unshuffle(down(h))
        for blk in self.latent:
            h = blk(h)
        for idx in range(len(self.decoder_levels)):
            h = _pixel_shuffle(self.upsamples[idx](h))
            h = jnp.concatenate([h, skips[-(idx + 1)]], axis=-1)
            if idx < len(self.decoder_levels) - 1:
                h = self.reduce_channels[idx](h)
            for blk in self.decoder_levels[idx]:
                h = blk(h)
        for blk in self.refinement:
            h = blk(h)
        if self.dual_pixel_task:
            h = h + self.skip_conv(skips[0])
        out = self.output(h)
        return jnp.transpose(out, (0, out.ndim - 1) + tuple(range(1, out.ndim - 1)))
