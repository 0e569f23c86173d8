"""Masked autoencoder ViT (reference: monai/networks/nets/masked_autoencoder_vit.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.attention import PatchEmbeddingBlock, TransformerBlock

__all__ = ["MaskedAutoEncoderViT"]


class MaskedAutoEncoderViT(nnx.Module):
    """MAE pretraining model (reference: masked_autoencoder_vit.py)."""

    def __init__(self, in_channels: int, img_size: Sequence[int] | int, patch_size: Sequence[int] | int,
                 hidden_size: int = 768, mlp_dim: int = 512, num_layers: int = 12, num_heads: int = 12,
                 masking_ratio: float = 0.75, decoder_hidden_size: int = 384, decoder_mlp_dim: int = 512,
                 decoder_num_layers: int = 4, decoder_num_heads: int = 12, proj_type: str = "conv",
                 pos_embed_type: str = "sincos", decoder_pos_embed_type: str = "sincos",
                 dropout_rate: float = 0.0, spatial_dims: int = 3, qkv_bias: bool = False,
                 save_attn: bool = False, *, rngs: nnx.Rngs):
        if not 0 < masking_ratio < 1:
            raise ValueError(f"masking_ratio should be in the range (0, 1), got {masking_ratio}.")
        self.masking_ratio = masking_ratio
        self.spatial_dims = spatial_dims
        img_size_ = ensure_tuple_rep(img_size, spatial_dims)
        patch_size_ = ensure_tuple_rep(patch_size, spatial_dims)
        self.patch_size = patch_size_
        self.patch_embedding = PatchEmbeddingBlock(in_channels, img_size_, patch_size_, hidden_size,
                                                   num_heads, proj_type, pos_embed_type, dropout_rate,
                                                   spatial_dims, rngs=rngs)
        self.n_patches = self.patch_embedding.n_patches
        self.blocks = nnx.List([
            TransformerBlock(hidden_size, mlp_dim, num_heads, dropout_rate, qkv_bias, rngs=rngs)
            for _ in range(num_layers)])
        self.norm = nnx.LayerNorm(hidden_size, rngs=rngs)
        key = rngs.params()
        self.cls_token = nnx.Param(jax.random.truncated_normal(key, -2, 2, (1, 1, hidden_size)) * 0.02)
        self.mask_token = nnx.Param(jnp.zeros((1, 1, decoder_hidden_size)))
        self.decoder_embed = nnx.Linear(hidden_size, decoder_hidden_size, rngs=rngs)
        self.decoder_pos_embed = nnx.Param(
            jax.random.truncated_normal(rngs.params(), -2, 2,
                                        (1, self.n_patches, decoder_hidden_size)) * 0.02)
        self.decoder_blocks = nnx.List([
            TransformerBlock(decoder_hidden_size, decoder_mlp_dim, decoder_num_heads, dropout_rate,
                             qkv_bias, rngs=rngs) for _ in range(decoder_num_layers)])
        self.decoder_norm = nnx.LayerNorm(decoder_hidden_size, rngs=rngs)
        out_dim = int(np.prod(patch_size_)) * in_channels
        self.decoder_pred = nnx.Linear(decoder_hidden_size, out_dim, rngs=rngs)
        self._rngs = rngs

    def _masking(self, x, masking_ratio: float | None = None, key=None):
        """Random token dropping; returns (kept_tokens, mask, ids_restore)."""
        b, n, d = x.shape
        ratio = masking_ratio or self.masking_ratio
        len_keep = max(int(n * (1 - ratio)), 1)
        key = self._rngs.params() if key is None and hasattr(self._rngs, "params") else (
            key or jax.random.PRNGKey(0))
        noise = jax.random.uniform(key, (b, n))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
        mask = jnp.ones((b, n))
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    def __call__(self, x, masking_ratio: float | None = None, key=None):
        """Returns (reconstructed_patches, mask) (reference: masked_autoencoder_vit.py)."""
        tokens = self.patch_embedding(x)
        tokens, mask, ids_restore = self._masking(tokens, masking_ratio, key)
        cls = jnp.broadcast_to(self.cls_token[...], (tokens.shape[0], 1, tokens.shape[2]))
        h = jnp.concatenate([cls, tokens], axis=1)
        for blk in self.blocks:
            h = blk(h)
        h = self.norm(h)
        # decoder
        h = self.decoder_embed(h)
        b, n_keep_plus1, d = h.shape
        n = self.n_patches
        mask_tokens = jnp.broadcast_to(self.mask_token[...], (b, n - (n_keep_plus1 - 1), d))
        h_no_cls = jnp.concatenate([h[:, 1:], mask_tokens], axis=1)
        h_no_cls = jnp.take_along_axis(h_no_cls, ids_restore[..., None], axis=1)
        h_dec = h_no_cls + self.decoder_pos_embed[...]
        for blk in self.decoder_blocks:
            h_dec = blk(h_dec)
        h_dec = self.decoder_norm(h_dec)
        pred = self.decoder_pred(h_dec)
        return pred, mask
