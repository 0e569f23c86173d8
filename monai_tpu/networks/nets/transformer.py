"""Decoder-only transformer for autoregressive token modeling
(reference: monai/networks/nets/transformer.py DecoderOnlyTransformer)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.attention import TransformerBlock

__all__ = ["DecoderOnlyTransformer"]


class DecoderOnlyTransformer(nnx.Module):
    """(reference: transformer.py DecoderOnlyTransformer)."""

    def __init__(self, num_tokens: int, max_seq_len: int, attn_layers_dim: int,
                 attn_layers_depth: int, attn_layers_heads: int, with_cross_attention: bool = False,
                 embedding_dropout_rate: float = 0.0, include_fc: bool = True,
                 use_combined_linear: bool = False, use_flash_attention: bool = False,
                 *, rngs: nnx.Rngs):
        self.num_tokens = num_tokens
        self.max_seq_len = max_seq_len
        self.token_embeddings = nnx.Embed(num_tokens, attn_layers_dim, rngs=rngs)
        self.position_embeddings = nnx.Embed(max_seq_len, attn_layers_dim, rngs=rngs)
        self.embedding_dropout = nnx.Dropout(embedding_dropout_rate, rngs=rngs)
        self.blocks = nnx.List([
            TransformerBlock(attn_layers_dim, attn_layers_dim * 4, attn_layers_heads,
                             qkv_bias=False, causal=True, with_cross_attention=with_cross_attention,
                             rngs=rngs)
            for _ in range(attn_layers_depth)
        ])
        self.to_logits = nnx.Linear(attn_layers_dim, num_tokens, rngs=rngs)

    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None = None) -> jnp.ndarray:
        tok_emb = self.token_embeddings(x)
        positions = jnp.arange(x.shape[1])
        pos_emb = self.position_embeddings(positions)[None]
        h = self.embedding_dropout(tok_emb + pos_emb)
        for block in self.blocks:
            h = block(h, context=context)
        return self.to_logits(h)


class AbsolutePositionalEmbedding(nnx.Module):
    """Learned absolute position embedding over token indices
    (reference: transformer.py:22)."""

    def __init__(self, max_seq_len: int, embedding_dim: int, *, rngs: nnx.Rngs):
        self.max_seq_len = max_seq_len
        self.embedding_dim = embedding_dim
        self.embedding = nnx.Embed(max_seq_len, embedding_dim, rngs=rngs)

    def __call__(self, x):
        seq_len = x.shape[1]
        positions = jnp.broadcast_to(jnp.arange(seq_len), (x.shape[0], seq_len))
        return self.embedding(positions)


__all__ += ["AbsolutePositionalEmbedding"]
