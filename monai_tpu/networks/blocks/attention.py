"""Attention & transformer blocks.

Parity targets: monai/networks/blocks/{mlp.py, selfattention.py:26 SABlock,
crossattention.py, transformerblock.py, patchembedding.py:32,141}.

Attention uses jax.nn.dot_product_attention (XLA lowers to fused attention on TPU).
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep

__all__ = ["MLPBlock", "SABlock", "CrossAttentionBlock", "TransformerBlock",
           "PatchEmbeddingBlock", "PatchEmbed"]


class MLPBlock(nnx.Module):
    """Transformer MLP (reference: blocks/mlp.py)."""

    def __init__(self, hidden_size: int, mlp_dim: int, dropout_rate: float = 0.0,
                 act: str = "GELU", dropout_mode: str = "vit", *, rngs: nnx.Rngs):
        mlp_dim = mlp_dim or hidden_size * 4
        self.linear1 = nnx.Linear(hidden_size, mlp_dim, rngs=rngs)
        self.linear2 = nnx.Linear(mlp_dim, hidden_size, rngs=rngs)
        self.drop1 = nnx.Dropout(dropout_rate, rngs=rngs)
        self.drop2 = nnx.Dropout(dropout_rate, rngs=rngs)
        from ..layers.factories import get_act_fn

        self.act = get_act_fn(act)

    def __call__(self, x):
        x = self.drop1(self.act(self.linear1(x)))
        return self.drop2(self.linear2(x))


class SABlock(nnx.Module):
    """Multi-head self-attention (reference: blocks/selfattention.py:26)."""

    def __init__(self, hidden_size: int, num_heads: int, dropout_rate: float = 0.0,
                 qkv_bias: bool = False, save_attn: bool = False, dim_head: int | None = None,
                 causal: bool = False, *, rngs: nnx.Rngs):
        if hidden_size % num_heads != 0:
            raise ValueError("hidden size should be divisible by num_heads.")
        self.num_heads = num_heads
        self.dim_head = hidden_size // num_heads if dim_head is None else dim_head
        inner = self.dim_head * num_heads
        self.qkv = nnx.Linear(hidden_size, inner * 3, use_bias=qkv_bias, rngs=rngs)
        self.out_proj = nnx.Linear(inner, hidden_size, rngs=rngs)
        self.drop = nnx.Dropout(dropout_rate, rngs=rngs)
        self.causal = causal

    def __call__(self, x):
        b, n, _ = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
        out = jax.nn.dot_product_attention(q, k, v, is_causal=self.causal)
        out = out.reshape(b, n, self.num_heads * self.dim_head)
        return self.drop(self.out_proj(out))


class CrossAttentionBlock(nnx.Module):
    """Multi-head cross-attention (reference: blocks/crossattention.py)."""

    def __init__(self, hidden_size: int, num_heads: int, dropout_rate: float = 0.0,
                 qkv_bias: bool = False, context_input_size: int | None = None,
                 dim_head: int | None = None, causal: bool = False, *, rngs: nnx.Rngs):
        if hidden_size % num_heads != 0:
            raise ValueError("hidden size should be divisible by num_heads.")
        self.num_heads = num_heads
        self.dim_head = hidden_size // num_heads if dim_head is None else dim_head
        inner = self.dim_head * num_heads
        context_input_size = context_input_size or hidden_size
        self.to_q = nnx.Linear(hidden_size, inner, use_bias=qkv_bias, rngs=rngs)
        self.to_k = nnx.Linear(context_input_size, inner, use_bias=qkv_bias, rngs=rngs)
        self.to_v = nnx.Linear(context_input_size, inner, use_bias=qkv_bias, rngs=rngs)
        self.out_proj = nnx.Linear(inner, hidden_size, rngs=rngs)
        self.drop = nnx.Dropout(dropout_rate, rngs=rngs)
        self.causal = causal

    def __call__(self, x, context=None):
        b, n, _ = x.shape
        context = x if context is None else context
        m = context.shape[1]
        q = self.to_q(x).reshape(b, n, self.num_heads, self.dim_head)
        k = self.to_k(context).reshape(b, m, self.num_heads, self.dim_head)
        v = self.to_v(context).reshape(b, m, self.num_heads, self.dim_head)
        out = jax.nn.dot_product_attention(q, k, v, is_causal=self.causal)
        out = out.reshape(b, n, self.num_heads * self.dim_head)
        return self.drop(self.out_proj(out))


class TransformerBlock(nnx.Module):
    """Pre-norm transformer block (reference: blocks/transformerblock.py)."""

    def __init__(self, hidden_size: int, mlp_dim: int, num_heads: int, dropout_rate: float = 0.0,
                 qkv_bias: bool = False, save_attn: bool = False, causal: bool = False,
                 with_cross_attention: bool = False, *, rngs: nnx.Rngs):
        self.norm1 = nnx.LayerNorm(hidden_size, rngs=rngs)
        self.attn = SABlock(hidden_size, num_heads, dropout_rate, qkv_bias, save_attn,
                            causal=causal, rngs=rngs)
        self.norm2 = nnx.LayerNorm(hidden_size, rngs=rngs)
        self.mlp = MLPBlock(hidden_size, mlp_dim, dropout_rate, rngs=rngs)
        self.with_cross_attention = with_cross_attention
        if with_cross_attention:
            self.norm_cross = nnx.LayerNorm(hidden_size, rngs=rngs)
            self.cross_attn = CrossAttentionBlock(hidden_size, num_heads, dropout_rate, qkv_bias,
                                                  rngs=rngs)

    def __call__(self, x, context=None):
        x = x + self.attn(self.norm1(x))
        if self.with_cross_attention:
            x = x + self.cross_attn(self.norm_cross(x), context=context)
        x = x + self.mlp(self.norm2(x))
        return x


class PatchEmbeddingBlock(nnx.Module):
    """Image → patch token embedding (reference: blocks/patchembedding.py:32).

    Input channel-first (B, C, *spatial); output (B, N, hidden).
    """

    def __init__(self, in_channels: int, img_size: Sequence[int] | int, patch_size: Sequence[int] | int,
                 hidden_size: int, num_heads: int = 12, proj_type: str = "conv", pos_embed_type: str = "learnable",
                 dropout_rate: float = 0.0, spatial_dims: int = 3, *, rngs: nnx.Rngs):
        if not (0 <= dropout_rate <= 1):
            raise ValueError(f"dropout_rate {dropout_rate} should be between 0 and 1.")
        if hidden_size % num_heads != 0:
            raise ValueError(f"hidden size {hidden_size} should be divisible by num_heads {num_heads}.")
        img_size_ = ensure_tuple_rep(img_size, spatial_dims)
        patch_size_ = ensure_tuple_rep(patch_size, spatial_dims)
        for m, p in zip(img_size_, patch_size_):
            if m < p:
                raise ValueError("patch_size should be smaller than img_size.")
        self.spatial_dims = spatial_dims
        self.patch_size = patch_size_
        self.n_patches = int(np.prod([im_d // p_d for im_d, p_d in zip(img_size_, patch_size_)]))
        self.proj_type = proj_type
        if proj_type == "conv":
            self.patch_embeddings = nnx.Conv(in_channels, hidden_size, kernel_size=patch_size_,
                                             strides=patch_size_, padding="VALID", rngs=rngs)
        else:  # perceptron: flatten patches then linear
            self.patch_dim = int(in_channels * np.prod(patch_size_))
            self.patch_embeddings = nnx.Linear(self.patch_dim, hidden_size, rngs=rngs)
        key = rngs.params()
        self.position_embeddings = nnx.Param(
            jax.random.truncated_normal(key, -2.0, 2.0, (1, self.n_patches, hidden_size)) * 0.02)
        self.dropout = nnx.Dropout(dropout_rate, rngs=rngs)

    def __call__(self, x):
        # channel-first input → channel-last
        perm = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm)
        if self.proj_type == "conv":
            x = self.patch_embeddings(x)
            x = x.reshape(x.shape[0], -1, x.shape[-1])
        else:
            b = x.shape[0]
            spatial = x.shape[1:-1]
            c = x.shape[-1]
            grid = [s // p for s, p in zip(spatial, self.patch_size)]
            # reshape into patches: interleave (g, p) per dim
            shape = [b]
            for g, p in zip(grid, self.patch_size):
                shape += [g, p]
            shape += [c]
            x = x.reshape(shape)
            d = self.spatial_dims
            perm2 = [0] + [1 + 2 * i for i in range(d)] + [2 + 2 * i for i in range(d)] + [1 + 2 * d]
            x = jnp.transpose(x, perm2)
            x = x.reshape(b, int(np.prod(grid)), -1)
            x = self.patch_embeddings(x)
        x = x + self.position_embeddings[...]
        return self.dropout(x)


class PatchEmbed(nnx.Module):
    """Patch embedding keeping the spatial layout (Swin-style)
    (reference: blocks/patchembedding.py:141).  Channel-last in/out."""

    def __init__(self, patch_size: Sequence[int] | int = 2, in_chans: int = 1, embed_dim: int = 48,
                 norm_layer: bool = False, spatial_dims: int = 3, *, rngs: nnx.Rngs):
        patch_size_ = ensure_tuple_rep(patch_size, spatial_dims)
        self.patch_size = patch_size_
        self.proj = nnx.Conv(in_chans, embed_dim, kernel_size=patch_size_, strides=patch_size_,
                             padding="VALID", rngs=rngs)
        self.norm = nnx.LayerNorm(embed_dim, rngs=rngs) if norm_layer else None

    def __call__(self, x):
        # pad spatial dims to multiples of patch size
        pads = [(0, 0)]
        for d, p in zip(x.shape[1:-1], self.patch_size):
            pads.append((0, (p - d % p) % p))
        pads.append((0, 0))
        if any(p[1] for p in pads):
            x = jnp.pad(x, pads)
        x = self.proj(x)
        if self.norm is not None:
            x = self.norm(x)
        return x
