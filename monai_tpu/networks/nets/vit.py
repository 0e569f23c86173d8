"""ViT and ViTAutoEnc (reference: monai/networks/nets/vit.py:25, vitautoenc.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.attention import PatchEmbeddingBlock, TransformerBlock

__all__ = ["ViT", "ViTAutoEnc"]


class ViT(nnx.Module):
    """Vision transformer for 2D/3D (reference: vit.py:25)."""

    def __init__(self, in_channels: int, img_size: Sequence[int] | int, patch_size: Sequence[int] | int,
                 hidden_size: int = 768, mlp_dim: int = 3072, num_layers: int = 12, num_heads: int = 12,
                 proj_type: str = "conv", pos_embed_type: str = "learnable", classification: bool = False,
                 num_classes: int = 2, dropout_rate: float = 0.0, spatial_dims: int = 3,
                 post_activation: str = "Tanh", qkv_bias: bool = False, save_attn: bool = False,
                 *, rngs: nnx.Rngs):
        self.classification = classification
        self.patch_embedding = PatchEmbeddingBlock(in_channels, img_size, patch_size, hidden_size,
                                                   num_heads, proj_type, pos_embed_type, dropout_rate,
                                                   spatial_dims, rngs=rngs)
        self.blocks = nnx.List([
            TransformerBlock(hidden_size, mlp_dim, num_heads, dropout_rate, qkv_bias, save_attn, rngs=rngs)
            for _ in range(num_layers)
        ])
        self.norm = nnx.LayerNorm(hidden_size, rngs=rngs)
        if classification:
            import jax

            self.cls_token = nnx.Param(jnp.zeros((1, 1, hidden_size)))
            self.classification_head = nnx.Linear(hidden_size, num_classes, rngs=rngs)
            self.post_activation = post_activation

    def __call__(self, x):
        x = self.patch_embedding(x)
        if self.classification:
            cls = jnp.broadcast_to(self.cls_token[...], (x.shape[0], 1, x.shape[2]))
            x = jnp.concatenate([cls, x], axis=1)
        hidden_states_out = []
        for blk in self.blocks:
            x = blk(x)
            hidden_states_out.append(x)
        x = self.norm(x)
        if self.classification:
            out = self.classification_head(x[:, 0])
            if self.post_activation == "Tanh":
                out = jnp.tanh(out)
            return out, hidden_states_out
        return x, hidden_states_out


class ViTAutoEnc(nnx.Module):
    """ViT with a conv decoder for self-supervised pretraining
    (reference: vitautoenc.py)."""

    def __init__(self, in_channels: int, img_size: Sequence[int] | int, patch_size: Sequence[int] | int,
                 out_channels: int = 1, deconv_chns: int = 16, hidden_size: int = 768,
                 mlp_dim: int = 3072, num_layers: int = 12, num_heads: int = 12, proj_type: str = "conv",
                 dropout_rate: float = 0.0, spatial_dims: int = 3, qkv_bias: bool = False,
                 save_attn: bool = False, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        img_size_ = ensure_tuple_rep(img_size, spatial_dims)
        self.patch_size = ensure_tuple_rep(patch_size, spatial_dims)
        self.grid = tuple(i // p for i, p in zip(img_size_, self.patch_size))
        self.patch_embedding = PatchEmbeddingBlock(in_channels, img_size_, self.patch_size, hidden_size,
                                                   num_heads, proj_type, "learnable", dropout_rate,
                                                   spatial_dims, rngs=rngs)
        self.blocks = nnx.List([
            TransformerBlock(hidden_size, mlp_dim, num_heads, dropout_rate, qkv_bias, save_attn, rngs=rngs)
            for _ in range(num_layers)
        ])
        self.norm = nnx.LayerNorm(hidden_size, rngs=rngs)
        up_kernel = self.patch_size
        self.conv3d_transpose = nnx.ConvTranspose(hidden_size, deconv_chns, kernel_size=up_kernel,
                                                  strides=up_kernel, rngs=rngs)
        self.conv3d_transpose_1 = nnx.ConvTranspose(deconv_chns, out_channels, kernel_size=(1,) * spatial_dims,
                                                    strides=(1,) * spatial_dims, rngs=rngs)

    def __call__(self, x):
        spatial_size = x.shape[2:]
        x = self.patch_embedding(x)
        hidden_states_out = []
        for blk in self.blocks:
            x = blk(x)
            hidden_states_out.append(x)
        x = self.norm(x)
        grid = tuple(s // p for s, p in zip(spatial_size, self.patch_size))
        x = x.reshape((x.shape[0],) + grid + (x.shape[-1],))
        x = self.conv3d_transpose(x)
        x = self.conv3d_transpose_1(x)
        perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm), hidden_states_out
