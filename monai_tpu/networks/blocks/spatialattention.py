"""Spatial self-attention block over flattened spatial positions
(reference: monai/networks/blocks/spatialattention.py:22 SpatialAttentionBlock).
Channel-last internals."""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from .attention import SABlock

__all__ = ["SpatialAttentionBlock"]


class SpatialAttentionBlock(nnx.Module):
    """GroupNorm + multi-head self-attention across all spatial positions, residual
    (reference: spatialattention.py:22)."""

    def __init__(self, spatial_dims: int, num_channels: int,
                 num_head_channels: int | None = None, norm_num_groups: int = 32,
                 norm_eps: float = 1e-6, attention_dtype=None, include_fc: bool = True,
                 use_combined_linear: bool = False, use_flash_attention: bool = False,
                 *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        if num_head_channels is not None and num_channels % num_head_channels != 0:
            raise ValueError("num_channels must be divisible by num_head_channels")
        g = min(norm_num_groups, num_channels)
        while num_channels % g:
            g -= 1
        self.norm = nnx.GroupNorm(num_channels, num_groups=g, epsilon=norm_eps, rngs=rngs)
        heads = num_channels // num_head_channels if num_head_channels is not None else 1
        self.attn = SABlock(num_channels, heads, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        h = self.norm(x).reshape(b, -1, c)
        h = self.attn(h)
        return residual + h.reshape((b,) + spatial + (c,))
