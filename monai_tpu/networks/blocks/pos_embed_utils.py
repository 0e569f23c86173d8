"""Fixed sin-cos position embeddings (reference:
monai/networks/blocks/pos_embed_utils.py build_sincos_position_embedding)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp

from ...utils.misc import ensure_tuple_rep

__all__ = ["build_sincos_position_embedding"]


def build_sincos_position_embedding(grid_size: int | Sequence[int], embed_dim: int,
                                    spatial_dims: int = 3,
                                    temperature: float = 10000.0) -> jnp.ndarray:
    """(1, prod(grid), embed_dim) sin-cos table; per-axis sin/cos interleave
    (reference: pos_embed_utils.py; SelfMedMAE scheme)."""
    grid = ensure_tuple_rep(grid_size, spatial_dims)
    divisor = 2 * spatial_dims
    if embed_dim % divisor != 0:
        raise AssertionError(
            f"Embed dimension must be divisible by {divisor} for {spatial_dims}D "
            "sin-cos position embedding")
    pos_dim = embed_dim // divisor
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    axes = jnp.meshgrid(*[jnp.arange(g, dtype=jnp.float32) for g in grid], indexing="ij")
    # reference concatenation order: w-axis first, then h, then d
    order = [1, 0] + list(range(2, spatial_dims))
    parts = []
    for ax in order:
        out = jnp.einsum("m,d->md", axes[ax].reshape(-1), omega)
        parts.extend([jnp.sin(out), jnp.cos(out)])
    return jnp.concatenate(parts, axis=1)[None]
