"""Stochastic depth (reference: monai/networks/layers/drop_path.py / utils DropPath)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["DropPath"]


class DropPath(nnx.Module):
    """Drop entire residual paths per sample during training
    (reference: drop_path-style stochastic depth used in Swin/ViT blocks)."""

    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True, *,
                 rngs: nnx.Rngs | None = None):
        self.drop_prob = float(drop_prob)
        self.scale_by_keep = scale_by_keep
        self._rngs = rngs

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.drop_prob == 0.0 or self._rngs is None:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self._rngs.dropout(), keep, shape).astype(x.dtype)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask
