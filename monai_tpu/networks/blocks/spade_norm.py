"""Spatially-adaptive normalization (reference: monai/networks/blocks/spade_norm.py:22).

Channel-last internals: the semantic map is resized to the activation's spatial shape
with nearest-neighbor `jax.image.resize`, then two small convs produce per-voxel
gamma/beta applied on top of a parameter-free base norm.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.factories import get_norm_layer
from .convolutions import Convolution

__all__ = ["SPADE"]


class SPADE(nnx.Module):
    """(reference: spade_norm.py:22). Operates on channel-last activations."""

    def __init__(self, label_nc: int, norm_nc: int, kernel_size: int = 3,
                 spatial_dims: int = 2, hidden_channels: int = 64,
                 norm: str | tuple = "INSTANCE", norm_params: dict | None = None,
                 *, rngs: nnx.Rngs):
        if norm_params:
            norm = (norm, norm_params)
        self.param_free_norm = get_norm_layer(norm, spatial_dims, norm_nc, rngs=rngs)
        self.mlp_shared = Convolution(spatial_dims, label_nc, hidden_channels,
                                      kernel_size=kernel_size, norm=None,
                                      act="LEAKYRELU", rngs=rngs)
        self.mlp_gamma = Convolution(spatial_dims, hidden_channels, norm_nc,
                                     kernel_size=kernel_size, act=None, rngs=rngs)
        self.mlp_beta = Convolution(spatial_dims, hidden_channels, norm_nc,
                                    kernel_size=kernel_size, act=None, rngs=rngs)

    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        """x: (B, *spatial, C); segmap: (B, *spatial', label_nc) — resized to x's shape."""
        normalized = self.param_free_norm(x)
        target = (segmap.shape[0],) + x.shape[1:-1] + (segmap.shape[-1],)
        if segmap.shape[1:-1] != x.shape[1:-1]:
            segmap = jax.image.resize(segmap, target, method="nearest")
        actv = self.mlp_shared(segmap)
        gamma = self.mlp_gamma(actv)
        beta = self.mlp_beta(actv)
        return normalized * (1 + gamma) + beta
