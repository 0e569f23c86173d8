"""Conditional random field with mean-field iterations (reference:
monai/networks/blocks/crf.py:23 — built on the PHL filter)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.filtering import phl_filter

__all__ = ["CRF"]


class CRF:
    """Mean-field CRF refinement of segmentation logits (reference: crf.py:23)."""

    def __init__(self, iterations: int = 5, bilateral_weight: float = 1.0, gaussian_weight: float = 1.0,
                 bilateral_spatial_sigma: float = 5.0, bilateral_color_sigma: float = 0.5,
                 gaussian_spatial_sigma: float = 5.0, update_factor: float = 3.0,
                 compatibility_matrix=None):
        self.iterations = iterations
        self.bilateral_weight = bilateral_weight
        self.gaussian_weight = gaussian_weight
        self.bilateral_spatial_sigma = bilateral_spatial_sigma
        self.bilateral_color_sigma = bilateral_color_sigma
        self.gaussian_spatial_sigma = gaussian_spatial_sigma
        self.update_factor = update_factor
        self.compatibility_matrix = compatibility_matrix

    def __call__(self, input_tensor: jnp.ndarray, reference_tensor: jnp.ndarray) -> jnp.ndarray:
        """input_tensor: (B, C, *spatial) logits; reference_tensor: (B, F, *spatial) image."""
        spatial_dim = input_tensor.ndim - 2
        # spatial feature coordinates
        spatial = input_tensor.shape[2:]
        mesh = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial],
                                      indexing="ij"))
        b = input_tensor.shape[0]
        spatial_features = jnp.broadcast_to(mesh[None], (b,) + mesh.shape)
        bilateral_features = jnp.concatenate(
            [spatial_features / self.bilateral_spatial_sigma,
             reference_tensor / self.bilateral_color_sigma], axis=1)
        gaussian_features = spatial_features / self.gaussian_spatial_sigma
        output = jax.nn.softmax(input_tensor, axis=1)
        for _ in range(self.iterations):
            bilateral_output = phl_filter(output, bilateral_features)
            gaussian_output = phl_filter(output, gaussian_features)
            combined = (self.bilateral_weight * bilateral_output
                        + self.gaussian_weight * gaussian_output)
            if self.compatibility_matrix is not None:
                flat = combined.reshape(combined.shape[0], combined.shape[1], -1)
                flat = jnp.einsum("ij,bjn->bin", self.compatibility_matrix, flat)
                combined = flat.reshape(combined.shape)
            output = jax.nn.softmax(input_tensor + self.update_factor * combined, axis=1)
        return output
