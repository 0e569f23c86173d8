"""Text-to-vision embedding block (reference: monai/networks/blocks/text_embedding.py
TextEncoder).

The reference downloads pre-computed CLIP text embeddings for 32/48/105-class organ
vocabularies; this environment is zero-egress, so embeddings either come from a local
``.npz`` file or initialize randomly (random init documented, useful for training from
scratch)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["TextEncoder"]


class TextEncoder(nnx.Module):
    """Fixed text embedding table projected per pixel (reference: text_embedding.py)."""

    def __init__(self, out_channels: int, spatial_dims: int = 3, text_dim: int = 512,
                 hidden_size: int = 256, encoding: str = "rand_embedding",
                 pretrained_path: str | None = None, *, rngs: nnx.Rngs):
        self.encoding = encoding
        self.spatial_dims = spatial_dims
        if encoding == "rand_embedding":
            self.text_embedding = nnx.Param(
                0.02 * jax.random.normal(rngs.params(), (out_channels, hidden_size)))
        else:
            if pretrained_path is None:
                raise ValueError(
                    f"encoding '{encoding}' needs pre-computed CLIP embeddings; downloads "
                    "are unavailable (zero egress), so pass pretrained_path to a local "
                    ".npy/.npz file of shape (out_channels, text_dim).")
            arr = np.load(pretrained_path)
            if hasattr(arr, "files"):
                arr = arr[arr.files[0]]
            self.register = nnx.Param(jnp.asarray(arr, jnp.float32))
            self.text_to_vision = nnx.Linear(text_dim, hidden_size, rngs=rngs)
            self.text_embedding = None

    def __call__(self) -> jnp.ndarray:
        """Returns (out_channels, hidden_size, 1, ...) embeddings broadcastable over space."""
        if self.encoding == "rand_embedding":
            emb = self.text_embedding.value
        else:
            emb = jax.nn.relu(self.text_to_vision(self.register.value))
        return emb.reshape(emb.shape + (1,) * self.spatial_dims)
