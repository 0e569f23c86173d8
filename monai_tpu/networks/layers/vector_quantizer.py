"""EMA vector quantizer (reference: monai/networks/layers/vector_quantizer.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["EMAQuantizer", "VectorQuantizer"]


class EMAQuantizer(nnx.Module):
    """VQ-VAE codebook with EMA updates (reference: vector_quantizer.py EMAQuantizer).

    Channel-last spatial input (B, *spatial, D) internally; public API channel-first.
    """

    def __init__(self, spatial_dims: int, num_embeddings: int, embedding_dim: int,
                 commitment_cost: float = 0.25, decay: float = 0.99, epsilon: float = 1e-5,
                 embedding_init: str = "normal", ddp_sync: bool = True, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.commitment_cost = commitment_cost
        self.decay = decay
        self.epsilon = epsilon
        key = rngs.params()
        if embedding_init == "normal":
            init = jax.random.normal(key, (num_embeddings, embedding_dim))
        else:
            init = jax.random.uniform(key, (num_embeddings, embedding_dim), minval=-1, maxval=1)
        self.embedding = nnx.Param(init)
        self.ema_cluster_size = nnx.Variable(jnp.zeros((num_embeddings,)))
        self.ema_w = nnx.Variable(init.copy())

    def quantize(self, inputs: jnp.ndarray):
        """inputs channel-first (B, D, *spatial) → (flat_encodings, indices)."""
        perm_in = (0,) + tuple(range(2, inputs.ndim)) + (1,)
        flat = jnp.transpose(inputs, perm_in).reshape(-1, self.embedding_dim)
        emb = self.embedding[...]
        d2 = (flat**2).sum(1, keepdims=True) - 2 * flat @ emb.T + (emb**2).sum(1)[None]
        indices = jnp.argmin(d2, axis=1)
        return flat, indices

    def embed(self, indices: jnp.ndarray, spatial_shape, batch: int):
        emb = self.embedding[...][indices]
        q = emb.reshape((batch,) + tuple(spatial_shape) + (self.embedding_dim,))
        perm_out = (0, q.ndim - 1) + tuple(range(1, q.ndim - 1))
        return jnp.transpose(q, perm_out)

    def __call__(self, inputs: jnp.ndarray):
        """Returns (quantized_st, loss, indices)."""
        batch = inputs.shape[0]
        spatial_shape = inputs.shape[2:]
        flat, indices = self.quantize(inputs)
        quantized = self.embed(indices, spatial_shape, batch)
        # EMA codebook update (training side effect)
        onehot = jax.nn.one_hot(indices, self.num_embeddings, dtype=flat.dtype)
        cluster_size = onehot.sum(0)
        dw = onehot.T @ flat
        self.ema_cluster_size[...] = self.ema_cluster_size[...] * self.decay + (1 - self.decay) * cluster_size
        self.ema_w[...] = self.ema_w[...] * self.decay + (1 - self.decay) * dw
        n = self.ema_cluster_size[...].sum()
        cluster_size_stable = ((self.ema_cluster_size[...] + self.epsilon)
                               / (n + self.num_embeddings * self.epsilon) * n)
        self.embedding[...] = self.ema_w[...] / cluster_size_stable[:, None]
        # losses
        e_latent_loss = jnp.mean((jax.lax.stop_gradient(quantized) - inputs) ** 2)
        loss = self.commitment_cost * e_latent_loss
        # straight-through estimator
        quantized_st = inputs + jax.lax.stop_gradient(quantized - inputs)
        indices = indices.reshape((batch,) + tuple(spatial_shape))
        return quantized_st, loss, indices


VectorQuantizer = EMAQuantizer
