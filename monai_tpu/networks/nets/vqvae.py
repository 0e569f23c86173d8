"""VQ-VAE (reference: monai/networks/nets/vqvae.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..layers.vector_quantizer import EMAQuantizer

__all__ = ["VQVAE"]


class _VQResUnit(nnx.Module):
    def __init__(self, spatial_dims, ch, res_ch, *, rngs):
        self.conv1 = nnx.Conv(ch, res_ch, kernel_size=(3,) * spatial_dims, rngs=rngs)
        self.conv2 = nnx.Conv(res_ch, ch, kernel_size=(3,) * spatial_dims, rngs=rngs)

    def __call__(self, x):
        h = jax.nn.relu(self.conv1(jax.nn.relu(x)))
        return x + self.conv2(h)


class VQVAE(nnx.Module):
    """(reference: vqvae.py VQVAE)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 channels: Sequence[int] = (96, 96, 192),
                 num_res_layers: int = 3, num_res_channels: Sequence[int] | int = (96, 96, 192),
                 downsample_parameters=((2, 4, 1, 1),) * 3, upsample_parameters=((2, 4, 1, 1, 0),) * 3,
                 num_embeddings: int = 32, embedding_dim: int = 64, embedding_init: str = "normal",
                 commitment_cost: float = 0.25, decay: float = 0.5, epsilon: float = 1e-5,
                 dropout: float = 0.0, ddp_sync: bool = True, use_checkpointing: bool = False,
                 *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.embedding_dim = embedding_dim
        self.num_embeddings = num_embeddings
        n_levels = len(channels)
        num_res_channels = ensure_tuple_rep(num_res_channels, n_levels)

        enc = []
        ch = in_channels
        for lvl in range(n_levels):
            stride = downsample_parameters[lvl][0] if isinstance(downsample_parameters[lvl], (tuple, list)) else 2
            enc.append(nnx.Conv(ch, channels[lvl], kernel_size=(4,) * spatial_dims,
                                strides=(stride,) * spatial_dims, rngs=rngs))
            ch = channels[lvl]
            for _ in range(num_res_layers):
                enc.append(_VQResUnit(spatial_dims, ch, num_res_channels[lvl], rngs=rngs))
        enc.append(nnx.Conv(ch, embedding_dim, kernel_size=(3,) * spatial_dims, rngs=rngs))
        self.encoder = nnx.List(enc)

        self.quantizer = EMAQuantizer(spatial_dims, num_embeddings, embedding_dim,
                                      commitment_cost, decay, epsilon, embedding_init, rngs=rngs)

        dec = [nnx.Conv(embedding_dim, channels[-1], kernel_size=(3,) * spatial_dims, rngs=rngs)]
        ch = channels[-1]
        for lvl in reversed(range(n_levels)):
            for _ in range(num_res_layers):
                dec.append(_VQResUnit(spatial_dims, ch, num_res_channels[lvl], rngs=rngs))
            out_ch = out_channels if lvl == 0 else channels[lvl - 1]
            stride = upsample_parameters[lvl][0] if isinstance(upsample_parameters[lvl], (tuple, list)) else 2
            dec.append(nnx.ConvTranspose(ch, out_ch, kernel_size=(4,) * spatial_dims,
                                         strides=(stride,) * spatial_dims, rngs=rngs))
            ch = out_ch
        self.decoder = nnx.List(dec)

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, images.ndim)) + (1,)
        h = jnp.transpose(images, perm_in)
        for m in self.encoder:
            h = m(h)
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(h, perm_out)

    def quantize(self, encodings: jnp.ndarray):
        quantized, loss, _ = self.quantizer(encodings)
        return quantized, loss

    def decode(self, quantizations: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, quantizations.ndim)) + (1,)
        h = jnp.transpose(quantizations, perm_in)
        for m in self.decoder:
            h = m(h)
        perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
        return jnp.transpose(h, perm_out)

    def index_quantize(self, images: jnp.ndarray) -> jnp.ndarray:
        _, _, indices = self.quantizer(self.encode(images))
        return indices

    def decode_samples(self, embedding_indices: jnp.ndarray) -> jnp.ndarray:
        b = embedding_indices.shape[0]
        spatial = embedding_indices.shape[1:]
        q = self.quantizer.embed(embedding_indices.reshape(-1), spatial, b)
        return self.decode(q)

    def __call__(self, images: jnp.ndarray):
        quantizations, quantization_losses = self.quantize(self.encode(images))
        reconstruction = self.decode(quantizations)
        return reconstruction, quantization_losses

    def encode_stage_2_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        z = self.encode(x)
        e, _ = self.quantize(z)
        return e

    def decode_stage_2_outputs(self, z: jnp.ndarray) -> jnp.ndarray:
        e, _ = self.quantize(z)
        return self.decode(e)


# Reference-name export (reference: vqvae.py VQVAEResidualUnit)
VQVAEResidualUnit = _VQResUnit
__all__ += ["VQVAEResidualUnit"]
