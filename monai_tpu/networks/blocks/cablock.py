"""Channel-attention (MDTA) and gated-dconv FFN (GDFN) blocks for Restormer
(reference: monai/networks/blocks/cablock.py:27 FeedForward, :78 CABlock).

MDTA attends over the CHANNEL axis (tokens = spatial positions), so the attention
matrix is (heads, c, c) regardless of resolution — a small MXU matmul even for
high-resolution restoration inputs. Channel-last internals.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["CABlock", "FeedForward"]


class FeedForward(nnx.Module):
    """Gated-DConv feed-forward (reference: cablock.py:27). Channel-last."""

    def __init__(self, spatial_dims: int, dim: int, ffn_expansion_factor: float, bias: bool,
                 *, rngs: nnx.Rngs):
        hidden = int(dim * ffn_expansion_factor)
        self.project_in = nnx.Conv(dim, hidden * 2, kernel_size=(1,) * spatial_dims,
                                   use_bias=bias, rngs=rngs)
        self.dwconv = nnx.Conv(hidden * 2, hidden * 2, kernel_size=(3,) * spatial_dims,
                               padding="SAME", feature_group_count=hidden * 2,
                               use_bias=bias, rngs=rngs)
        self.project_out = nnx.Conv(hidden, dim, kernel_size=(1,) * spatial_dims,
                                    use_bias=bias, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.dwconv(self.project_in(x))
        x1, x2 = jnp.split(h, 2, axis=-1)
        return self.project_out(jax.nn.gelu(x1) * x2)


class CABlock(nnx.Module):
    """Multi-DConv-head transposed (channel) attention (reference: cablock.py:78).
    Channel-last."""

    def __init__(self, spatial_dims: int, dim: int, num_heads: int, bias: bool,
                 flash_attention: bool = False, *, rngs: nnx.Rngs):
        if dim % num_heads:
            raise ValueError("dim must be divisible by num_heads")
        self.num_heads = num_heads
        self.temperature = nnx.Param(jnp.ones((num_heads, 1, 1)))
        self.qkv = nnx.Conv(dim, dim * 3, kernel_size=(1,) * spatial_dims, use_bias=bias,
                            rngs=rngs)
        self.qkv_dwconv = nnx.Conv(dim * 3, dim * 3, kernel_size=(3,) * spatial_dims,
                                   padding="SAME", feature_group_count=dim * 3,
                                   use_bias=bias, rngs=rngs)
        self.project_out = nnx.Conv(dim, dim, kernel_size=(1,) * spatial_dims, use_bias=bias,
                                    rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        qkv = self.qkv_dwconv(self.qkv(x))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n = 1
        for s in spatial:
            n *= s

        def heads(t):
            # (B, *spatial, C) -> (B, heads, c_per_head, N)
            t = t.reshape(b, n, self.num_heads, c // self.num_heads)
            return t.transpose(0, 2, 3, 1)

        qh, kh, vh = heads(q), heads(k), heads(v)
        qh = qh / (jnp.linalg.norm(qh, axis=-1, keepdims=True) + 1e-12)
        kh = kh / (jnp.linalg.norm(kh, axis=-1, keepdims=True) + 1e-12)
        attn = jax.nn.softmax((qh @ kh.transpose(0, 1, 3, 2)) * self.temperature.value, axis=-1)
        out = attn @ vh  # (B, heads, c_per_head, N)
        out = out.transpose(0, 3, 1, 2).reshape(b, *spatial, c)
        return self.project_out(out)
