"""Decomposed relative positional embeddings (reference:
monai/networks/blocks/attention_utils.py get_rel_pos / add_decomposed_rel_pos,
rel_pos_embedding.py:21 DecomposedRelativePosEmbedding).

Per-axis rel-pos tables keep the cost O(d1+...+dn) and each axis contribution is
one einsum — XLA fuses the adds into the attention-logit computation."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["get_rel_pos", "add_decomposed_rel_pos", "DecomposedRelativePosEmbedding"]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice (and linearly resize if needed) an (L, C) rel-pos table to the
    (q_size, k_size) relative-coordinate grid (reference: attention_utils.py)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative_coords.astype(jnp.int32)]


def add_decomposed_rel_pos(attn: jnp.ndarray, q: jnp.ndarray, rel_pos_lst: Sequence,
                           q_size: Sequence[int], k_size: Sequence[int]) -> jnp.ndarray:
    """Add per-axis decomposed relative position terms to attention logits
    (reference: attention_utils.py add_decomposed_rel_pos; 2D and 3D)."""
    rh = get_rel_pos(q_size[0], k_size[0], rel_pos_lst[0])
    rw = get_rel_pos(q_size[1], k_size[1], rel_pos_lst[1])
    batch, _, dim = q.shape
    if len(rel_pos_lst) == 2:
        q_h, q_w = q_size[:2]
        k_h, k_w = k_size[:2]
        r_q = q.reshape(batch, q_h, q_w, dim)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
        attn = (attn.reshape(batch, q_h, q_w, k_h, k_w)
                + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
                ).reshape(batch, q_h * q_w, k_h * k_w)
    elif len(rel_pos_lst) == 3:
        q_h, q_w, q_d = q_size[:3]
        k_h, k_w, k_d = k_size[:3]
        rd = get_rel_pos(q_d, k_d, rel_pos_lst[2])
        r_q = q.reshape(batch, q_h, q_w, q_d, dim)
        rel_h = jnp.einsum("bhwdc,hkc->bhwdk", r_q, rh)
        rel_w = jnp.einsum("bhwdc,wkc->bhwdk", r_q, rw)
        rel_d = jnp.einsum("bhwdc,dkc->bhwdk", r_q, rd)
        attn = (attn.reshape(batch, q_h, q_w, q_d, k_h, k_w, k_d)
                + rel_h[:, :, :, :, :, None, None]
                + rel_w[:, :, :, :, None, :, None]
                + rel_d[:, :, :, :, None, None, :]
                ).reshape(batch, q_h * q_w * q_d, k_h * k_w * k_d)
    else:
        raise ValueError("only 2 or 3 spatial axes are supported.")
    return attn


class DecomposedRelativePosEmbedding(nnx.Module):
    """Learned per-axis rel-pos tables added to the attention matrix
    (reference: rel_pos_embedding.py:21)."""

    def __init__(self, s_input_dims: Sequence[int], c_dim: int, num_heads: int,
                 *, rngs: nnx.Rngs):
        if len(s_input_dims) not in (2, 3):
            raise ValueError("s_input_dims must be (H, W) or (H, W, D)")
        self.s_input_dims = tuple(s_input_dims)
        self.c_dim = c_dim
        self.num_heads = num_heads
        self.rel_pos_arr = nnx.List([
            nnx.Param(jnp.zeros((2 * d - 1, c_dim))) for d in s_input_dims])

    def __call__(self, x: jnp.ndarray, att_mat: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[0]
        dims = self.s_input_dims + (1,) * (3 - len(self.s_input_dims))
        h, w, d = dims
        size = (h, w) if d == 1 else (h, w, d)
        att = add_decomposed_rel_pos(
            att_mat.reshape(batch * self.num_heads, h * w * d, h * w * d),
            q.reshape(batch * self.num_heads, h * w * d, -1),
            [p.value for p in self.rel_pos_arr], size, size)
        return att.reshape(batch, self.num_heads, h * w * d, h * w * d)
