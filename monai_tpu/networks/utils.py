"""Network-related utilities.

Parity targets: monai/networks/utils.py (one_hot:170, normalize_transform:—, pixelshuffle:370,
copy_model_state:542, eval_mode/train_mode:458,493, meshgrid_ij:1071).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.backend import is_jax, xp

__all__ = ["one_hot", "pixelshuffle", "meshgrid_ij", "normal_init", "copy_model_state", "count_params"]


def one_hot(labels: Any, num_classes: int, dtype=jnp.float32, dim: int = 1) -> Any:
    """One-hot encode along ``dim`` assuming the current ``dim`` is singleton
    (reference: monai/networks/utils.py:170)."""
    ns = xp(labels)
    shape = list(labels.shape)
    if shape[dim] != 1:
        raise AssertionError("labels should have a channel with length equal to one.")
    labels_int = labels.astype(ns.int32)
    squeezed = ns.squeeze(labels_int, axis=dim)
    if ns is jnp:
        oh = jax.nn.one_hot(squeezed, num_classes, axis=dim, dtype=dtype)
    else:
        eye = np.eye(num_classes, dtype=dtype)
        oh = eye[squeezed]  # (..., num_classes) at the end
        oh = np.moveaxis(oh, -1, dim)
    return oh


def pixelshuffle(x: Any, spatial_dims: int, scale_factor: int) -> Any:
    """Depth-to-space upscaling for N-D (reference: monai/networks/utils.py:370)."""
    dim, factor = spatial_dims, scale_factor
    input_size = list(x.shape)
    batch_size, channels = input_size[:2]
    scale_divisor = factor**dim
    if channels % scale_divisor != 0:
        raise ValueError(f"Number of input channels ({channels}) must be evenly divisible by scale_factor ** dimensions ({factor}**{dim}={scale_divisor}).")
    org_channels = channels // scale_divisor
    output_size = [batch_size, org_channels] + [d * factor for d in input_size[2:]]
    ns = xp(x)
    indices = list(range(2, 2 + 2 * dim))
    indices = indices[dim:] + indices[:dim]
    permute_indices = [0, 1]
    for idx in range(dim):
        permute_indices.extend([indices[idx], indices[idx + dim]])
    x = x.reshape([batch_size, org_channels] + [factor] * dim + input_size[2:])
    x = ns.transpose(x, permute_indices[:2] + [i for pair in zip(range(2 + dim, 2 + 2 * dim), range(2, 2 + dim)) for i in pair])
    return x.reshape(output_size)


def meshgrid_ij(*tensors):
    ns = jnp if any(is_jax(t) for t in tensors) else np
    return ns.meshgrid(*tensors, indexing="ij")


def normal_init(key, shape, std: float = 0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def copy_model_state(dst_params: dict, src_params: dict, exclude_vars: str = "",
                     inplace: bool = True) -> tuple[dict, list, list]:
    """Copy matching-named, matching-shaped leaves between parameter pytrees
    (reference: monai/networks/utils.py:542)."""
    import re

    flat_src = _flatten_dict(src_params)
    flat_dst = _flatten_dict(dst_params)
    to_skip = {k for k in flat_dst if exclude_vars and re.compile(exclude_vars).search(k)}
    updated, unchanged = [], []
    out = dict(flat_dst)
    for k, v in flat_dst.items():
        if k in to_skip or k not in flat_src:
            unchanged.append(k)
            continue
        s = flat_src[k]
        if hasattr(s, "shape") and hasattr(v, "shape") and tuple(s.shape) == tuple(v.shape):
            out[k] = s
            updated.append(k)
        else:
            unchanged.append(k)
    return _unflatten_dict(out), updated, unchanged


def _flatten_dict(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_dict(v, key))
        else:
            out[key] = v
    return out


def _unflatten_dict(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params) if hasattr(p, "shape"))
