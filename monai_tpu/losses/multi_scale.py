"""Multi-scale loss wrapper + pyramid kernels (reference: monai/losses/multi_scale.py).
The MultiScaleLoss class lives in losses/other.py; re-exported here for parity."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.gaussian import gaussian_1d
from .other import MultiScaleLoss

__all__ = ["MultiScaleLoss", "make_gaussian_kernel", "make_cauchy_kernel", "kernel_fn_dict"]


def make_gaussian_kernel(sigma: int) -> jnp.ndarray:
    """(reference: multi_scale.py:21)"""
    if sigma <= 0:
        raise ValueError(f"expecting positive sigma, got sigma={sigma}")
    return jnp.asarray(gaussian_1d(sigma=sigma, truncated=3, approx="sampled",
                                   normalize=False), dtype=jnp.float32)


def make_cauchy_kernel(sigma: int) -> jnp.ndarray:
    """(reference: multi_scale.py:27)"""
    if sigma <= 0:
        raise ValueError(f"expecting positive sigma, got sigma={sigma}")
    tail = int(sigma * 5)
    k = 1.0 / ((jnp.arange(-tail, tail + 1) / sigma) ** 2 + 1)
    return k / jnp.sum(k)


kernel_fn_dict = {"gaussian": make_gaussian_kernel, "cauchy": make_cauchy_kernel}
