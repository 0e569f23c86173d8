"""Weight initialization helpers (reference: monai/networks/layers/weight_init.py
trunc_normal_, monai/networks/utils.py normal_init/icnr_init).

JAX arrays are immutable: these return NEW arrays rather than mutating in place.
Apply to nnx params as ``param.value = trunc_normal(key, param.value.shape)``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["trunc_normal", "normal_init", "icnr_init"]


def trunc_normal(key, shape, mean: float = 0.0, std: float = 1.0, a: float = -2.0,
                 b: float = 2.0, dtype=jnp.float32) -> jnp.ndarray:
    """Truncated normal via inverse-CDF sampling (reference: weight_init.py:22)."""

    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    lo = norm_cdf((a - mean) / std)
    hi = norm_cdf((b - mean) / std)
    u = jax.random.uniform(key, shape, dtype=dtype, minval=2 * lo - 1, maxval=2 * hi - 1)
    x = jax.scipy.special.erfinv(u)
    x = x * std * math.sqrt(2.0) + mean
    return jnp.clip(x, a, b)


def normal_init(key, shape, std: float = 0.02, dtype=jnp.float32) -> jnp.ndarray:
    """Plain normal init (reference: networks/utils.py normal_init)."""
    return std * jax.random.normal(key, shape, dtype=dtype)


def icnr_init(key, shape, upsample_factor: int = 2, dtype=jnp.float32) -> jnp.ndarray:
    """ICNR initialization for sub-pixel (pixel-shuffle) convolutions: repeats a
    lower-resolution kernel so the initial upsample is nearest-neighbor-like
    (reference: networks/utils.py icnr_init). `shape` is channel-last conv kernel
    (*spatial, in, out)."""
    out_ch = shape[-1]
    sd = len(shape) - 2
    scale = upsample_factor ** sd
    sub = normal_init(key, shape[:-1] + (max(out_ch // scale, 1),), dtype=dtype)
    k = jnp.repeat(sub, scale, axis=-1)
    return k[..., :out_ch]


# functional-style alias matching the reference's in-place name (weight_init.py trunc_normal_)
trunc_normal_ = trunc_normal
