"""Neighbor-aware calibration loss (reference: monai/losses/nacl_loss.py:24 NACLLoss)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.gaussian import gaussian_1d

__all__ = ["NACLLoss"]


def _spatial_filter(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Apply a dense spatial kernel to every channel of (B, C, *spatial)."""
    kernel = kernel[None, None]
    sd = x.ndim - 2
    dn = jax.lax.conv_dimension_numbers(
        (1, 1) + x.shape[2:], kernel.shape,
        ("NCHW" if sd == 2 else "NCDHW", "OIHW" if sd == 2 else "OIDHW",
         "NCHW" if sd == 2 else "NCDHW"))
    pad = [(k // 2, k // 2) for k in kernel.shape[2:]]
    b, c = x.shape[:2]
    flat = x.reshape((b * c, 1) + x.shape[2:])
    out = jax.lax.conv_general_dilated(flat, kernel, (1,) * sd, pad, dimension_numbers=dn)
    return out.reshape(x.shape)


class NACLLoss:
    """Cross-entropy plus a penalty tying logits to the spatially-smoothed one-hot label
    distribution (reference: nacl_loss.py:24; arXiv:2303.06268)."""

    def __init__(self, classes: int, dim: int, kernel_size: int = 3,
                 kernel_ops: str = "mean", distance_type: str = "l1", alpha: float = 0.1,
                 sigma: float = 1.0):
        if kernel_ops not in ("mean", "gaussian"):
            raise ValueError("Kernel ops must be either mean or gaussian")
        if dim not in (2, 3):
            raise ValueError(f"Support 2d and 3d, got dim={dim}.")
        if distance_type not in ("l1", "l2"):
            raise ValueError(f"Distance type must be either L1 or L2, got {distance_type}")
        self.nc = classes
        self.dim = dim
        self.distance_type = distance_type
        self.alpha = alpha
        self.ks = kernel_size
        self.kernel_ops = kernel_ops
        self.sigma = sigma

    def get_constr_target(self, mask: jnp.ndarray) -> jnp.ndarray:
        """One-hot the label map (B, *spatial) and smooth it spatially -> (B, N, *spatial)."""
        oh = jax.nn.one_hot(mask.astype(jnp.int32), self.nc, axis=1, dtype=jnp.float32)
        if self.kernel_ops == "mean":
            kernel = jnp.ones((self.ks,) * self.dim, jnp.float32) / (self.ks ** self.dim)
        else:
            k1 = jnp.asarray(gaussian_1d(self.sigma), jnp.float32)
            kernel = k1
            for _ in range(self.dim - 1):
                kernel = kernel[..., None] * k1
        return _spatial_filter(oh, kernel)

    def __call__(self, inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        logp = jax.nn.log_softmax(inputs, axis=1)
        oh = jax.nn.one_hot(targets.astype(jnp.int32), self.nc, axis=1, dtype=logp.dtype)
        loss_ce = -(oh * logp).sum(axis=1).mean()
        utargets = self.get_constr_target(targets)
        diff = utargets - inputs
        loss_conf = jnp.abs(diff).mean() if self.distance_type == "l1" else (diff * diff).mean()
        return loss_ce + self.alpha * loss_conf
