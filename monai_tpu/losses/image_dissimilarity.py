"""Registration dissimilarity losses + LNCC kernel makers (reference:
monai/losses/image_dissimilarity.py). The loss classes live in losses/other.py;
this module adds the kernel constructors and re-exports for API parity."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.gaussian import gaussian_1d
from .other import GlobalMutualInformationLoss, LocalNormalizedCrossCorrelationLoss

__all__ = ["LocalNormalizedCrossCorrelationLoss", "GlobalMutualInformationLoss",
           "make_rectangular_kernel", "make_triangular_kernel", "make_gaussian_kernel",
           "kernel_dict"]


def make_rectangular_kernel(kernel_size: int) -> jnp.ndarray:
    """(reference: image_dissimilarity.py make_rectangular_kernel)"""
    return jnp.ones(kernel_size)


def make_triangular_kernel(kernel_size: int) -> jnp.ndarray:
    """Triangular window from box-filter self-convolution
    (reference: image_dissimilarity.py make_triangular_kernel)."""
    fsize = (kernel_size + 1) // 2
    if fsize % 2 == 0:
        fsize -= 1
    f = np.ones(fsize, dtype=np.float64) / fsize
    out = np.convolve(f, f)  # length 2*fsize-1
    pad = (kernel_size - out.shape[0]) // 2
    out = np.pad(out, (max(pad, 0), max(kernel_size - out.shape[0] - pad, 0)))
    return jnp.asarray(out[:kernel_size], dtype=jnp.float32)


def make_gaussian_kernel(kernel_size: int) -> jnp.ndarray:
    """Unnormalized gaussian window scaled by sqrt(2*pi)*sigma
    (reference: image_dissimilarity.py make_gaussian_kernel)."""
    sigma = kernel_size / 3.0
    kernel = gaussian_1d(sigma=sigma, truncated=kernel_size // 2, approx="sampled",
                         normalize=False) * (2.5066282 * sigma)
    return jnp.asarray(kernel[:kernel_size], dtype=jnp.float32)


kernel_dict = {
    "rectangular": make_rectangular_kernel,
    "triangular": make_triangular_kernel,
    "gaussian": make_gaussian_kernel,
}
