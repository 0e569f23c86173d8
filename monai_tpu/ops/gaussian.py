"""Separable N-D Gaussian (and generic separable) filtering.

TPU-native analog of the reference's GaussianFilter (monai/networks/layers/
simplelayers.py:542 — separable 1-D convolutions) — implemented with
``lax.conv_general_dilated`` per axis on the jax path (XLA maps these onto the MXU/VPU)
and scipy on the numpy path.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.backend import is_jax
from ..utils.misc import ensure_tuple_rep

__all__ = ["gaussian_1d", "gaussian_filter", "separable_filtering"]


def gaussian_1d(sigma: float, truncated: float = 4.0, approx: str = "erf", normalize: bool = True) -> np.ndarray:
    """1-D gaussian kernel (reference: monai/networks/layers/convutils.py:87).

    approx='erf' integrates the gaussian over each voxel (matching the reference's
    default); 'sampled' samples the pdf.
    """
    sigma = float(sigma)
    if sigma <= 0 or truncated <= 0:
        raise ValueError(f"sigma and truncated must be positive, got {sigma} and {truncated}.")
    tail = int(max(sigma * truncated, 0.5) + 0.5)
    x = np.arange(-tail, tail + 1, dtype=np.float64)
    if approx == "erf":
        from scipy.special import erf

        t = 0.70710678 / sigma
        out = 0.5 * (erf((x + 0.5) * t) - erf((x - 0.5) * t))
        out = np.clip(out, a_min=0, a_max=None)
    elif approx == "sampled":
        out = np.exp(-0.5 / (sigma * sigma) * x**2)
        if not normalize:
            out = out / (2.5066282 * sigma)
    elif approx == "scalespace":
        from scipy.special import ive

        sigma2 = sigma * sigma
        out = ive(np.abs(x), sigma2)
    else:
        raise NotImplementedError(f"Unsupported option: approx='{approx}'.")
    if normalize:
        s = out.sum()
        if s > 0:
            out = out / s
    return out.astype(np.float32)


def _conv1d_jax(x: jnp.ndarray, kernel: jnp.ndarray, axis: int, same: bool = True) -> jnp.ndarray:
    """Correlate (C, *spatial) along one spatial axis; 'same' zero padding by
    default, VALID when ``same=False`` (caller pre-padded)."""
    D = x.ndim - 1
    k = kernel.astype(x.dtype)
    ksize = k.shape[0]
    pad = ksize // 2 if same else 0
    # reshape kernel for conv_general_dilated: (O=1, I=1, *ones_with_k_at_axis)
    kshape = [1, 1] + [1] * D
    kshape[2 + axis] = ksize
    kern = k.reshape(kshape)
    # treat channels as batch: x -> (C, 1, *spatial)
    inp = x[:, None]
    pads = [(0, 0)] * D
    if same:
        pads[axis] = (pad, ksize - 1 - pad)
    dn = jax.lax.conv_dimension_numbers(inp.shape, kern.shape,
                                        ("NC" + "DHW"[3 - D:], "OI" + "DHW"[3 - D:], "NC" + "DHW"[3 - D:]))
    out = jax.lax.conv_general_dilated(inp, kern, window_strides=(1,) * D, padding=pads,
                                       dimension_numbers=dn)
    return out[:, 0]


def separable_filtering(x: Any, kernels: Sequence[np.ndarray], mode: str = "zeros") -> Any:
    """Apply per-axis 1-D kernels to channel-first ``x``
    (reference: monai/networks/layers/simplelayers.py:313 separable_filtering)."""
    D = x.ndim - 1
    if isinstance(kernels, (list, tuple)) and len(kernels) != D:
        raise ValueError(f"need {D} kernels, got {len(kernels)}")
    if is_jax(x):
        jnp_mode = {"reflect": "reflect", "mirror": "reflect", "symmetric": "symmetric",
                    "replicate": "edge", "border": "edge", "edge": "edge",
                    "circular": "wrap", "wrap": "wrap"}.get(mode)
        out = x.astype(jnp.float32) if x.dtype not in (jnp.float32, jnp.float64, jnp.bfloat16) else x
        for axis, k in enumerate(kernels):
            kj = jnp.asarray(k)
            if kj.shape[0] == 1 and float(kj[0]) == 1.0:
                continue
            if jnp_mode is not None:
                ksize = int(kj.shape[0])
                pads = [(0, 0)] * out.ndim
                pads[axis + 1] = (ksize // 2, ksize - 1 - ksize // 2)
                padded = jnp.pad(out, pads, mode=jnp_mode)
                out = _conv1d_jax(padded, kj, axis, same=False)
            else:
                out = _conv1d_jax(out, kj, axis)
        return out
    from scipy.ndimage import correlate1d

    # torch F.convNd is CORRELATION and torch pad 'reflect' excludes the edge
    # (scipy 'mirror'); scipy's own 'reflect' is edge-inclusive (torch 'symmetric')
    sci_mode = {"zeros": "constant", "constant": "constant", "reflect": "mirror",
                "mirror": "mirror", "symmetric": "reflect",
                "replicate": "nearest", "border": "nearest", "edge": "nearest",
                "circular": "wrap", "wrap": "wrap"}.get(mode, "constant")
    out_np = np.asarray(x, dtype=np.float32)
    for axis, k in enumerate(kernels):
        k = np.asarray(k, dtype=np.float32)
        if k.shape[0] == 1 and k[0] == 1.0:
            continue
        out_np = correlate1d(out_np, k, axis=axis + 1, mode=sci_mode)
    return out_np


def gaussian_filter(x: Any, sigma: float | Sequence[float], truncated: float = 4.0,
                    approx: str = "erf") -> Any:
    """Gaussian-smooth channel-first ``x`` along every spatial axis."""
    D = x.ndim - 1
    sigmas = ensure_tuple_rep(sigma, D)
    kernels = [gaussian_1d(s, truncated, approx) if s > 0 else np.ones(1, dtype=np.float32) for s in sigmas]
    return separable_filtering(x, kernels)
