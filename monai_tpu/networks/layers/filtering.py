"""Bilateral filtering layers (reference: monai/networks/layers/filtering.py:23,66,184,349).

The trainable variants differentiate through sigma parameters via jax autodiff —
replacing the reference's ~2,600 lines of hand-written C++/CUDA forward/backward
(csrc/filtering/trainable_bilateral/*, trainable_joint_bilateral/*). Per-axis
spatial sigmas are independent learnable parameters exactly like the reference
(filtering.py:184 sigma_x/sigma_y/sigma_z); unlike the reference, channel
dimensions > 1 are supported (each channel filtered with the shared sigmas).
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
from flax import nnx

from ...ops.filtering import bilateral_filter, phl_filter

__all__ = ["BilateralFilter", "PHLFilter", "TrainableBilateralFilter", "TrainableJointBilateralFilter"]


class BilateralFilter:
    """Functional wrapper (reference: filtering.py:23)."""

    @staticmethod
    def apply(input: jnp.ndarray, spatial_sigma: float = 5.0, color_sigma: float = 0.5,
              fast_approx: bool = True) -> jnp.ndarray:
        return bilateral_filter(input, spatial_sigma, color_sigma, fast_approx)

    def __call__(self, input, spatial_sigma: float = 5.0, color_sigma: float = 0.5,
                 fast_approx: bool = True):
        return self.apply(input, spatial_sigma, color_sigma, fast_approx)


class PHLFilter:
    """Permutohedral-style guided filter (reference: filtering.py:66)."""

    @staticmethod
    def apply(input: jnp.ndarray, features: jnp.ndarray, sigmas=None) -> jnp.ndarray:
        return phl_filter(input, features, sigmas)

    def __call__(self, input, features, sigmas=None):
        return self.apply(input, features, sigmas)


def _per_axis_sigmas(sigma_param: jnp.ndarray, sd: int) -> list:
    """Broadcast a length-1 or length-sd sigma vector to one traced scalar per axis."""
    if sigma_param.shape[0] == sd:
        return [sigma_param[d] for d in range(sd)]
    if sigma_param.shape[0] == 1:
        return [sigma_param[0]] * sd
    raise ValueError(f"spatial_sigma has {sigma_param.shape[0]} entries for {sd} spatial dims.")


def _bilateral_weighted_sum(img, guidance, sigmas: list, color_sigma, truncate: float = 2.0):
    """Shared trainable (joint-)bilateral core: per-axis gaussian spatial weights x
    per-voxel gaussian range weights on the guidance signal, autodiff-friendly.

    img/guidance: (B, C, *spatial); each channel filtered independently; the range
    weight compares guidance values channel-wise (for C>1 each channel guides itself,
    matching the independent-channel semantics of BilateralFilter)."""
    sd = img.ndim - 2
    radii = [max(int(truncate * float(jax.lax.stop_gradient(s)) + 0.5), 1) for s in sigmas]
    offsets = list(itertools.product(*[range(-r, r + 1) for r in radii]))
    spatial = img.shape[2:]
    pad = [(0, 0), (0, 0)] + [(r, r) for r in radii]
    padded = jnp.pad(img, pad, mode="edge")
    padded_g = padded if guidance is img else jnp.pad(guidance, pad, mode="edge")
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for off in offsets:
        # independent per-axis sigmas: w = prod_d exp(-o_d^2 / 2 s_d^2)
        log_ws = sum((-0.5 * float(o * o)) / (s ** 2) for o, s in zip(off, sigmas))
        w_s = jnp.exp(log_ws)
        slicer = [slice(None), slice(None)] + [slice(r + o, r + o + n)
                                               for o, r, n in zip(off, radii, spatial)]
        shifted = padded[tuple(slicer)]
        shifted_g = padded_g[tuple(slicer)] if guidance is not img else shifted
        g_ref = guidance if guidance is not img else img
        w_c = jnp.exp(-0.5 * ((shifted_g - g_ref) / color_sigma) ** 2)
        w = w_s * w_c
        num = num + w * shifted
        den = den + w
    return num / jnp.maximum(den, 1e-8)


class TrainableBilateralFilter(nnx.Module):
    """Bilateral filter with independently learnable per-axis spatial sigmas and a
    learnable color sigma (reference: filtering.py:184)."""

    def __init__(self, spatial_sigma, color_sigma: float = 0.5):
        if isinstance(spatial_sigma, (int, float)):
            spatial_sigma = [float(spatial_sigma)]
        self.sigma_spatial = nnx.Param(jnp.asarray(spatial_sigma, dtype=jnp.float32).reshape(-1))
        self.sigma_color = nnx.Param(jnp.asarray(color_sigma, dtype=jnp.float32))

    @property
    def sigma_x(self):
        return self.sigma_spatial[0]

    @property
    def sigma_y(self):
        v = self.sigma_spatial[...]
        return v[1] if v.shape[0] > 1 else v[0]

    @property
    def sigma_z(self):
        v = self.sigma_spatial[...]
        return v[2] if v.shape[0] > 2 else v[0]

    def __call__(self, input_tensor: jnp.ndarray) -> jnp.ndarray:
        sd = input_tensor.ndim - 2
        sigmas = _per_axis_sigmas(self.sigma_spatial[...], sd)
        return _bilateral_weighted_sum(input_tensor, input_tensor, sigmas,
                                       self.sigma_color[...])


class TrainableJointBilateralFilter(nnx.Module):
    """Joint bilateral with a guidance image and per-axis learnable sigmas
    (reference: filtering.py:349)."""

    def __init__(self, spatial_sigma, color_sigma: float = 0.5):
        if isinstance(spatial_sigma, (int, float)):
            spatial_sigma = [float(spatial_sigma)]
        self.sigma_spatial = nnx.Param(jnp.asarray(spatial_sigma, dtype=jnp.float32).reshape(-1))
        self.sigma_color = nnx.Param(jnp.asarray(color_sigma, dtype=jnp.float32))

    def __call__(self, input_tensor: jnp.ndarray, guidance_tensor: jnp.ndarray) -> jnp.ndarray:
        if input_tensor.shape != guidance_tensor.shape:
            raise ValueError("Shape of input image must equal shape of guidance image.")
        sd = input_tensor.ndim - 2
        sigmas = _per_axis_sigmas(self.sigma_spatial[...], sd)
        return _bilateral_weighted_sum(input_tensor, guidance_tensor, sigmas,
                                       self.sigma_color[...])
