"""Simple layers (reference: monai/networks/layers/simplelayers.py).

GaussianFilter:542, MedianFilter:501, SavitzkyGolayFilter:303, HilbertTransform:370,
SkipConnection:131, Flatten, Reshape, separable_filtering:313, apply_filter:—,
ChannelPad:—.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...ops.gaussian import gaussian_1d, separable_filtering
from ...utils.misc import ensure_tuple_rep

__all__ = ["SkipConnection", "Flatten", "Reshape", "GaussianFilter", "MedianFilter",
           "SavitzkyGolayFilter", "HilbertTransform", "ChannelPad", "apply_filter",
           "LLTM", "MeanFilter"]


class SkipConnection(nnx.Module):
    """Concatenate/add/multiply input with submodule output
    (reference: monai/networks/layers/simplelayers.py:131)."""

    def __init__(self, submodule, dim: int = -1, mode: str = "cat"):
        self.submodule = submodule
        self.dim = dim
        self.mode = mode

    def __call__(self, x):
        y = self.submodule(x)
        if self.mode == "cat":
            return jnp.concatenate([x, y], axis=self.dim)
        if self.mode == "add":
            return x + y
        if self.mode == "mul":
            return x * y
        raise NotImplementedError(f"Unsupported mode {self.mode}.")


class Flatten(nnx.Module):
    def __call__(self, x):
        return x.reshape(x.shape[0], -1)


class Reshape(nnx.Module):
    def __init__(self, *shape: int):
        self.shape = (1,) + tuple(shape)

    def __call__(self, x):
        shape = list(self.shape)
        shape[0] = x.shape[0]
        return x.reshape(shape)


class ChannelPad(nnx.Module):
    """Pad or project channels for residual shortcuts (reference: simplelayers.py)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, mode: str = "pad",
                 *, rngs: nnx.Rngs | None = None):
        self.project = None
        self.pad = None
        if in_channels == out_channels:
            return
        if mode == "project":
            from ..layers.factories import Conv

            self.project = Conv["conv", spatial_dims](in_channels, out_channels, kernel_size=1,
                                                      padding=[(0, 0)] * spatial_dims,
                                                      rngs=rngs or nnx.Rngs(0))
        elif mode == "pad":
            if in_channels > out_channels:
                raise ValueError('Incompatible values: channel_matching="pad" and in_channels > out_channels.')
            pad_1 = (out_channels - in_channels) // 2
            pad_2 = out_channels - in_channels - pad_1
            self.pad = (pad_1, pad_2)

    def __call__(self, x):
        if self.project is not None:
            return self.project(x)
        if self.pad is not None:
            pads = [(0, 0)] * (x.ndim - 1) + [self.pad]
            return jnp.pad(x, pads)
        return x


class GaussianFilter(nnx.Module):
    """Separable gaussian smoothing, optionally with trainable sigma
    (reference: simplelayers.py:542).  Channel-first (B, C, *spatial) input."""

    def __init__(self, spatial_dims: int, sigma: Sequence[float] | float, truncated: float = 4.0,
                 approx: str = "erf", requires_grad: bool = False):
        sigmas = ensure_tuple_rep(sigma, spatial_dims)
        self.spatial_dims = spatial_dims
        self.truncated = truncated
        self.approx = approx
        if requires_grad:
            self.sigma = nnx.Param(jnp.asarray(sigmas, dtype=jnp.float32))
        else:
            self.sigma = jnp.asarray(sigmas, dtype=jnp.float32)

    def __call__(self, x):
        sig = self.sigma[...] if isinstance(self.sigma, nnx.Param) else self.sigma
        kernels = [np.asarray(gaussian_1d(float(s), self.truncated, self.approx)) for s in np.asarray(sig)]

        def _one(sample):
            return separable_filtering(sample, kernels)

        return jax.vmap(_one)(x)


class MedianFilter(nnx.Module):
    """Median filter via reduce_window sort-free approximation — exact median through
    sorting the unfolded neighborhood (reference: simplelayers.py:501)."""

    def __init__(self, radius: Sequence[int] | int = 1, spatial_dims: int = 3):
        self.radius = ensure_tuple_rep(radius, spatial_dims)
        self.spatial_dims = spatial_dims

    def __call__(self, x):
        # build neighborhood stack by shifting (static number of shifts)
        import itertools

        sd = self.spatial_dims
        offsets = list(itertools.product(*[range(-r, r + 1) for r in self.radius]))
        pads = [(0, 0), (0, 0)] + [(r, r) for r in self.radius]
        xp_ = jnp.pad(x, pads, mode="edge")
        stacks = []
        spatial = x.shape[2:]
        for off in offsets:
            slicer = [slice(None), slice(None)]
            for d, o in enumerate(off):
                start = o + self.radius[d]
                slicer.append(slice(start, start + spatial[d]))
            stacks.append(xp_[tuple(slicer)])
        stacked = jnp.stack(stacks, axis=0)
        return jnp.median(stacked, axis=0)


class SavitzkyGolayFilter(nnx.Module):
    """Polynomial smoothing filter (reference: simplelayers.py:303)."""

    def __init__(self, window_length: int, order: int, axis: int = 2, mode: str = "zeros"):
        if order >= window_length:
            raise ValueError("order must be less than window_length.")
        if window_length % 2 == 0:
            raise ValueError("window_length must be odd.")
        self.axis = axis
        self.mode = mode
        # least-squares smoothing kernel: first row of pinv of the Vandermonde design
        idx = np.arange(-(window_length // 2), window_length // 2 + 1, dtype=np.float64)
        a = np.vander(idx, order + 1, increasing=True)  # (window, order+1)
        self.coeffs = jnp.asarray(np.linalg.pinv(a)[0], dtype=jnp.float32)

    def __call__(self, x):
        from ...ops.gaussian import separable_filtering

        sd = x.ndim - 2
        kernels = [np.ones(1, dtype=np.float32)] * sd
        kernels[self.axis - 2] = np.asarray(self.coeffs)

        def _one(sample):
            return separable_filtering(sample, kernels)

        return jax.vmap(_one)(x)


class HilbertTransform(nnx.Module):
    """Analytic signal via FFT (reference: simplelayers.py:370)."""

    def __init__(self, axis: int = 2, n: int | None = None):
        self.axis = axis
        self.n = n

    def __call__(self, x):
        ax = self.axis
        n = x.shape[ax] if self.n is None else self.n
        xf = jnp.fft.fft(x, n=n, axis=ax)
        # reference filter (simplelayers.py:370): 2*heaviside(f, 0.5) — DC bin 1,
        # positive freqs 2, negatives INCLUDING the even-n Nyquist bin 0
        freqs = np.concatenate([np.arange(0, (n - 1) // 2 + 1) / float(n),
                                np.arange(-(n // 2), 0) / float(n)])
        h = 2.0 * np.heaviside(freqs, 0.5)
        shape = [1] * x.ndim
        shape[ax] = n
        return jnp.fft.ifft(xf * jnp.asarray(h).reshape(shape), axis=ax)


def apply_filter(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Apply an N-D filter kernel to (B, C, *spatial) input (reference: simplelayers.py)."""
    sd = x.ndim - 2
    k = kernel.astype(x.dtype)
    while k.ndim < sd:
        k = k[None]
    # depthwise conv: move to channel-last, conv with feature_group_count=C
    perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
    x_cl = jnp.transpose(x, perm_in)
    c = x_cl.shape[-1]
    kern = jnp.broadcast_to(k[..., None, None], k.shape + (1, c))
    pads = [(s // 2, s - 1 - s // 2) for s in k.shape]
    dn_spec = ("NHWC", "HWIO", "NHWC") if sd == 2 else (("NDHWC", "DHWIO", "NDHWC") if sd == 3 else ("NWC", "WIO", "NWC"))
    dn = jax.lax.conv_dimension_numbers(x_cl.shape, kern.shape, dn_spec)
    out = jax.lax.conv_general_dilated(x_cl, kern, (1,) * sd, pads, dimension_numbers=dn,
                                       feature_group_count=c)
    perm_out = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
    return jnp.transpose(out, perm_out)


class MeanFilter(nnx.Module):
    """Uniform box filter of a given size (reference: simplelayers.py MeanFilter)."""

    def __init__(self, spatial_dims: int, size: int):
        self.filter = jnp.ones((size,) * spatial_dims, jnp.float32)
        self.spatial_dims = spatial_dims

    def __call__(self, x):
        return apply_filter(x, self.filter)


class LLTM(nnx.Module):
    """Long-Long-Term-Memory demo cell (reference: simplelayers.py:598 LLTM; the
    reference ships fused C++/CUDA kernels — under XLA the pure-jnp version fuses to
    the same element-wise epilogue, so no custom kernel is needed)."""

    def __init__(self, input_features: int, state_size: int, *, rngs: nnx.Rngs):
        self.input_features = input_features
        self.state_size = state_size
        bound = 1.0 / jnp.sqrt(jnp.asarray(state_size, jnp.float32))
        k = rngs.params()
        import jax as _jax

        k1, k2 = _jax.random.split(k)
        self.weights = nnx.Param(
            float(bound) * (2 * _jax.random.uniform(k1, (3 * state_size, input_features + state_size)) - 1))
        self.bias = nnx.Param(
            float(bound) * (2 * _jax.random.uniform(k2, (3 * state_size,)) - 1))

    def __call__(self, x, state):
        old_h, old_cell = state
        xh = jnp.concatenate([old_h, x], axis=1)
        gates = xh @ self.weights.value.T + self.bias.value
        i_gate, o_gate, cand = jnp.split(gates, 3, axis=1)
        i_gate = jax.nn.sigmoid(i_gate)
        o_gate = jax.nn.sigmoid(o_gate)
        cand = jax.nn.elu(cand)
        new_cell = old_cell + cand * i_gate
        new_h = jnp.tanh(new_cell) * o_gate
        return new_h, new_cell


class Swish(nnx.Module):
    """x * sigmoid(alpha x) (reference: layers/factories Swish)."""

    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha

    def __call__(self, x):
        return x * jax.nn.sigmoid(self.alpha * x)


class MemoryEfficientSwish(Swish):
    """In jax the VJP of silu is already memory-efficient via XLA fusion; provided for
    API parity (reference: layers MemoryEfficientSwish)."""


class Mish(nnx.Module):
    """x * tanh(softplus(x)) (reference: layers Mish)."""

    def __call__(self, x):
        return x * jnp.tanh(jax.nn.softplus(x))


class GEGLU(nnx.Module):
    """Gated GELU: splits the last dim in two, gates one half (reference: blocks GEGLU)."""

    def __call__(self, x):
        a, b = jnp.split(x, 2, axis=-1)
        return a * jax.nn.gelu(b)


class ApplyFilter(nnx.Module):
    """Wrap a fixed kernel as a module (reference: simplelayers.py ApplyFilter)."""

    def __init__(self, filter):
        self.filter = jnp.asarray(filter, jnp.float32)

    def __call__(self, x):
        return apply_filter(x, self.filter)


class LaplaceFilter(ApplyFilter):
    """(reference: simplelayers.py LaplaceFilter)."""

    def __init__(self, spatial_dims: int, size: int = 3):
        k = -np.ones((size,) * spatial_dims, np.float32)
        k[(size // 2,) * spatial_dims] = size ** spatial_dims - 1
        super().__init__(k)


class EllipticalFilter(ApplyFilter):
    """(reference: simplelayers.py EllipticalFilter)."""

    def __init__(self, spatial_dims: int, size: int = 3):
        grid = np.stack(np.meshgrid(*[np.linspace(-1, 1, size)] * spatial_dims,
                                    indexing="ij"))
        super().__init__(((grid ** 2).sum(0) <= 1.0).astype(np.float32))


class SharpenFilter(ApplyFilter):
    """(reference: simplelayers.py SharpenFilter)."""

    def __init__(self, spatial_dims: int, size: int = 3):
        k = -np.ones((size,) * spatial_dims, np.float32)
        k[(size // 2,) * spatial_dims] = size ** spatial_dims
        super().__init__(k)


def get_binary_kernel(window_size: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """One-hot unfold kernel: (prod(window), 1, *window) with a single 1 per output
    channel (reference: simplelayers.py:get_binary_kernel)."""
    win = tuple(int(w) for w in window_size)
    prod = int(np.prod(win))
    kernel = jnp.eye(prod, dtype=dtype).reshape((prod, 1) + win)
    return kernel


def median_filter(in_tensor, kernel_size: Sequence[int] = (3, 3, 3), spatial_dims: int = 3,
                  **kwargs):
    """Functional median filter over the last ``spatial_dims`` axes, edge-padded
    (reference: simplelayers.py:median_filter)."""
    x = jnp.asarray(in_tensor)
    orig_shape = x.shape
    # normalize to (B, C, *spatial)
    while x.ndim < spatial_dims + 2:
        x = x[None]
    radii = [max((k - 1) // 2, 0) for k in ensure_tuple_rep(kernel_size, spatial_dims)]
    out = MedianFilter(radius=radii, spatial_dims=spatial_dims)(x)
    return out.reshape(orig_shape)


# Reference-name export: the torch autograd.Function behind MemoryEfficientSwish
# (reference: networks/blocks/activation.py:72 SwishImplementation). JAX autodiff
# makes the custom backward unnecessary; the class is the op itself here.
SwishImplementation = MemoryEfficientSwish
