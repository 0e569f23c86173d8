"""Conjugate-gradient linear solver module
(reference: monai/networks/layers/conjugate_gradient.py ConjugateGradient).

Pure-JAX: the iteration is a `lax.fori_loop`, fully differentiable and jittable; works
for complex-valued linear operators (MRI reconstruction use case)."""
from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["ConjugateGradient"]


def _zdot(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Complex dot product <x1, x2> = sum(conj(x1) * x2)."""
    return jnp.sum(jnp.conj(x1) * x2)


def _zdot_single(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.real(_zdot(x, x))


class ConjugateGradient(nnx.Module):
    """Solve ``linear_op(x) = y`` for x with num_iter CG steps (reference:
    conjugate_gradient.py:42)."""

    def __init__(self, linear_op: Callable, num_iter: int):
        self.linear_op = linear_op
        self.num_iter = num_iter

    def update(self, x, p, r, rsold):
        dy = self.linear_op(p)
        p_dot_dy = _zdot(p, dy)
        alpha = rsold / (p_dot_dy + 1e-30)
        x = x + alpha * p
        r = r - alpha * dy
        rsnew = _zdot_single(r)
        beta = rsnew / (rsold + 1e-30)
        p = r + beta * p
        return x, p, r, rsnew

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        r = y - self.linear_op(x)
        rsold = _zdot_single(r)
        p = r

        def body(_, carry):
            return self.update(*carry)

        x, _, _, _ = jax.lax.fori_loop(0, self.num_iter, body, (x, p, r, rsold))
        return x
