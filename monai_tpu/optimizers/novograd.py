"""Novograd optimizer as an optax gradient transformation.

Parity target: monai/optimizers/novograd.py:23 — layer-wise second moments
(norm-based), decoupled weight decay, optional grad averaging.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["novograd", "Novograd"]


class NovogradState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any  # scalar per leaf


def novograd(learning_rate: float | optax.Schedule = 1e-3, betas: tuple[float, float] = (0.9, 0.98),
             eps: float = 1e-8, weight_decay: float = 0.0, grad_averaging: bool = False,
             amsgrad: bool = False) -> optax.GradientTransformation:
    """Novograd: Adam-like but with a per-layer (scalar) second moment."""
    beta1, beta2 = betas

    def init_fn(params):
        exp_avg = jax.tree_util.tree_map(jnp.zeros_like, params)
        exp_avg_sq = jax.tree_util.tree_map(lambda p: jnp.zeros((), dtype=jnp.float32), params)
        return NovogradState(count=jnp.zeros((), jnp.int32), exp_avg=exp_avg, exp_avg_sq=exp_avg_sq)

    def update_fn(updates, state, params=None):
        count = state.count + 1

        def upd(g, m, v, p):
            norm = jnp.sum(jnp.square(g).astype(jnp.float32))
            v_new = jnp.where(state.count == 0, norm, v * beta2 + norm * (1 - beta2))
            denom = jnp.sqrt(v_new) + eps
            grad = g / denom.astype(g.dtype)
            if weight_decay != 0 and p is not None:
                grad = grad + weight_decay * p
            if grad_averaging:
                grad = grad * (1 - beta1)
            m_new = m * beta1 + grad
            return m_new, v_new

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_p = treedef.flatten_up_to(params) if params is not None else [None] * len(flat_g)
        new_m, new_v = [], []
        for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p):
            mn, vn = upd(g, m, v, p)
            new_m.append(mn)
            new_v.append(vn)
        new_updates = jax.tree_util.tree_unflatten(treedef, [-u for u in new_m])
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        new_updates = jax.tree_util.tree_map(lambda u: u * lr, new_updates)
        return new_updates, NovogradState(count=count,
                                          exp_avg=jax.tree_util.tree_unflatten(treedef, new_m),
                                          exp_avg_sq=jax.tree_util.tree_unflatten(treedef, new_v))

    return optax.GradientTransformation(init_fn, update_fn)


Novograd = novograd
