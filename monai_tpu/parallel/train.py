"""Sharded training step construction: DP (and optional spatial) over a named mesh.

The reference's distribution story is torch DDP around the user's training loop; here
the whole train step is ONE pjit program: parameters replicated (or sharded), batch
sharded over 'data', gradients reduced by XLA's automatic collectives.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_module", "make_sharded_train_step"]


def shard_module(model: nnx.Module, mesh: Mesh) -> nnx.Module:
    """Replicate module parameters across the mesh (DP layout)."""
    state = nnx.state(model)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())) if hasattr(x, "ndim") else x, state)
    nnx.update(model, state)
    return model


def make_sharded_train_step(loss_function: Callable, mesh: Mesh, data_axis: str = "data",
                            amp: bool = False):
    """Build a jitted DP train step: batch sharded on ``data_axis``, params replicated.

    Returns step(model, optimizer, inputs, targets) -> loss.
    XLA inserts the gradient all-reduce (psum over 'data') automatically from the
    output shardings of the replicated parameters.
    """
    batch_sharding = NamedSharding(mesh, P(data_axis))

    @nnx.jit
    def train_step(model, optimizer, inputs, targets):
        inputs = jax.lax.with_sharding_constraint(inputs, batch_sharding)
        targets = jax.lax.with_sharding_constraint(targets, batch_sharding)

        def loss_fn(m):
            x = inputs.astype(jnp.bfloat16) if amp else inputs
            preds = m(x).astype(jnp.float32)
            return loss_function(preds, targets)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    return train_step
