"""Spatial (context) parallelism for REAL network modules via XLA GSPMD.

The hand-rolled shard_map halo machinery in ``halo.py`` demonstrates the
mechanics (explicit ppermute halos, cross-shard instance-norm psum) on layer
lists. For full networks — the bench UNet with strided convs, transposed convs
and skip concats — the TPU-idiomatic path is GSPMD: shard the activations'
spatial axis over a mesh axis and let the XLA SPMD partitioner insert the halo
collective-permutes for every conv (including strided and transposed) and the
all-reduces for the instance-norm spatial statistics. This is exactly the
"pick a mesh, annotate shardings, let XLA insert collectives" recipe; no
reference counterpart exists (monai is single-device per volume — SURVEY §2.13
spatial row calls this the TPU context parallelism for volumes).

Why SP exists: a (B, C, H, W, D) f32 volume at 512³ is 0.5 GiB per channel and
the UNet's level-0 activations are ~16x that — beyond one v5e's HBM. Sharding
H over 8 chips divides every activation (and its gradient) by 8 while weights
stay replicated.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "dp_sp_sharding",
    "make_spatial_sharded_forward",
    "make_spatial_sharded_train_step",
]


def dp_sp_sharding(mesh: Mesh, ndim: int = 5, spatial_axis: int = 2,
                   data_axis: str | None = "data", space_axis: str = "space") -> NamedSharding:
    """NamedSharding for a channel-first batch: batch over ``data_axis`` (if the
    mesh has it), spatial dim ``spatial_axis`` over ``space_axis``."""
    spec: list = [None] * ndim
    if data_axis and data_axis in mesh.axis_names:
        spec[0] = data_axis
    if space_axis in mesh.axis_names:
        spec[spatial_axis] = space_axis
    return NamedSharding(mesh, P(*spec))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_spatial_sharded_forward(net: nnx.Module, mesh: Mesh, spatial_axis: int = 2,
                                 data_axis: str | None = "data", space_axis: str = "space",
                                 ndim: int = 5) -> tuple[Callable, Any, NamedSharding]:
    """jit the module's forward with params replicated and activations DP x SP
    sharded. Returns ``(fwd, state, x_sharding)`` where ``fwd(state, x)`` runs the
    sharded program; GSPMD inserts conv halo exchanges and norm all-reduces."""
    graphdef, state = nnx.split(net)
    rep = _replicated(mesh)
    state = jax.device_put(state, rep)
    x_sh = dp_sp_sharding(mesh, ndim, spatial_axis, data_axis, space_axis)

    @jax.jit
    def fwd(state, x):
        x = jax.lax.with_sharding_constraint(x, x_sh)
        out = nnx.merge(graphdef, state)(x)
        return jax.lax.with_sharding_constraint(out, x_sh)

    return fwd, state, x_sh


def make_spatial_sharded_train_step(net: nnx.Module, tx, loss_fn: Callable, mesh: Mesh,
                                    spatial_axis: int = 2, data_axis: str | None = "data",
                                    space_axis: str = "space", ndim: int = 5,
                                    donate: bool = True):
    """DP x SP training step on the real module: params + optimizer state
    replicated, batch and one spatial axis of the activations sharded; the
    backward's halo exchanges and the gradient all-reduce over 'data' (and the
    spatial-stat reduces over 'space') are all GSPMD-inserted.

    Returns ``(step, params, opt_state, rest, x_sharding)`` with
    ``step(params, opt_state, x, y) -> (params, opt_state, loss)``."""
    graphdef, params, rest = nnx.split(net, nnx.Param, ...)
    rep = _replicated(mesh)
    params = jax.device_put(params, rep)
    rest = jax.device_put(rest, rep)
    opt_state = jax.device_put(tx.init(params), rep)
    x_sh = dp_sp_sharding(mesh, ndim, spatial_axis, data_axis, space_axis)

    def step_fn(params, opt_state, x, y):
        x = jax.lax.with_sharding_constraint(x, x_sh)
        y = jax.lax.with_sharding_constraint(y, x_sh)

        def loss_of(p):
            logits = nnx.merge(graphdef, p, rest)(x)
            return loss_fn(logits, y)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state_ = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state_, loss

    step = jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())
    return step, params, opt_state, rest, x_sh


def shard_bytes_per_device(shape, dtype, mesh: Mesh, spatial_axis: int = 2,
                           data_axis: str | None = "data", space_axis: str = "space") -> int:
    """Bytes of one array shard on one device under dp_sp_sharding — the memory
    argument for SP (a volume 2x one chip's HBM fits at space>=2)."""
    n = int(np.prod(shape)) * np.dtype(dtype).itemsize
    denom = 1
    if data_axis and data_axis in mesh.axis_names:
        denom *= mesh.shape[data_axis]
    if space_axis in mesh.axis_names:
        denom *= mesh.shape[space_axis]
    return n // denom
