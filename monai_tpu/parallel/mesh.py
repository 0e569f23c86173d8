"""Device-mesh utilities: the distribution backbone.

Replaces the reference's torch DDP wiring (monai/data/samplers.py + NCCL all-gathers)
with jax.sharding: a ('data', 'space') mesh, batch sharding over 'data', spatial
sharding over 'space' for volumes too large for one chip.  Collectives are inserted by
XLA from sharding annotations; they ride ICI within a slice.
"""
from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "get_default_mesh", "shard_batch", "replicate", "with_sharding"]

_default_mesh: Mesh | None = None


def create_mesh(axis_shapes: Sequence[int] | None = None, axis_names: Sequence[str] = ("data",),
                devices: Sequence | None = None) -> Mesh:
    """Create a device mesh.  Default: all devices on one 'data' axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = (len(devs),)
    if int(np.prod(axis_shapes)) != len(devs):
        raise ValueError(f"mesh shape {axis_shapes} does not match device count {len(devs)}")
    dev_array = devs.reshape(axis_shapes)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def get_default_mesh() -> Mesh:
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = create_mesh()
    return _default_mesh


def shard_batch(batch: Any, mesh: Mesh | None = None, axis: str = "data") -> Any:
    """Put array leaves with batch dim sharded over the mesh's data axis."""
    mesh = mesh or get_default_mesh()

    def _put(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree: Any, mesh: Mesh | None = None) -> Any:
    """Fully replicate array leaves over the mesh."""
    mesh = mesh or get_default_mesh()

    def _put(x):
        if not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(_put, tree)


def with_sharding(x: Any, mesh: Mesh, spec: P) -> Any:
    """Constraint helper usable inside jit."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
