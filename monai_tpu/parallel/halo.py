"""Spatial parallelism: shard volumes across devices with halo exchange.

This is the TPU analog of the reference's spatial decomposition (sliding-window /
tiled inference, SURVEY §2.13): space is the "sequence" axis — shard one spatial dim of
the volume over the 'space' mesh axis, exchange conv-receptive-field halos with
``jax.lax.ppermute`` (neighbor rings over ICI), and keep windowed attention local to
each shard.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["halo_exchange", "spatial_shard_conv_forward"]


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str, spatial_axis: int = 2) -> jnp.ndarray:
    """Pad a locally-sharded block with ``halo`` voxels from ring neighbors.

    Call inside shard_map/pjit with a named mesh axis.  x: (B, C, *spatial_local).
    Returns x padded along spatial_axis with neighbor data (edge-padded at ends).
    """
    if halo <= 0:
        return x
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(sl):
        slicer = [slice(None)] * x.ndim
        slicer[spatial_axis] = sl
        return x[tuple(slicer)]

    lo_edge = take(slice(0, halo))          # my lowest voxels  → neighbor above's halo
    hi_edge = take(slice(-halo, None))      # my highest voxels → neighbor below's halo
    # receive from left (lower) neighbor: their hi_edge
    from_left = jax.lax.ppermute(hi_edge, axis_name, [((i - 1) % n, i) for i in range(n)])
    # receive from right (upper) neighbor: their lo_edge
    from_right = jax.lax.ppermute(lo_edge, axis_name, [((i + 1) % n, i) for i in range(n)])
    # at the boundaries of the global volume, use edge replication instead of wraparound
    from_left = jnp.where(idx == 0, take(slice(0, halo)), from_left)
    from_right = jnp.where(idx == n - 1, take(slice(-halo, None)), from_right)
    return jnp.concatenate([from_left, x, from_right], axis=spatial_axis)


def spatial_shard_conv_forward(fn, mesh, axis_name: str = "space", halo: int = 1,
                               spatial_axis: int = 2):
    """Wrap a conv-net forward for spatially-sharded inputs.

    Returns a shard_map-ed function: each device gets its local block, halos are
    exchanged, ``fn`` runs locally, and the halo region is cropped from the output.
    Valid when fn's receptive field ≤ 2*halo+1 and it preserves spatial extent.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    in_spec = P(None, None, *([axis_name if i == spatial_axis - 2 else None
                               for i in range(4)][:1] + [None, None]))

    def local_fn(x_local):
        padded = halo_exchange(x_local, halo, axis_name, spatial_axis)
        out = fn(padded)
        slicer = [slice(None)] * out.ndim
        slicer[spatial_axis] = slice(halo, -halo if halo else None)
        return out[tuple(slicer)]

    ndim_spec = P(None, None, axis_name, None, None)
    return shard_map(local_fn, mesh=mesh, in_specs=(ndim_spec,), out_specs=ndim_spec,
                     check_rep=False)
