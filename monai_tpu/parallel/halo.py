"""Spatial parallelism: shard volumes across devices with halo exchange.

This is the TPU analog of the reference's spatial decomposition (sliding-window /
tiled inference, SURVEY §2.13): space is the "sequence" axis — shard one spatial dim of
the volume over the 'space' mesh axis, exchange conv-receptive-field halos with
``jax.lax.ppermute`` (neighbor rings over ICI), and keep windowed attention local to
each shard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["halo_exchange", "spatial_shard_conv_forward"]


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str, spatial_axis: int = 2,
                  boundary: str = "edge") -> jnp.ndarray:
    """Pad a locally-sharded block with ``halo`` voxels from ring neighbors.

    Call inside shard_map/pjit with a named mesh axis.  ``x`` is the local block of
    any rank (e.g. (B, C, *spatial_local)).  Returns x extended along ``spatial_axis``
    by ``halo`` voxels of neighbor data on each side.

    ``boundary`` controls the global volume edges (where there is no neighbor):
      - ``"zero"``: zero-fill — matches an unsharded zero-padded SAME conv exactly.
      - ``"edge"``: replicate the edge voxels.
      - ``"wrap"``: keep the ring wraparound (periodic volume).
    """
    if halo <= 0:
        return x
    if boundary not in ("zero", "edge", "wrap"):
        raise ValueError(f"unsupported boundary mode {boundary!r}")
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
    if boundary == "zero":
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    elif boundary == "edge":
        from_left = jnp.where(idx == 0, take(slice(0, halo)), from_left)
        from_right = jnp.where(idx == n - 1, take(slice(-halo, None)), from_right)
    return jnp.concatenate([from_left, x, from_right], axis=spatial_axis)


def spatial_shard_conv_forward(fn, mesh, axis_name: str = "space", halo: int = 1,
                               spatial_axis: int = 2, ndim: int = 5,
                               boundary: str = "zero"):
    """Wrap a conv-net forward for spatially-sharded inputs.

    Returns a shard_map-ed function: each device gets its local block of the input
    (sharded along ``spatial_axis`` of a rank-``ndim`` array), halos are exchanged,
    ``fn`` runs locally, and the halo region is cropped from the output.

    Exactness: when ``fn`` is a single SAME-padded conv (or any one-hop stencil) with
    receptive-field radius ≤ ``halo`` and ``boundary="zero"``, the sharded result
    equals the unsharded ``fn`` applied to the full volume everywhere. For multi-layer
    ``fn`` with total receptive-field radius ≤ ``halo``, the interior is exact but the
    outermost ``halo`` planes at the GLOBAL volume edges can differ (intermediate
    activations in the halo region see real data where the unsharded net sees its own
    SAME zero padding). Works for 2D (ndim=4) and 3D (ndim=5) NC-spatial layouts and
    any ``spatial_axis``.
    """
    spec = P(*[axis_name if i == spatial_axis else None for i in range(ndim)])

    def local_fn(x_local):
        padded = halo_exchange(x_local, halo, axis_name, spatial_axis, boundary=boundary)
        out = fn(padded)
        slicer = [slice(None)] * out.ndim
        slicer[spatial_axis] = slice(halo, out.shape[spatial_axis] - halo)
        return out[tuple(slicer)]

    return jax.shard_map(local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                         check_vma=False)
