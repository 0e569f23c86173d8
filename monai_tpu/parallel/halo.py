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

__all__ = ["halo_exchange", "spatial_shard_conv_forward", "spatial_shard_net_forward"]


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


def spatial_shard_net_forward(layers, mesh, axis_name: str = "space", spatial_axis: int = 2,
                              ndim: int = 5, boundary: str = "zero",
                              batch_axis_name: str | None = None):
    """Spatially-sharded MULTI-LAYER forward, bit-exact vs the unsharded net.

    Unlike :func:`spatial_shard_conv_forward` (one halo for the whole stack, exact
    only in the interior), each conv layer exchanges its own halo, so every layer
    sees exactly the neighbor activations plus the true global boundary padding —
    the sharded result equals the single-device forward everywhere.

    ``layers`` is a sequence of:
      ("conv", fn, radius)   — ``fn`` is a SAME conv (stride 1) with receptive
                               radius ``radius`` along ``spatial_axis``;
      ("pointwise", fn)      — any elementwise map (activation, bias, scale);
      ("instance_norm", eps) — instance norm whose spatial statistics are reduced
                               ACROSS shards with ``psum`` (cross-chip exactness).

    ``batch_axis_name`` additionally shards the batch dim over a second mesh axis
    (DP x SP on a 2-D mesh); the batch axis needs no communication.
    """
    spec_dims = [None] * ndim
    spec_dims[spatial_axis] = axis_name
    if batch_axis_name is not None:
        spec_dims[0] = batch_axis_name
    spec = P(*spec_dims)

    def local_fn(x):
        for entry in layers:
            kind = entry[0]
            if kind == "conv":
                _, fn_l, radius = entry
                padded = halo_exchange(x, radius, axis_name, spatial_axis, boundary=boundary)
                y = fn_l(padded)
                slicer = [slice(None)] * y.ndim
                slicer[spatial_axis] = slice(radius, y.shape[spatial_axis] - radius)
                x = y[tuple(slicer)]
            elif kind == "pointwise":
                x = entry[1](x)
            elif kind == "instance_norm":
                eps = entry[1]
                red = tuple(range(2, x.ndim))
                cnt_local = 1.0
                for a in red:
                    cnt_local *= x.shape[a]
                s = jax.lax.psum(jnp.sum(x, axis=red, keepdims=True), axis_name)
                ss = jax.lax.psum(jnp.sum(x * x, axis=red, keepdims=True), axis_name)
                cnt = jax.lax.psum(jnp.asarray(cnt_local, x.dtype), axis_name)
                mean = s / cnt
                var = ss / cnt - mean * mean
                x = (x - mean) * jax.lax.rsqrt(var + eps)
            else:
                raise ValueError(f"unknown layer kind {kind!r}")
        return x

    return jax.shard_map(local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                         check_vma=False)
