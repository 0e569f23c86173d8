"""Space-to-depth packed 3D convolution — the TPU lane-occupancy fix for
small-channel 3x3x3 convs (the shallow levels of 3D UNets).

Why: the v5e MXU multiplies 128x128 tiles. A conv with CO=16 output channels maps
CO onto the 128-lane dimension, capping utilisation at 16/128 = 12.5% — and XLA's
conv emitter measures at only 2-4% MFU at these shapes (see
scripts/perf_breakdown.py). Packing a 2x2x2 spatial block into channels turns a
(D,H,W,16) fine conv into a (D/2,H/2,W/2,128) coarse conv with dense 128x128
weight tiles: 8x more MACs (the packed weight is block-structured with 1/8
density) but full lane occupancy, which nets out ~2-4x faster on the shapes that
dominate UNet runtime.

The mapping (per spatial dim): fine output o = 2*O + ao depends on fine input
o + t (t in -1..1) = 2*(O + T) + ai with T = floor((ao+t)/2), ai = (ao+t) % 2.
T stays in {-1,0,1}, so the coarse kernel is 3x3x3 with (8*CI, 8*CO) channel
blocks, exactly one (T, ai) source per (t, ao). SAME-zero padding is exact: the
padded coarse cell supplies zeros for every referenced out-of-range fine voxel.

Reference parity target: the stride-1 3^3 convs of monai/networks/blocks/
convolutions.py ResidualUnit (via lax.conv_general_dilated semantics).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["pack_factors", "pack_conv3x3_weights", "space_to_depth", "depth_to_space",
           "packed_conv3x3"]

_LANES = 128


def pack_factors(ci: int, co: int, spatial: tuple[int, ...]) -> tuple[int, int, int] | None:
    """Per-dim pack factors (1 or 2) for a 3D conv, or None when packing can't help.

    Packs just enough to bring the channel dims toward the 128-lane width; every
    packed dim doubles the MAC count, so stop as soon as max(ci, co)*p >= 128.
    """
    if len(spatial) != 3:
        return None
    base = max(ci, co)
    if base >= _LANES:
        return None
    p = [1, 1, 1]
    total = 1
    # pack W, then H, then D (minor-to-major: favours layout-friendly reshapes)
    for d in (2, 1, 0):
        if base * total >= _LANES or total == 8:
            break
        if spatial[d] % 2 != 0 or spatial[d] < 4:
            continue
        p[d] = 2
        total *= 2
    if total == 1:
        return None
    return tuple(p)


@functools.lru_cache(maxsize=16)
def _pack_map(pack: tuple[int, int, int]) -> np.ndarray:
    """Constant mapping tensor M (3,3,3, P_ao, P_ai, 3,3,3) in {0,1}:
    M[t, ao, ai, T] = 1 iff fine tap t feeding out-parity ao reads in-parity ai of
    coarse-offset T. Host-built once per pack config."""
    P = int(np.prod(pack))
    M = np.zeros((3, 3, 3, P, P, 3, 3, 3), np.float32)
    n2, n1, n0 = pack
    for aoz in range(n2):
        for aoy in range(n1):
            for aox in range(n0):
                ao = (aoz * n1 + aoy) * n0 + aox
                for tz in (-1, 0, 1):
                    Tz, aiz = ((aoz + tz) // 2, (aoz + tz) % 2) if n2 == 2 else (tz, 0)
                    for ty in (-1, 0, 1):
                        Ty, aiy = ((aoy + ty) // 2, (aoy + ty) % 2) if n1 == 2 else (ty, 0)
                        for tx in (-1, 0, 1):
                            Tx, aix = ((aox + tx) // 2, (aox + tx) % 2) if n0 == 2 else (tx, 0)
                            ai = (aiz * n1 + aiy) * n0 + aix
                            M[tz + 1, ty + 1, tx + 1, ao, ai, Tz + 1, Ty + 1, Tx + 1] = 1.0
    return M


def pack_conv3x3_weights(w: jnp.ndarray, pack: tuple[int, int, int]) -> jnp.ndarray:
    """Fine (3,3,3,CI,CO) -> coarse (3,3,3, P*CI, P*CO) packed weights (P=prod(pack)).

    One einsum with a constant {0,1} mapping tensor — a single tiny HLO op that
    XLA schedules off the critical path.
    """
    ci, co = w.shape[3], w.shape[4]
    P = int(np.prod(pack))
    M = jnp.asarray(_pack_map(tuple(pack)), w.dtype)
    # (t3, ao, ai, T3) x (t3, ci, co) -> (T3, ai, ci, ao, co)
    wp = jnp.einsum("tuvabTUV,tuvio->TUVbiao", M, w)
    return wp.reshape(3, 3, 3, P * ci, P * co)


def space_to_depth(x: jnp.ndarray, pack: tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D/p0, H/p1, W/p2, P*C), channels-last."""
    b, d, h, w, c = x.shape
    p0, p1, p2 = pack
    x = x.reshape(b, d // p0, p0, h // p1, p1, w // p2, p2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // p0, h // p1, w // p2, p0 * p1 * p2 * c)


def depth_to_space(x: jnp.ndarray, pack: tuple[int, int, int], c: int) -> jnp.ndarray:
    """Inverse of space_to_depth for the given fine channel count c."""
    b, d, h, w, _ = x.shape
    p0, p1, p2 = pack
    x = x.reshape(b, d, h, w, p0, p1, p2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d * p0, h * p1, w * p2, c)


def packed_conv3x3(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None,
                   pack: tuple[int, int, int] | None = None) -> jnp.ndarray:
    """SAME stride-1 3x3x3 conv on channels-last (B,D,H,W,CI) via channel packing.

    ``w`` is the canonical fine kernel (3,3,3,CI,CO); the packed weight is built
    in-trace (tiny). Falls back to the caller's conv when ``pack`` is None.
    """
    ci, co = w.shape[3], w.shape[4]
    if pack is None:
        pack = pack_factors(ci, co, x.shape[1:4])
    if pack is None:
        raise ValueError("no usable pack factors for this shape")
    wp = pack_conv3x3_weights(w, pack)
    xp = space_to_depth(x, pack)
    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape, ("NDHWC", "DHWIO", "NDHWC"))
    yp = jax.lax.conv_general_dilated(xp, wp, (1, 1, 1), "SAME", dimension_numbers=dn,
                                      preferred_element_type=jnp.float32)
    y = depth_to_space(yp.astype(x.dtype), pack, co)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
