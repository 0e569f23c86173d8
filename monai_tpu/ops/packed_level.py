"""Level-resident space-to-depth packing for 3D UNets — the TPU answer to
lane-starved small-channel convs (reference workload: monai/networks/nets/unet.py
UNet (16,32,64,128,256)x(2,2,2,2) sliding-window eval, SURVEY §3.3).

The v5e MXU multiplies 128x128 tiles, so a conv with CO output channels cannot
exceed CO/128 of peak — and XLA measures at only ~a third of even that ceiling at
CO=16 (see scripts/perf_packed_level.py). Packing a 2x2x2 spatial block into
channels turns the fine conv into a coarse conv with dense 128-lane weight tiles.
Packing is only a WIN when the lane-occupancy gain exceeds the MAC inflation (the
densified packed weights compute p_total x the fine FLOPs), which on measured v5e
numbers means: fine CO <= 16 (and the CO=2 output tail). Crucially the layout is
LEVEL-RESIDENT: one s2d on entering a resolution level, one d2s on leaving — the
per-conv transposes that made naive packing a 2x end-to-end LOSS
(ops/packed_conv.py history) never happen; norm/act run directly on the packed
layout (grouped stats / elementwise).

Weight maps (derived per dim; o fine output index, O coarse, ao out-parity,
i/I/ai input, t fine tap, T coarse tap; all convs SAME-padded k=3):

- stride-1 conv, packed in+out:    o=2O+ao reads 2O+ao+t-1=2I+ai
    -> T=I-O=(ao+t-1-ai)/2, coarse k3 s1 pad (1,1)   [pack_conv3x3_weights]
- stride-2 conv, packed in+out:    o=2O+ao reads 4O+2ao+t-1=2I+ai
    -> T=I-2O=(2ao+t-1-ai)/2, coarse k3 s2 pad (1,1)  [pack_w_s2]
- stride-2 conv, fine in, packed out: reads 4O+(2ao+t-1)
    -> delta=2ao+t-1 in {-1..3}, coarse k5 s4 pad (1,3)  [pack_w_entry]
- transposed s2 conv (torch adjoint convention, measured: o=2i+1-tau),
  fine in, packed out:  tau=2T+1-ao -> T in {0,1}, coarse k2 s1 pad (0,1)
    [pack_w_convT]

All maps were validated tap-by-tap against the live fine ops (tests/test_packed_level.py).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .packed_conv import depth_to_space, pack_conv3x3_weights, space_to_depth

__all__ = ["space_to_depth", "depth_to_space", "pack_conv3x3_weights", "pack_w_s2",
           "pack_w_entry", "pack_w_convT", "packed_conv", "packed_instance_norm",
           "packed_cat", "tile_bias"]


@functools.lru_cache(maxsize=8)
def _map_s2() -> np.ndarray:
    """M[t3, ao, ai, T3] for the stride-2 packed-in/packed-out conv (pack 2/dim)."""
    M = np.zeros((3, 3, 3, 8, 8, 3, 3, 3), np.float32)

    def dim_entries():
        # (t, ao, ai, T): ai parity-locked to t-1; T=(2ao+t-1-ai)/2
        out = []
        for ao in (0, 1):
            for t in (0, 1, 2):
                ai = (t - 1) % 2
                T = (2 * ao + t - 1 - ai) // 2
                out.append((t, ao, ai, T))
        return out

    E = dim_entries()
    for tz, aoz, aiz, Tz in E:
        for ty, aoy, aiy, Ty in E:
            for tx, aox, aix, Tx in E:
                ao = (aoz * 2 + aoy) * 2 + aox
                ai = (aiz * 2 + aiy) * 2 + aix
                M[tz, ty, tx, ao, ai, Tz + 1, Ty + 1, Tx + 1] = 1.0
    return M


def pack_w_s2(w: jnp.ndarray) -> jnp.ndarray:
    """Fine (3,3,3,CI,CO) stride-2 SAME conv -> coarse (3,3,3,8CI,8CO) stride-2
    conv with explicit pad (1,1) per dim (both sides packed 2/dim)."""
    ci, co = w.shape[3], w.shape[4]
    M = jnp.asarray(_map_s2(), w.dtype)
    wp = jnp.einsum("tuvabTUV,tuvio->TUVbiao", M, w)
    return wp.reshape(3, 3, 3, 8 * ci, 8 * co)


@functools.lru_cache(maxsize=8)
def _map_entry() -> np.ndarray:
    """M[t3, ao, D3] for the fine-input packed-output stride-2 conv: coarse k5 s4,
    tap index D = (2ao+t-1)+1 in 0..4."""
    M = np.zeros((3, 3, 3, 8, 5, 5, 5), np.float32)

    def dim_entries():
        return [(t, ao, 2 * ao + t - 1 + 1) for ao in (0, 1) for t in (0, 1, 2)]

    E = dim_entries()
    for tz, aoz, Dz in E:
        for ty, aoy, Dy in E:
            for tx, aox, Dx in E:
                ao = (aoz * 2 + aoy) * 2 + aox
                M[tz, ty, tx, ao, Dz, Dy, Dx] = 1.0
    return M


def pack_w_entry(w: jnp.ndarray) -> jnp.ndarray:
    """Fine (3,3,3,CI,CO) stride-2 SAME conv -> coarse (5,5,5,CI,8CO) stride-4
    conv with explicit pad (1,3) per dim (fine input, output packed 2/dim)."""
    ci, co = w.shape[3], w.shape[4]
    M = jnp.asarray(_map_entry(), w.dtype)
    wp = jnp.einsum("tuvaDEF,tuvio->DEFiao", M, w)
    return wp.reshape(5, 5, 5, ci, 8 * co)


@functools.lru_cache(maxsize=8)
def _map_convT() -> np.ndarray:
    """M[tau3, ao, K3] for the transposed stride-2 k3 conv (torch adjoint
    convention o = 2i + 1 - tau, validated against an impulse through
    blocks.Convolution) with fine input and packed output: coarse k2 s1 with
    taps at offsets {0,+1} (pad (0,1)), kernel index K = T."""
    M = np.zeros((3, 3, 3, 8, 2, 2, 2), np.float32)

    def dim_entries():
        # tau = 2T + 1 - ao
        return [(2 * T + 1 - ao, ao, T) for ao in (0, 1) for T in (0, 1)
                if 0 <= 2 * T + 1 - ao <= 2]

    E = dim_entries()
    for tz, aoz, Kz in E:
        for ty, aoy, Ky in E:
            for tx, aox, Kx in E:
                ao = (aoz * 2 + aoy) * 2 + aox
                M[tz, ty, tx, ao, Kz, Ky, Kx] = 1.0
    return M


def pack_w_convT(w: jnp.ndarray) -> jnp.ndarray:
    """Fine (3,3,3,CI,CO) ConvTranspose (stride 2, torch padding 1 / output_padding
    1 semantics as built by blocks.Convolution) -> coarse (2,2,2,CI,8CO) stride-1
    conv with explicit pad (1,0) per dim (fine input, output packed 2/dim)."""
    ci, co = w.shape[3], w.shape[4]
    M = jnp.asarray(_map_convT(), w.dtype)
    wp = jnp.einsum("tuvaKLM,tuvio->KLMiao", M, w)
    return wp.reshape(2, 2, 2, ci, 8 * co)


_COARSE_PARAMS = {
    "s1": ((1, 1, 1), ((1, 1),) * 3),
    "s2": ((2, 2, 2), ((1, 1),) * 3),
    "entry": ((4, 4, 4), ((1, 3),) * 3),
    "convT": ((1, 1, 1), ((0, 1),) * 3),
}


def packed_conv(x: jnp.ndarray, wp: jnp.ndarray, case: str,
                bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Run a pre-packed coarse conv. ``bias`` is the FINE bias (CO,), tiled."""
    strides, padding = _COARSE_PARAMS[case]
    y = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), strides, list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        y = y + tile_bias(bias, y.shape[-1]).astype(y.dtype)
    return y


def tile_bias(b: jnp.ndarray, packed_c: int) -> jnp.ndarray:
    """Fine per-channel vector -> packed channels (parity-major tiling)."""
    reps = packed_c // b.shape[0]
    return jnp.tile(b, reps)


def packed_instance_norm(x: jnp.ndarray, fine_c: int, eps: float = 1e-5,
                         scale: jnp.ndarray | None = None,
                         bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Instance norm on a packed layout: per-(sample, FINE-channel) stats over
    (coarse spatial x parities). Matches nnx.GroupNorm(groups=C) on the fine
    layout exactly (same reduction set, f32 accumulation)."""
    b, d, h, w, pc = x.shape
    p = pc // fine_c
    g = x.reshape(b, d, h, w, p, fine_c).astype(jnp.float32)
    m = g.mean(axis=(1, 2, 3, 4), keepdims=True)
    v = ((g - m) ** 2).mean(axis=(1, 2, 3, 4), keepdims=True)
    y = (g - m) * jax.lax.rsqrt(v + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(x.shape).astype(x.dtype)


def packed_cat(a: jnp.ndarray, ca: int, b: jnp.ndarray, cb: int) -> jnp.ndarray:
    """Concatenate two packed tensors along FINE channels (both packed with the
    same parity count); pure lane shuffle, no spatial movement."""
    pa = a.shape[-1] // ca
    sa = a.reshape(*a.shape[:-1], pa, ca)
    sb = b.reshape(*b.shape[:-1], pa, cb)
    return jnp.concatenate([sa, sb], axis=-1).reshape(*a.shape[:-1], pa * (ca + cb))
