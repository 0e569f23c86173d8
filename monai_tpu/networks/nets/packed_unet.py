"""Packed-layout executor for the standard ``UNet`` module — runs the SAME
parameters through a space-to-depth level-resident plan (ops/packed_level.py)
so the lane-starved fine levels (CO <= 16 on a 128-lane MXU) execute as dense
128-channel coarse convs.

Scope (guarded by ``packable``): spatial_dims=3, kernel=up_kernel=3, all
strides=2, >=3 channel levels, num_res_units>=1, INSTANCE norm, elementwise
activations with at most scalar params (PRELU/RELU/...), no dropout, input
spatial divisible by 4. Anything else must use the module's plain forward.
Numerics: identical reduction sets; differences vs the fine path are
conv-accumulation-order rounding only.

The packed region is the TOP fine level (the widest grids, smallest channels,
fine CO = channels[0] <= 16 where the measured XLA MFU is far below even the
CO/128 lane ceiling): down0's stride-1 subunit convs, the L0 skip concat, and
the L1 up path (transposed conv emitting packed output + its res-unit) all run
packed; inner levels (fine channels >= 32: lane ceiling >= 25%, packing's 8x MAC
inflation loses) run the module tree unchanged. ``pack_tail`` additionally runs
the 96^3 CO=2 output tail (transposed conv + final res-unit) packed as CO=16
coarse ops.

Measured end-to-end on v5e (scripts/perf_packed_unet_ab.py, bench UNet, B=18
bf16 96^3 windows, two-K slope timing, r4):

    plain                32.21 ms
    tail-only            26.61 ms   <- 1.21x, ADOPTED by bench sliding-window eval
    packed (level0)      52.16 ms   (8x MAC inflation loses even level-resident)
    packed+tail          45.66 ms

The r4 xprof trace explains why only the tail wins: the 96^3 CO=2 output conv
fuses with the channel-first transpose into one 8 ms/iter fusion (24% of the
whole forward) — C=2 minor-dim layouts are the pathology, and CO=16 coarse ops
at 48^3 remove it; at 48^3 CO=16 the composition is norm-bound, not conv-bound,
so inflating MACs 8x only adds work. Use ``pack_tail=True, pack_level0=False``.

Reference behavior target: monai/networks/nets/unet.py:27 forward.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import nnx

from ...ops.packed_level import (
    depth_to_space,
    pack_conv3x3_weights,
    pack_w_convT,
    packed_cat,
    packed_conv,
    packed_instance_norm,
    space_to_depth,
    tile_bias,
)

__all__ = ["packable", "packed_unet_forward"]

_PACK = (2, 2, 2)


def packable(unet, x_shape) -> bool:
    """True when ``unet``/input match the packed executor's guarded scope."""
    try:
        if unet.spatial_dims != 3 or unet.num_res_units < 1:
            return False
        if np.any(np.atleast_1d(unet.kernel_size) != 3):
            return False
        if np.any(np.atleast_1d(unet.up_kernel_size) != 3):
            return False
        if any(np.any(np.atleast_1d(s) != 2) for s in unet.strides):
            return False
        if unet.dropout:
            return False
        norm = unet.norm
        norm_name = norm[0] if isinstance(norm, (tuple, list)) else norm
        if str(norm_name).upper() != "INSTANCE":
            return False
        if len(unet.channels) < 3 or unet.channels[0] > 16:
            return False  # packing only wins when the top level is lane-starved
        spatial = x_shape[2:]
        if len(spatial) != 3 or any(int(s) % 4 != 0 for s in spatial):
            return False
        return True
    except Exception:
        return False


def _apply_adn_packed(adn, x, fine_c):
    """Apply a Convolution block's adn list on a packed tensor: GroupNorm modules
    become grouped-stat instance norms; everything else must be elementwise (the
    ``packable`` guard enforces INSTANCE norm + scalar-param activations)."""
    from ..layers.fast_norm import InstanceNormTPU

    for op in adn or ():
        if isinstance(op, (nnx.GroupNorm, InstanceNormTPU)):
            scale = op.scale.value if op.use_scale else None
            bias = op.bias.value if op.use_bias else None
            x = packed_instance_norm(x, fine_c, eps=op.epsilon, scale=scale, bias=bias)
        else:
            x = op(x)
    return x


def _conv_w(conv):
    b = getattr(conv, "bias", None)
    return conv.kernel.value, (b.value if b is not None else None)


def _packed_s1_convolution(block, x, fine_c):
    """A stride-1 ``Convolution`` block (conv + adn) on a packed tensor."""
    w, b = _conv_w(block.conv)
    y = packed_conv(x, pack_conv3x3_weights(w, _PACK), "s1")
    if b is not None:
        y = y + tile_bias(b, y.shape[-1]).astype(y.dtype)
    return _apply_adn_packed(block.adn, y, fine_c)


def _packed_up_seq(mods, x_fine, out_c):
    """The up path [Convolution^T, ResidualUnit] with FINE input and packed
    output: the transposed conv emits packed parities directly (pack_w_convT),
    the res-unit (in==out, stride 1, identity residual) runs packed."""
    convt = mods[0]
    w, b = _conv_w(convt.conv)
    q = packed_conv(x_fine, pack_w_convT(w), "convT")
    if b is not None:
        q = q + tile_bias(b, q.shape[-1]).astype(q.dtype)
    q = _apply_adn_packed(convt.adn, q, out_c)
    if len(mods) > 1:
        ru = mods[1]
        rq = q
        for cu in ru.convs:
            rq = _packed_s1_convolution(cu, rq, out_c)
        q = rq + (q if ru.residual is None else _packed_residual(ru, q))
    return q


def _packed_residual(ru, q):
    # only reachable for in!=out stride-1 res-units (not produced by UNet's up
    # path); 1x1x1 residual = per-parity channel matmul, no spatial movement
    res_w = ru.residual.kernel.value
    if res_w.shape[0] != 1:
        return space_to_depth(ru.residual(depth_to_space(q, _PACK, ru.in_channels)), _PACK)
    rp = jnp.einsum("...pc,co->...po",
                    q.reshape(*q.shape[:-1], 8, ru.in_channels),
                    res_w.reshape(ru.in_channels, ru.out_channels))
    if ru.residual.bias is not None:
        rp = rp + ru.residual.bias.value.astype(rp.dtype)
    return rp.reshape(*q.shape[:-1], 8 * ru.out_channels)


def packed_unet_forward(unet, x: jnp.ndarray, pack_tail: bool = False,
                        pack_level0: bool = True, channels_last: bool = False) -> jnp.ndarray:
    """Channel-first forward of ``unet`` with packed regions selectable.

    ``pack_level0`` packs the top fine level (down0 subunits + L1 up path + L0
    skip concat); ``pack_tail`` packs the output tail (up0's transposed conv +
    final res-unit — the CO=out_channels ops whose fine emission measured
    pathologically slow). Mirrors UNet.__call__/_Level composition (nets/unet.py)
    down to the L1 up path; levels below run the unmodified module tree.

    ``channels_last`` takes/returns (B, *spatial, C) directly — the TPU-native
    boundary for callers (e.g. a channels_last DiceCELoss train step) that stay
    in the network's internal layout and skip the full-size logits transposes.
    """
    if channels_last:
        h = x
    else:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)  # channels-last

    level0 = unet.model            # _Level(down0, skip(L1), up0)
    down0 = level0.down            # ResidualUnit(in -> c0, stride 2)
    level1 = level0.skip.submodule  # _Level(down1, skip(L2...), up1)
    up0_mods = list(level0.up.mods) if hasattr(level0.up, "mods") else [level0.up]
    up1_mods = list(level1.up.mods) if hasattr(level1.up, "mods") else [level1.up]
    c0 = unet.channels[0]
    out_c = unet.out_channels

    if pack_level0:
        # ---- down0: conv1 fine -> s2d once -> remaining subunits packed
        conv1 = down0.convs[0]
        f = conv1.conv(h)                               # fine (.., S/2^3, c0)
        p = space_to_depth(f, _PACK)                    # packed (.., S/4^3, 8*c0)
        p = _apply_adn_packed(conv1.adn, p, c0)
        for cu in list(down0.convs)[1:]:                # stride-1 subunit convs
            p = _packed_s1_convolution(cu, p, c0)
        res0 = down0.residual(h) if down0.residual is not None else h
        dn0_packed = p + space_to_depth(res0, _PACK)

        # ---- inner tree (fine): down1 + below + the L1 skip concat
        fine0 = depth_to_space(dn0_packed, _PACK, c0)
        dn1_out = level1.down(fine0)
        sub1_out = level1.skip.submodule(dn1_out)
        cat1_fine = jnp.concatenate([dn1_out, sub1_out], axis=-1)

        # ---- L1 up path packed: convT(2*c1 -> c0) emits packed output
        up1_packed = _packed_up_seq(up1_mods, cat1_fine, c0)
        cat0_packed = packed_cat(dn0_packed, c0, up1_packed, c0)
        cat0_fine = depth_to_space(cat0_packed, _PACK, 2 * c0)
    else:
        dn0_out = down0(h)
        sub_out = level0.skip.submodule(dn0_out)
        cat0_fine = jnp.concatenate([dn0_out, sub_out], axis=-1)

    if pack_tail:
        tail_packed = _packed_up_seq(up0_mods, cat0_fine, out_c)
        out = depth_to_space(tail_packed, _PACK, out_c)
    else:
        out = cat0_fine
        for m in up0_mods:
            out = m(out)

    if channels_last:
        return out
    perm_out = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
    return jnp.transpose(out, perm_out)
