"""Lane-aware weight-gradient VJP for 3D 3x3x3 stride-1 SAME convolutions.

Why: the MXU multiplies 128x128 tiles, and XLA lays out a conv weight gradient
``dW (kd,kh,kw,ci,co)`` with ``co`` minor — on a conv with few output channels
(UNet's CO=2 output tail, the CO<CI decoder convs) that leaves 2 of 128 lanes
occupied.  The r4 train-step trace (scripts/perf_xprof.py train) showed one
such fusion — ``bf16[3,3,3,32,2] <- (4,96^3,2){T(2,128)}`` — costing 16.3 ms of
a 74 ms step (22%).

Fix: for stride-1 SAME convs the weight gradient is symmetric in the roles of
input and cotangent::

    dW[k, ci, co] = sum_{b,t} x[b, t, ci] * g_pad[b, t + 1 - k, co]
                  = dW'[flip(k), co, ci]

where ``dW'`` is the weight gradient of the *swapped* conv ``conv(g, V)`` with
cotangent ``x``.  Computing the swapped orientation puts ``ci`` on the minor
(lane) dim, so the conv with the *larger* channel count on lanes is always
available.  The derivation holds exactly for odd kernels with SAME padding and
stride 1 (both sums are finite with zero padding); no approximation anywhere —
this changes layout, not arithmetic.

The input gradient keeps the standard transposed-conv form.

Reference behavior target: plain torch Conv3d autograd
(monai/networks/blocks/convolutions.py:25 uses stock convs; the reference gets
its layouts from cuDNN heuristics — this module is the TPU-native equivalent).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv3x3_lane_wgrad", "wgrad_wants_swap"]


def wgrad_wants_swap(in_features: int, out_features: int) -> bool:
    """True when the swapped weight-grad orientation strictly improves lane
    occupancy: min(ci,128) > min(co,128) with headroom (2x) so borderline cases
    keep XLA's default."""
    return min(in_features, 128) >= 2 * min(out_features, 128)


def _dn(x_shape, w_shape):
    return lax.conv_dimension_numbers(x_shape, w_shape, ("NDHWC", "DHWIO", "NDHWC"))


def _conv_same(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1),) * 3, dimension_numbers=_dn(x.shape, w.shape))


@jax.custom_vjp
def conv3x3_lane_wgrad(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``lax.conv_general_dilated`` (NDHWC/DHWIO, stride 1, SAME) with a weight
    gradient computed in the swapped orientation (ci on the 128-lane minor dim).

    Forward numerics and the input gradient are bit-identical to the stock conv;
    only the weight-grad *layout orientation* changes (same reduction set, MXU
    f32 accumulation either way)."""
    return _conv_same(x, w)


def _fwd(x, w):
    return _conv_same(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # input gradient: the standard transposed conv
    w_t = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)  # (kd,kh,kw,co,ci)
    dx = _conv_same(g, w_t)

    # weight gradient, swapped orientation: weight-grad of conv(g, V) with
    # cotangent x puts ci minor; un-flip + transpose back to (k..., ci, co)
    co, ci = w.shape[3], w.shape[4]

    def swapped(v):
        return _conv_same(g, v)

    _, vjp = jax.vjp(swapped, jnp.zeros(w.shape[:3] + (w.shape[4], w.shape[3]), g.dtype))
    (dw_s,) = vjp(x.astype(g.dtype))
    dw = jnp.flip(dw_s, (0, 1, 2)).swapaxes(3, 4).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv3x3_lane_wgrad.defvjp(_fwd, _bwd)
