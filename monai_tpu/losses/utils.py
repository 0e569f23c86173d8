"""Shared loss arithmetic (reference: monai/losses/utils.py compute_tp_fp_fn)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp

__all__ = ["compute_tp_fp_fn"]


def compute_tp_fp_fn(input: jnp.ndarray, target: jnp.ndarray, reduce_axis: Sequence[int],
                     ord: int, soft_label: bool, decoupled: bool = True):
    """True/false positives and false negatives per class, with the JDTLosses
    norm-based soft-label formulation (reference: losses/utils.py:18)."""
    reduce_axis = tuple(reduce_axis)
    if ord == 1 and not soft_label:
        tp = jnp.sum(input * target, axis=reduce_axis)
        if decoupled:
            fp = jnp.sum(input, axis=reduce_axis) - tp
            fn = jnp.sum(target, axis=reduce_axis) - tp
        else:
            fp = jnp.sum(input * (1 - target), axis=reduce_axis)
            fn = jnp.sum((1 - input) * target, axis=reduce_axis)
    else:
        def vnorm(x):
            if ord == 1:
                return jnp.sum(jnp.abs(x), axis=reduce_axis)
            return jnp.sum(jnp.abs(x) ** ord, axis=reduce_axis) ** (1.0 / ord)

        pred_o, ground_o = vnorm(input), vnorm(target)
        difference = vnorm(input - target)
        if ord > 1:
            pred_o, ground_o, difference = pred_o ** ord, ground_o ** ord, difference ** ord
        tp = (pred_o + ground_o - difference) / 2
        fp = pred_o - tp
        fn = ground_o - tp
    return tp, fp, fn
