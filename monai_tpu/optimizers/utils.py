"""Optimizer helpers (reference: monai/optimizers/utils.py:23 generate_param_groups).

In optax, per-group hyperparameters are expressed with ``optax.multi_transform`` over a
parameter-label pytree; this helper builds the (labels, transforms) pair.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import optax

__all__ = ["generate_param_groups"]


def generate_param_groups(params: Any, layer_matches: Sequence[Callable], match_types: Sequence[str],
                          lr_values: Sequence[float], base_tx_factory: Callable = optax.adam,
                          include_others: bool = True, base_lr: float = 1e-3):
    """Build an optax.multi_transform assigning different LRs to matched params.

    ``layer_matches``: callables taking a flat param path string → bool (analogous to the
    reference's 'select'/'filter' modes).
    Returns (labels_pytree_fn_input, optax transformation).
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    labels_flat = []
    for path, _leaf in flat:
        path_str = "/".join(str(p) for p in path)
        label = "default"
        for i, match in enumerate(layer_matches):
            try:
                hit = match(path_str)
            except TypeError:
                hit = False
            if hit:
                label = f"group{i}"
                break
        labels_flat.append(label)
    labels = jax.tree_util.tree_unflatten(treedef, labels_flat)
    transforms = {f"group{i}": base_tx_factory(lr) for i, lr in enumerate(lr_values)}
    transforms["default"] = base_tx_factory(base_lr) if include_others else optax.set_to_zero()
    return labels, optax.multi_transform(transforms, labels)
