"""Multi-chip sliding-window inference: shard the window batch over the mesh.

Sliding-window evaluation is embarrassingly parallel across windows, so the natural
TPU scaling is to shard the (num_windows, C, *roi) window batch over the 'data' mesh
axis — each chip runs the forward for its windows, XLA all-gathers the outputs, and
the (cheap) stitch runs replicated. No reference counterpart: torch MONAI distributes
over volumes via DDP; this distributes inside a single volume.
"""
from __future__ import annotations

import math
from collections.abc import Callable, Sequence
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_sharded_window_predictor", "sharded_sliding_window_inference"]


def make_sharded_window_predictor(predictor: Callable, mesh: Mesh,
                                  data_axis: str = "data") -> Callable:
    """Wrap a per-window-batch predictor so its input batch is sharded over the mesh.

    The returned callable pads the window batch up to a multiple of the mesh size
    (static shapes per padded size), constrains it to the 'data' axis, and crops the
    output back. Use it as the ``predictor`` of SlidingWindowInferer with a
    ``sw_batch_size`` that is a multiple of the device count for zero padding waste.
    """
    n_dev = math.prod(mesh.devices.shape)
    sharding = NamedSharding(mesh, P(data_axis))

    def sharded_predictor(windows: jnp.ndarray, *args, **kwargs):
        n = windows.shape[0]
        pad = (-n) % n_dev
        if pad:
            windows = jnp.concatenate(
                [windows, jnp.zeros((pad,) + windows.shape[1:], windows.dtype)], axis=0)
        windows = jax.lax.with_sharding_constraint(windows, sharding)
        out = predictor(windows, *args, **kwargs)
        return out[:n] if pad else out

    return sharded_predictor


def sharded_sliding_window_inference(inputs: Any, roi_size: Sequence[int],
                                     sw_batch_size: int, predictor: Callable, mesh: Mesh,
                                     overlap: float = 0.25, mode: str = "gaussian",
                                     data_axis: str = "data", **kwargs):
    """sliding_window_inference with the window batch sharded over ``mesh``
    (see module docstring). ``sw_batch_size`` should be a multiple of the device count.
    """
    from ..inferers.utils import sliding_window_inference

    wrapped = make_sharded_window_predictor(predictor, mesh, data_axis)
    return sliding_window_inference(inputs, roi_size, sw_batch_size, wrapped,
                                    overlap=overlap, mode=mode, **kwargs)
