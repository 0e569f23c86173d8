"""Sliding-window inference for HoVerNet (reference:
monai/apps/pathology/inferers/inferer.py:28 SlidingWindowHoVerNetInferer).

HoVerNet in "original" mode emits valid-conv outputs smaller than its input window
(270 -> 80). The reference pads every head back to the window size and zeroes the
importance map over the padded ring so only real pixels are blended. Here the same
effect is achieved ahead of the jitted stitch: the network is wrapped to pad its
output leaves to the window size (static shapes), and the zero-ringed importance
map is passed as ``roi_weight_map`` so padded pixels contribute neither to the
numerator nor the denominator of the blend."""
from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ...data.utils import compute_importance_map
from ...inferers.inferer import SlidingWindowInferer
from ...inferers.utils import sliding_window_inference
from ...utils.misc import fall_back_tuple

__all__ = ["SlidingWindowHoVerNetInferer"]


class SlidingWindowHoVerNetInferer(SlidingWindowInferer):
    """SlidingWindowInferer that re-pads shrunken (valid-conv) network outputs and
    supports ``extra_input_padding`` (reference: pathology/inferers/inferer.py:28).

    ``extra_input_padding`` follows the torch ``F.pad`` convention: an even-length
    tuple of (before, after) pairs starting from the LAST spatial dimension."""

    def __init__(self, *args, extra_input_padding: tuple[int, ...] | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.extra_input_padding = extra_input_padding

    def __call__(self, inputs: Any, network: Callable, *args, **kwargs):
        num_spatial_dims = inputs.ndim - 2
        if self.extra_input_padding:
            image_size_original = inputs.shape[2:]
            pad_width = [(0, 0), (0, 0)] + [(0, 0)] * num_spatial_dims
            for sp in range(len(self.extra_input_padding) // 2):
                # F.pad pairs run from the last dim backwards
                pad_width[inputs.ndim - 1 - sp] = (self.extra_input_padding[sp * 2],
                                                   self.extra_input_padding[sp * 2 + 1])
            inputs = jnp.pad(jnp.asarray(inputs), pad_width, mode="constant",
                             constant_values=self.cval)

        roi_size = fall_back_tuple(self.roi_size, inputs.shape[2:])

        # probe the network's output spatial size (no FLOPs)
        probe = jax.ShapeDtypeStruct((1, inputs.shape[1]) + tuple(roi_size),
                                     jnp.asarray(inputs).dtype)
        out_aval = jax.eval_shape(lambda w: network(w, *args, **kwargs), probe)
        seg_shape = jax.tree_util.tree_leaves(out_aval)[0].shape[2:]

        roi_weight_map = self.roi_weight_map
        wrapped = network
        if tuple(seg_shape) != tuple(roi_size):
            out_pads, valid_slices = [], []
            for window_s, output_s in zip(roi_size, seg_shape):
                pad = max(window_s - output_s, 0)
                half1 = pad // 2
                out_pads.append((half1, pad - half1))
                valid_slices.append(slice(half1, window_s - (pad - half1)))
            cval = self.cval

            def wrapped(w, *a, _net=network, **kw):
                out = _net(w, *a, **kw)
                return jax.tree_util.tree_map(
                    lambda t: jnp.pad(t, [(0, 0), (0, 0)] + out_pads, mode="constant",
                                      constant_values=cval), out)

            imp = np.asarray(compute_importance_map(tuple(roi_size), mode=self.mode,
                                                    sigma_scale=self.sigma_scale,
                                                    dtype=np.float32))
            zeroed = np.zeros_like(imp)
            zeroed[tuple(valid_slices)] = imp[tuple(valid_slices)]
            roi_weight_map = zeroed

        results = sliding_window_inference(
            inputs, roi_size, self.sw_batch_size, wrapped, overlap=self.overlap,
            mode=self.mode, sigma_scale=self.sigma_scale, padding_mode=self.padding_mode,
            cval=self.cval, sw_device=self.sw_device, device=self.device,
            progress=self.progress, roi_weight_map=roi_weight_map,
            buffer_steps=self.buffer_steps, buffer_dim=self.buffer_dim, *args, **kwargs)

        if self.extra_input_padding:
            extra_slicing: list[slice] = []
            num_padded_dims = len(self.extra_input_padding) // 2
            for sp in range(num_padded_dims):
                lo = self.extra_input_padding[sp * 2]
                extra_slicing.insert(0, slice(lo, image_size_original[num_spatial_dims - sp - 1] + lo))
            for _ in range(inputs.ndim - num_padded_dims):
                extra_slicing.insert(0, slice(None))
            results = jax.tree_util.tree_map(lambda t: t[tuple(extra_slicing)], results)
        return results
