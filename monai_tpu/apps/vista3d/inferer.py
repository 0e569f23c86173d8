"""Point-prompted window inference (reference: monai/apps/vista3d/inferer.py:28)."""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import numpy as np

from ...utils.backend import to_jax, to_numpy
from ...utils.misc import ensure_tuple_rep

__all__ = ["point_based_window_inferer"]


def point_based_window_inferer(inputs: Any, roi_size: Sequence[int], predictor: Callable,
                               point_coords: np.ndarray, point_labels: np.ndarray,
                               class_vector: np.ndarray | None = None,
                               prompt_class: np.ndarray | None = None, prev_mask=None,
                               point_start: int = 0, center_only: bool = True,
                               margin: int = 5, **kwargs):
    """Run the model only on windows containing click prompts, stitched into a full-size
    output (reference: vista3d/inferer.py:28)."""
    import jax.numpy as jnp

    x = to_jax(inputs)
    if x.ndim != 5 or x.shape[0] != 1:
        raise ValueError("point_based_window_inferer only supports a single 3D input (1, C, H, W, D).")
    spatial = x.shape[2:]
    roi = ensure_tuple_rep(roi_size, 3)
    pts = to_numpy(point_coords)
    out = None
    count = None
    for p_idx in range(pts.shape[1] if pts.ndim == 3 else len(pts)):
        p = pts[0, p_idx] if pts.ndim == 3 else pts[p_idx]
        # window centered on the point, clamped to volume
        starts = [int(min(max(int(p[d]) - roi[d] // 2, 0), spatial[d] - roi[d])) for d in range(3)]
        window = x[:, :, starts[0]:starts[0] + roi[0], starts[1]:starts[1] + roi[1],
                   starts[2]:starts[2] + roi[2]]
        local_pts = np.asarray(pts, dtype=np.float32).copy()
        if local_pts.ndim == 2:
            local_pts = local_pts[None]
        local_pts = local_pts - np.asarray(starts, dtype=np.float32)
        pred = predictor(window, point_coords=jnp.asarray(local_pts),
                         point_labels=to_jax(point_labels), class_vector=class_vector,
                         prompt_class=prompt_class, **kwargs)
        pred_np = to_numpy(pred)
        if out is None:
            out = np.zeros((pred_np.shape[0], pred_np.shape[1]) + tuple(spatial), dtype=np.float32)
            count = np.zeros((1, 1) + tuple(spatial), dtype=np.float32)
        sl = (slice(None), slice(None),
              slice(starts[0], starts[0] + roi[0]), slice(starts[1], starts[1] + roi[1]),
              slice(starts[2], starts[2] + roi[2]))
        out[sl] += pred_np
        count[sl] += 1.0
    if out is None:
        raise ValueError("no point prompts provided.")
    out = out / np.maximum(count, 1)
    if prev_mask is not None:
        prev = to_numpy(prev_mask)
        out = np.where(count > 0, out, prev)
    return out
