"""The lazy-resampling executor: fuse pending ops and flush with ONE resample.

Parity targets: monai/transforms/lazy/functional.py (apply_pending:196,
apply_pending_transforms:96, apply_pending_transforms_in_order:145).

TPU rationale: each fused flush is a single gather-interpolate over the final composed
affine — one pass over HBM instead of one per transform.  Integer-exact chains
(flip/permute/crop/pad) take the no-interpolation fast path.
"""
from __future__ import annotations

import logging
from typing import Any, Mapping, Sequence

import numpy as np

from ..data.meta_image import MetaImage
from ..utils.enums import LazyAttr, TraceKeys
from .lazy_utils import (
    affine_from_pending,
    combine_transforms,
    is_compatible_apply_kwargs,
    kwargs_from_pending,
    resample,
)
from .traits import LazyTrait

__all__ = ["apply_pending", "apply_pending_transforms", "apply_pending_transforms_in_order"]

logger = logging.getLogger(__name__)


def apply_pending(data: Any, pending: list | None = None, overrides: dict | None = None):
    """Compose and execute pending operations with as few resamples as possible
    (reference: lazy/functional.py:196).

    Returns (result, list_of_applied_pending_ops)."""
    overrides = (overrides or {}).copy()
    if isinstance(data, MetaImage) and pending is None:
        pending = list(data.pending_operations)
    pending = [] if pending is None else list(pending)
    if not pending:
        return data, []

    cumulative_xform = affine_from_pending(pending[0])
    if cumulative_xform.shape[0] == 3 and isinstance(data, MetaImage) and len(data.shape) == 4:
        # 2D matrix on 3D data: embed
        from ..data.affine_utils import to_affine_nd

        cumulative_xform = to_affine_nd(3, cumulative_xform)
    cur_kwargs = kwargs_from_pending(pending[0])
    override_kwargs: dict = {}
    if "mode" in overrides:
        override_kwargs[LazyAttr.INTERP_MODE] = overrides["mode"]
    if "padding_mode" in overrides:
        override_kwargs[LazyAttr.PADDING_MODE] = overrides["padding_mode"]
    if "align_corners" in overrides:
        override_kwargs[LazyAttr.ALIGN_CORNERS] = overrides["align_corners"]
    if "dtype" in overrides:
        override_kwargs[LazyAttr.DTYPE] = overrides["dtype"]

    img_data = data.data if isinstance(data, MetaImage) else data
    for p in pending[1:]:
        new_kwargs = kwargs_from_pending(p)
        if not is_compatible_apply_kwargs(cur_kwargs, new_kwargs):
            # flush intermediate (rare: mode switch mid-chain)
            _kw = {**cur_kwargs, **override_kwargs}
            img_data = resample(img_data, cumulative_xform, _kw)
            cumulative_xform = affine_from_pending(p)
        else:
            next_matrix = affine_from_pending(p)
            if next_matrix.shape != cumulative_xform.shape:
                from ..data.affine_utils import to_affine_nd

                r = max(len(next_matrix), len(cumulative_xform)) - 1
                next_matrix = to_affine_nd(r, next_matrix)
                cumulative_xform = to_affine_nd(r, cumulative_xform)
            cumulative_xform = combine_transforms(cumulative_xform, next_matrix)
        cur_kwargs.update(new_kwargs)
    _kw = {**cur_kwargs, **override_kwargs}
    img_data = resample(img_data, cumulative_xform, _kw)

    if isinstance(data, MetaImage):
        return promote_pending_with_data(data, img_data), pending
    return img_data, pending


def promote_pending_with_data(data: "MetaImage", img_data) -> "MetaImage":
    """Finish a lazy flush whose output data was computed externally: adopt
    ``img_data``, clear the pending stack, and move the pending ops onto the
    applied stack so the chain stays invertible."""
    pending = list(data.pending_operations)
    out = data.new_like(img_data)
    out.affine = data.peek_pending_affine()
    out.clear_pending_operations()
    for p in pending:
        applied = {
            TraceKeys.CLASS_NAME: p.get(TraceKeys.CLASS_NAME, "Lazy"),
            TraceKeys.ID: p.get(TraceKeys.ID, -1),
            TraceKeys.ORIG_SIZE: p.get(TraceKeys.ORIG_SIZE),
            TraceKeys.EXTRA_INFO: p.get(TraceKeys.EXTRA_INFO, {}),
            TraceKeys.AFFINE: p[LazyAttr.AFFINE],
            LazyAttr.SHAPE: p.get(LazyAttr.SHAPE),
            LazyAttr.INTERP_MODE: p.get(LazyAttr.INTERP_MODE),
            LazyAttr.PADDING_MODE: p.get(LazyAttr.PADDING_MODE),
            LazyAttr.ALIGN_CORNERS: p.get(LazyAttr.ALIGN_CORNERS),
        }
        out.push_applied_operation(applied)
    return out


def _log_pending_info(transform: Any, data: Any, activity: str, key=None) -> None:
    logger.debug("%s: %s on %s (key=%s)", activity, getattr(transform, '__class__', type(transform)).__name__,
                 type(data).__name__, key)


def apply_pending_transforms(data: Any, keys: Sequence | None = None, overrides: dict | None = None):
    """Flush pending transforms on MetaImage / containers of them
    (reference: lazy/functional.py:96)."""
    if isinstance(data, list):
        return [apply_pending_transforms(d, keys, overrides) for d in data]
    if isinstance(data, tuple):
        return tuple(apply_pending_transforms(d, keys, overrides) for d in data)
    if isinstance(data, dict):
        active_keys = [k for k in data.keys() if keys is None or k in keys]
        out = dict(data)
        for k in active_keys:
            if isinstance(out[k], MetaImage) and out[k].pending_operations:
                k_overrides = overrides.get(k, overrides) if isinstance(overrides, dict) and overrides and any(
                    kk in data for kk in overrides) else overrides
                out[k], _ = apply_pending(out[k], overrides=k_overrides if isinstance(k_overrides, dict) or k_overrides is None else None)
        return out
    if isinstance(data, MetaImage) and data.pending_operations:
        out, _ = apply_pending(data, overrides=overrides)
        return out
    return data


def apply_pending_transforms_in_order(transform: Any, data: Any, lazy: bool | None = None,
                                      overrides: dict | None = None):
    """Flush pending ops *before* running ``transform`` when required for correctness
    (reference: lazy/functional.py:145).

    Pending ops continue to accumulate only if the incoming transform is lazy-capable
    and currently lazy; otherwise flush first.
    """
    must_apply = True
    if isinstance(transform, LazyTrait):
        transform_lazy = lazy if lazy is not None else getattr(transform, "lazy", False)
        if transform_lazy and not transform.requires_current_data:
            must_apply = False
    from .compose import Compose

    if isinstance(transform, Compose):
        must_apply = False  # Compose manages its own flushing
    if must_apply:
        return apply_pending_transforms(data, overrides=overrides)
    return data


class ApplyPending:
    """Pipeline barrier: forces pending lazy ops to be resampled before the next
    transform (reference: lazy/array.py:19). A no-op itself — Compose flushes pending
    operations when it encounters a non-lazy transform."""

    def __call__(self, data):
        return data


class ApplyPendingd:
    """Dict-key variant of ApplyPending (reference: lazy/dictionary.py ApplyPendingd)."""

    def __init__(self, keys):
        from ..utils.misc import ensure_tuple

        self.keys = ensure_tuple(keys)

    def __call__(self, data):
        return data
