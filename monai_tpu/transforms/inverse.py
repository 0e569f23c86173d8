"""Transform tracing and invertibility.

Parity targets: monai/transforms/inverse.py (TraceableTransform:42,
push_transform/track_transform_meta:130-290, InvertibleTransform:442).

Every spatial op records either a *pending* operation (lazy) or an *applied* operation
carrying enough information (affine matrix, original size, extra info) to invert it.
Affine math is float64 numpy on host — matching the reference's convention
(inverse.py:214-226).
"""
from __future__ import annotations

import threading
from typing import Any, Hashable, Mapping

import numpy as np

from ..data.meta_image import MetaImage, get_track_meta
from ..data.affine_utils import to_affine_nd
from ..utils.enums import LazyAttr, TraceKeys
from .lazy_utils import pending_op
from .transform import Transform

__all__ = ["TraceableTransform", "InvertibleTransform"]

_TRACK_TRANSFORM = threading.local()


class TraceableTransform(Transform):
    """Maintains applied/pending operation stacks on MetaImage (reference: inverse.py:42)."""

    tracing: bool = True

    def set_tracing(self, tracing: bool) -> None:
        self.tracing = tracing

    @staticmethod
    def trace_key(key: Hashable = None):
        """Dict key for non-meta trace stacks (reference: inverse.py:60)."""
        if key is None:
            return f"{TraceKeys.KEY_SUFFIX}"
        return f"{key}{TraceKeys.KEY_SUFFIX}"

    def get_transform_info(self) -> dict:
        return {
            TraceKeys.CLASS_NAME: self.__class__.__name__,
            TraceKeys.ID: id(self),
            TraceKeys.TRACING: self.tracing,
            TraceKeys.DO_TRANSFORM: getattr(self, "_do_transform", True),
        }

    def push_transform(self, data: Any, *args, **kwargs):
        """Record an applied (eager) or pending (lazy) operation.

        kwargs: orig_size, extra_info, sp_size, affine (the op matrix M), lazy,
        mode/padding_mode/align_corners/dtype (resample kwargs for pending ops).
        """
        lazy = kwargs.get("lazy", False)
        if not isinstance(data, MetaImage) or not get_track_meta():
            return data
        info = self.get_transform_info()
        if kwargs.get("replace"):
            # reference semantics (inverse.py push_transform replace=True): a random
            # wrapper delegating to an inner transform re-labels the inner record as
            # its own so its inverse() finds a matching class name
            stack = data.pending_operations if lazy else data.applied_operations
            if stack:
                top = stack[-1]
                top[TraceKeys.CLASS_NAME] = info[TraceKeys.CLASS_NAME]
                top[TraceKeys.ID] = info[TraceKeys.ID]
            return data
        extra_info = kwargs.get("extra_info", {})
        orig_size = kwargs.get("orig_size", data.peek_pending_shape())
        matrix = kwargs.get("affine")
        sp_size = kwargs.get("sp_size", orig_size)
        if lazy and matrix is not None:
            op = pending_op(matrix, sp_size, mode=kwargs.get("mode"),
                            padding_mode=kwargs.get("padding_mode"),
                            align_corners=kwargs.get("align_corners"),
                            dtype=kwargs.get("dtype"))
            if kwargs.get("cval") is not None:
                op["lazy_cval"] = kwargs["cval"]
            op[TraceKeys.CLASS_NAME] = info[TraceKeys.CLASS_NAME]
            op[TraceKeys.ID] = info[TraceKeys.ID]
            op[TraceKeys.ORIG_SIZE] = tuple(int(s) for s in orig_size)
            op[TraceKeys.EXTRA_INFO] = extra_info
            data.push_pending_operation(op)
            return data
        applied = dict(info)
        applied[TraceKeys.ORIG_SIZE] = tuple(int(s) for s in orig_size)
        applied[TraceKeys.EXTRA_INFO] = extra_info
        if matrix is not None:
            applied[TraceKeys.AFFINE] = np.asarray(matrix, dtype=np.float64)
            applied[LazyAttr.SHAPE] = tuple(int(s) for s in sp_size)
            for k_src, k_dst in (("mode", LazyAttr.INTERP_MODE), ("padding_mode", LazyAttr.PADDING_MODE),
                                 ("align_corners", LazyAttr.ALIGN_CORNERS), ("dtype", LazyAttr.DTYPE)):
                if kwargs.get(k_src) is not None:
                    applied[k_dst] = kwargs[k_src]
        data.push_applied_operation(applied)
        return data

    def pop_transform(self, data: Any, check: bool = True):
        """Pop the most recent applied op (reference: inverse.py:380)."""
        if not isinstance(data, MetaImage) or not data.applied_operations:
            raise ValueError("data has no applied operations to pop")
        xform = data.pop_applied_operation()
        if check and xform.get(TraceKeys.CLASS_NAME) != self.__class__.__name__:
            raise RuntimeError(
                f"Expected to pop {self.__class__.__name__} but got {xform.get(TraceKeys.CLASS_NAME)}"
            )
        return xform

    def check_transforms_match(self, transform: Mapping) -> None:
        if transform.get(TraceKeys.CLASS_NAME) != self.__class__.__name__:
            raise RuntimeError(
                f"Error inverting the most recently applied invertible transform "
                f"{transform.get(TraceKeys.CLASS_NAME)}, expected {self.__class__.__name__}."
            )

    def get_most_recent_transform(self, data, pop: bool = False, check: bool = True):
        if not isinstance(data, MetaImage) or not data.applied_operations:
            raise RuntimeError("no applied operations found")
        t = data.applied_operations[-1]
        if check:
            self.check_transforms_match(t)
        if pop:
            data.pop_applied_operation()
        return t


class InvertibleTransform(TraceableTransform):
    """Transform that can undo its applied operation (reference: inverse.py:442).

    The generic inverse for affine-recorded ops: resample with the inverse matrix back
    onto the original spatial size; subclasses with non-spatial effects override.
    """

    def inverse(self, data: Any) -> Any:
        from .lazy_utils import resample
        from ..utils.enums import LazyAttr as L

        if not isinstance(data, MetaImage):
            raise NotImplementedError(f"inverse of {self.__class__.__name__} requires MetaImage input")
        t = self.get_most_recent_transform(data, pop=True)
        matrix = t.get(TraceKeys.AFFINE)
        if matrix is None:
            raise NotImplementedError(f"{self.__class__.__name__} recorded no affine; cannot auto-invert")
        inv = np.linalg.inv(np.asarray(matrix, dtype=np.float64))
        orig_size = t[TraceKeys.ORIG_SIZE]
        kwargs = {
            L.SHAPE: orig_size,
            L.INTERP_MODE: t.get(L.INTERP_MODE, 1),
            L.PADDING_MODE: t.get(L.PADDING_MODE, "zeros"),
            L.ALIGN_CORNERS: t.get(L.ALIGN_CORNERS, False),
        }
        out_data = resample(data.data, inv, kwargs)
        out = data.new_like(out_data)
        r = len(out.affine) - 1
        out.affine = np.asarray(out.affine, dtype=np.float64) @ np.linalg.inv(to_affine_nd(r, matrix))
        out.applied_operations = list(data.applied_operations)
        return out

    def inverse_update(self, data):
        return data
