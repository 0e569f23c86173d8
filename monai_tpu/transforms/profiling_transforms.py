"""Profiler-range transforms — the TPU analog of the reference's NVTX transforms
(reference: monai/transforms/nvtx.py:51 RangePush, :79 RangePop, :97 Mark).

On TPU the equivalent of NVTX ranges is `jax.profiler` trace annotations: ranges show
up in the XLA/perfetto trace viewer when capturing with `jax.profiler.trace`.
"""
from __future__ import annotations

from typing import Any

from .traits import RandomizableTrait
from .transform import Transform

__all__ = ["RangePush", "RandRangePush", "RangePop", "RandRangePop", "Mark", "RandMark",
           "RangePushd", "RandRangePushd", "RangePopd", "RandRangePopd", "Markd",
           "RandMarkd"]

_range_stack: list = []


class RangePush(Transform):
    """Open a named profiler range (reference: nvtx.py:51)."""

    def __init__(self, msg: str):
        self.msg = msg

    def __call__(self, data: Any) -> Any:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(self.msg)
        ctx.__enter__()
        _range_stack.append(ctx)
        return data


class RandRangePush(RangePush, RandomizableTrait):
    """RangePush that composes into random-transform chains without blocking caching
    (reference: nvtx.py:69)."""


class RangePop(Transform):
    """Close the most recent profiler range (reference: nvtx.py:79)."""

    def __call__(self, data: Any) -> Any:
        if _range_stack:
            _range_stack.pop().__exit__(None, None, None)
        return data


class RandRangePop(RangePop, RandomizableTrait):
    """(reference: nvtx.py:88)."""


class Mark(Transform):
    """Instantaneous profiler event (reference: nvtx.py:97). jax has no direct
    instant-marker API; emits a zero-length trace annotation."""

    def __init__(self, msg: str):
        self.msg = msg

    def __call__(self, data: Any) -> Any:
        import jax.profiler

        with jax.profiler.TraceAnnotation(self.msg):
            pass
        return data


class RandMark(Mark, RandomizableTrait):
    """(reference: nvtx.py:115)."""


# the reference aliases dict variants to the array ones (they act on the whole dict)
RangePushd = RangePushD = RangePushDict = RangePush
RandRangePushd = RandRangePushD = RandRangePushDict = RandRangePush
RangePopd = RangePopD = RangePopDict = RangePop
RandRangePopd = RandRangePopD = RandRangePopDict = RandRangePop
Markd = MarkD = MarkDict = Mark
RandMarkd = RandMarkD = RandMarkDict = RandMark
