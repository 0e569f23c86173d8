"""Batch-wise inverse (reference: monai/transforms/inverse_batch_transform.py:54
BatchInverseTransform, :114 Decollated)."""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ..data.utils import decollate_batch, no_collation
from .inverse import InvertibleTransform
from .transform import Transform

__all__ = ["BatchInverseTransform"]


class BatchInverseTransform(Transform):
    """Invert a transform over a whole batch by decollating into per-sample dicts,
    applying ``transform.inverse`` to each, and returning the list
    (reference: inverse_batch_transform.py:54).

    The torch version spins up a DataLoader to parallelize; here inversion is a cheap
    host-side loop (the heavy resampling inside is jitted per-shape anyway).
    """

    def __init__(self, transform: InvertibleTransform, loader: Any = None,
                 collate_fn: Callable | None = no_collation, num_workers: int | None = 0,
                 detach: bool = True, pad_batch: bool = True, fill_value=None):
        self.transform = transform
        self.collate_fn = collate_fn
        self.detach = detach
        self.pad_batch = pad_batch
        self.fill_value = fill_value

    def __call__(self, data: dict) -> Any:
        decollated = decollate_batch(data, detach=self.detach, pad=self.pad_batch,
                                     fill_value=self.fill_value)
        inverted = [self.transform.inverse(item) for item in decollated]
        if self.collate_fn is not None:
            return self.collate_fn(inverted)
        return inverted
