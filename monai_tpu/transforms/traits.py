"""Transform capability traits (reference: monai/transforms/traits.py)."""
from __future__ import annotations


class LazyTrait:
    """Transform can describe its action as a pending operation (lazy resampling)."""

    @property
    def lazy(self):
        raise NotImplementedError

    @lazy.setter
    def lazy(self, enabled: bool):
        raise NotImplementedError

    @property
    def requires_current_data(self):
        raise NotImplementedError


class InvertibleTrait:
    def inverse(self, data):
        raise NotImplementedError


class RandomizableTrait:
    """Transform has randomized behavior (caching boundary marker)."""


class MultiSampleTrait:
    """Transform produces multiple samples from one input."""


class ThreadUnsafe:
    """Transform keeps mutable state across calls; Compose deep-copies it per-thread."""
