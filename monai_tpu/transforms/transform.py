"""Transform base protocol.

Parity targets: monai/transforms/transform.py (Transform:244, MapTransform:372,
Randomizable:183, RandomizableTransform:447, apply_transform:101).

Randomization model: host-side numpy ``RandomState`` per transform (identical contract
to the reference, which keeps data-pipeline determinism independent of the device), with
:mod:`monai_tpu.utils.prng` bridging to jax PRNG keys for device-side sampling.
"""
from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from collections.abc import Callable, Generator, Hashable, Iterable, Mapping
from typing import Any

import numpy as np

from ..config.type_definitions import KeysCollection
from ..utils.enums import TransformBackends
from ..utils.misc import ensure_tuple, first
from ..utils.prng import MAX_SEED
from .traits import LazyTrait, RandomizableTrait, ThreadUnsafe

__all__ = [
    "Transform",
    "MapTransform",
    "Randomizable",
    "RandomizableTransform",
    "LazyTransform",
    "apply_transform",
]


class Randomizable(ThreadUnsafe, RandomizableTrait):
    """Provides a local numpy RandomState ``R`` (reference: transform.py:183)."""

    R: np.random.RandomState = np.random.RandomState()

    def set_random_state(self, seed: int | None = None,
                         state: np.random.RandomState | None = None) -> "Randomizable":
        if seed is not None:
            _seed = id(seed) if not isinstance(seed, (int, np.integer)) else int(seed)
            _seed = _seed % MAX_SEED
            self.R = np.random.RandomState(_seed)
            return self
        if state is not None:
            if not isinstance(state, np.random.RandomState):
                raise TypeError(f"state must be a RandomState, got {type(state).__name__}")
            self.R = state
            return self
        self.R = np.random.RandomState()
        return self

    def randomize(self, data: Any) -> None:
        """Draw random parameters from ``self.R`` (host-side; all randomness outside jit)."""
        raise NotImplementedError(f"Subclass {self.__class__.__name__} must implement this method.")


class Transform(ABC):
    """A callable over array-like data (reference: transform.py:244).

    ``backend`` lists supported array namespaces; most transforms here support both
    NUMPY (host pipeline) and JAX.
    """

    backend: list[TransformBackends] = []

    @abstractmethod
    def __call__(self, data: Any):
        raise NotImplementedError(f"Subclass {self.__class__.__name__} must implement this method.")


class LazyTransform(Transform, LazyTrait):
    """Transform that can accumulate its spatial action as a pending operation
    (reference: transform.py:291)."""

    def __init__(self, lazy: bool | None = False):
        if lazy is not None and not isinstance(lazy, bool):
            raise TypeError(f"lazy must be a bool or None, got {type(lazy)}")
        self._lazy = lazy

    @property
    def lazy(self):
        return self._lazy

    @lazy.setter
    def lazy(self, lazy: bool | None):
        if lazy is not None and not isinstance(lazy, bool):
            raise TypeError(f"lazy must be a bool or None, got {type(lazy)}")
        self._lazy = lazy

    @property
    def requires_current_data(self):
        return False


class RandomizableTransform(Randomizable, Transform):
    """Randomized transform with probability gate (reference: transform.py:447)."""

    def __init__(self, prob: float = 1.0, do_transform: bool = True):
        self._do_transform = do_transform
        self.prob = min(max(prob, 0.0), 1.0)

    def randomize(self, data: Any) -> None:
        self._do_transform = self.R.rand() < self.prob


class MapTransform(Transform):
    """Dictionary-of-arrays transform with ``keys`` (reference: transform.py:372)."""

    def __init__(self, keys: KeysCollection, allow_missing_keys: bool = False):
        self.keys: tuple[Hashable, ...] = ensure_tuple(keys)
        self.allow_missing_keys = allow_missing_keys
        if not self.keys:
            raise ValueError("keys must be non-empty")
        for key in self.keys:
            if not isinstance(key, Hashable):
                raise TypeError(f"keys must be hashable, got {type(key).__name__}")

    def key_iterator(self, data: Mapping[Hashable, Any], *extra_iterables) -> Generator:
        """Yield each configured key present in ``data``; with extra iterables,
        yield ``(key, *extras)`` tuples zipped positionally against ``self.keys``
        (reference semantics: transform.py:465)."""
        extras = extra_iterables if extra_iterables else ((None,) * len(self.keys),)
        for entry in zip(self.keys, *extras):
            key = entry[0]
            if key not in data:
                if self.allow_missing_keys:
                    continue
                raise KeyError(
                    f"{self.__class__.__name__}: required key {key!r} not found in data "
                    "(pass allow_missing_keys=True to skip absent keys).")
            yield entry if extra_iterables else key

    def first_key(self, data: dict[Hashable, Any]):
        return first(self.key_iterator(data), ())

    def call_update(self, data):
        """Hook for subclasses to refresh bookkeeping after dictionary updates."""
        return data


def _apply_transform(transform: Callable, data: Any, unpack_parameters: bool = False,
                     lazy: bool | None = False, overrides: dict | None = None):
    from .lazy_executor import apply_pending_transforms_in_order

    data = apply_pending_transforms_in_order(transform, data, lazy, overrides)
    if isinstance(data, tuple) and unpack_parameters:
        return transform(*data, lazy=lazy) if isinstance(transform, LazyTrait) else transform(*data)
    return transform(data, lazy=lazy) if isinstance(transform, LazyTrait) else transform(data)


def apply_transform(transform: Callable, data: Any, map_items: bool = True,
                    unpack_items: bool = False, log_stats: bool | str = False,
                    lazy: bool | None = None, overrides: dict | None = None) -> Any:
    """Apply ``transform`` to ``data``, fanning out over lists
    (reference: transform.py:101; error wrapping :143-180)."""
    try:
        if isinstance(data, (list, tuple)) and map_items:
            return [_apply_transform(transform, item, unpack_items, lazy, overrides) for item in data]
        return _apply_transform(transform, data, unpack_items, lazy, overrides)
    except Exception as e:
        if log_stats:
            logger = logging.getLogger(log_stats if isinstance(log_stats, str) else "monai_tpu.transforms")
            logger.error(f"Error applying transform {transform!r} to data of type {type(data)}")
        raise RuntimeError(f"applying transform {transform}") from e
