"""Compose and friends: sequential/one-of/some-of/random-order transform containers.

Parity targets: monai/transforms/compose.py (execute_compose:47, Compose:123, OneOf:396,
RandomOrder:539, SomeOf:638).
"""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import numpy as np

from ..data.meta_image import MetaImage
from ..utils.enums import TraceKeys
from ..utils.misc import ensure_tuple, get_seed
from ..utils.prng import MAX_SEED
from .inverse import InvertibleTransform
from .lazy_executor import apply_pending_transforms
from .transform import LazyTransform, Randomizable, Transform, apply_transform
from .traits import ThreadUnsafe

__all__ = ["Compose", "OneOf", "RandomOrder", "SomeOf", "execute_compose"]


def execute_compose(data, transforms: Sequence[Any], map_items: bool = True, unpack_items: bool = False,
                    start: int = 0, end: int | None = None, lazy: bool | None = False,
                    overrides: dict | None = None, threading: bool = False,
                    log_stats: bool | str = False) -> Any:
    """Apply each transform in order, flushing pending lazy ops at the end
    (reference: compose.py:47, loop :113, final flush :119)."""
    end_ = len(transforms) if end is None else end
    if start > end_:
        raise ValueError(f"start ({start}) > end ({end_})")
    for _transform in transforms[start:end_]:
        if threading:
            _transform = _copy_thread_unsafe(_transform)
        data = apply_transform(_transform, data, map_items, unpack_items,
                               lazy=lazy, overrides=overrides, log_stats=log_stats)
    data = apply_pending_transforms(data, overrides=overrides)
    return data


def _copy_thread_unsafe(t):
    import copy

    return copy.deepcopy(t) if isinstance(t, ThreadUnsafe) else t


class Compose(Randomizable, InvertibleTransform, LazyTransform):
    """Sequential container (reference: compose.py:123).

    ``lazy``: False → each lazy-capable transform executes eagerly (but still through the
    pending-op machinery, so each op can use the integer fast path); True → pending ops
    accumulate and fuse into the minimum number of actual resamples; None → respect each
    transform's own ``lazy`` flag.
    """

    def __init__(self, transforms: Sequence[Any] | Callable | None = None, map_items: bool = True,
                 unpack_items: bool = False, log_stats: bool | str = False,
                 lazy: bool | None = False, overrides: dict | None = None):
        LazyTransform.__init__(self, lazy=lazy)
        if transforms is None:
            transforms = []
        self.transforms = ensure_tuple(transforms)
        self.map_items = map_items
        self.unpack_items = unpack_items
        self.log_stats = log_stats
        self.overrides = overrides
        self.set_random_state(seed=get_seed())

    @LazyTransform.lazy.setter  # type: ignore
    def lazy(self, val: bool | None):
        self._lazy = val

    def set_random_state(self, seed: int | None = None, state: np.random.RandomState | None = None) -> "Compose":
        super().set_random_state(seed=seed, state=state)
        for _transform in self.transforms:
            if isinstance(_transform, Randomizable):
                _transform.set_random_state(seed=self.R.randint(MAX_SEED, dtype="uint32"))
        return self

    def randomize(self, data: Any = None) -> None:
        for _transform in self.transforms:
            if isinstance(_transform, Randomizable):
                try:
                    _transform.randomize(data)
                except TypeError:
                    pass

    def get_index_of_first(self, predicate: Callable[[Any], bool]) -> int | None:
        for i, t in enumerate(self.transforms):
            if predicate(t):
                return i
        return None

    def flatten(self) -> "Compose":
        """Flatten nested Compose (reference: compose.py:310)."""
        new_transforms = []
        for t in self.transforms:
            if isinstance(t, Compose) and not isinstance(t, (OneOf, RandomOrder, SomeOf)):
                new_transforms += t.flatten().transforms
            else:
                new_transforms.append(t)
        return Compose(new_transforms, self.map_items, self.unpack_items, self.log_stats,
                       self._lazy, self.overrides)

    def __len__(self) -> int:
        return len(self.flatten().transforms)

    def __call__(self, input_, start: int = 0, end: int | None = None, threading: bool = False,
                 lazy: bool | None = None):
        _lazy = self._lazy if lazy is None else lazy
        return execute_compose(input_, self.transforms, start=start, end=end,
                               map_items=self.map_items, unpack_items=self.unpack_items,
                               lazy=_lazy, overrides=self.overrides, threading=threading,
                               log_stats=self.log_stats)

    def inverse(self, data):
        """Invert applied transforms in reverse order (reference: compose.py:361)."""
        invertible_transforms = [t for t in self.flatten().transforms if isinstance(t, InvertibleTransform)]
        for t in reversed(invertible_transforms):
            data = apply_transform(t.inverse, data, self.map_items, self.unpack_items,
                                   log_stats=self.log_stats)
        return data


class OneOf(Compose):
    """Randomly pick one transform, weighted (reference: compose.py:396)."""

    def __init__(self, transforms=None, weights=None, map_items: bool = True, unpack_items: bool = False,
                 log_stats: bool | str = False, lazy: bool | None = False, overrides: dict | None = None):
        super().__init__(transforms, map_items, unpack_items, log_stats, lazy, overrides)
        if len(self.transforms) == 0:
            weights = []
        elif weights is None or isinstance(weights, float):
            weights = [1.0 / len(self.transforms)] * len(self.transforms)
        if len(weights) != len(self.transforms):
            raise ValueError("transforms and weights should be same size if both specified as sequences.")
        self.weights = ensure_tuple(self._normalize_probabilities(weights))

    def _normalize_probabilities(self, weights):
        if len(weights) == 0:
            return weights
        weights = np.array(weights)
        if np.any(weights < 0):
            raise ValueError("Probabilities must be greater than or equal to zero.")
        if np.all(weights == 0):
            raise ValueError("At least one probability must be greater than zero.")
        return (weights / weights.sum()).tolist()

    def flatten(self):
        transforms = []
        weights = []
        for t, w in zip(self.transforms, self.weights):
            if isinstance(t, OneOf):
                tr = t.flatten()
                for t_, w_ in zip(tr.transforms, tr.weights):
                    transforms.append(t_)
                    weights.append(w_ * w)
            else:
                transforms.append(t)
                weights.append(w)
        return OneOf(transforms, weights, self.map_items, self.unpack_items)

    def __call__(self, data, start: int = 0, end: int | None = None, threading: bool = False,
                 lazy: bool | None = None):
        if len(self.transforms) == 0:
            return data
        index = self.R.multinomial(1, self.weights).argmax()
        _transform = self.transforms[index]
        _lazy = self._lazy if lazy is None else lazy
        data = apply_transform(_transform, data, self.map_items, self.unpack_items,
                               lazy=_lazy, overrides=self.overrides, log_stats=self.log_stats)
        # record which was picked, for inverse
        if isinstance(data, MetaImage):
            self.push_transform(data, extra_info={"index": int(index)})
        elif isinstance(data, dict):
            for key in data:
                if isinstance(data[key], MetaImage) and data[key].applied_operations:
                    self.push_transform(data[key], extra_info={"index": int(index)})
        data = apply_pending_transforms(data, overrides=self.overrides)
        return data

    def inverse(self, data):
        if len(self.transforms) == 0:
            return data

        def _get_index(d: MetaImage):
            t = self.get_most_recent_transform(d, pop=True)
            return t[TraceKeys.EXTRA_INFO]["index"]

        index = None
        if isinstance(data, MetaImage):
            index = _get_index(data)
        elif isinstance(data, dict):
            for key in data:
                if isinstance(data[key], MetaImage) and data[key].applied_operations:
                    index = _get_index(data[key])
        if index is None:
            raise RuntimeError("No previous OneOf transform recorded.")
        _transform = self.transforms[index]
        return _transform.inverse(data) if isinstance(_transform, InvertibleTransform) else data


class RandomOrder(Compose):
    """Apply all transforms in random order (reference: compose.py:539)."""

    def __call__(self, input_, start: int = 0, end: int | None = None, threading: bool = False,
                 lazy: bool | None = None):
        if len(self.transforms) == 0:
            return input_
        num = len(self.transforms)
        applied_order = self.R.permutation(range(num))
        _lazy = self._lazy if lazy is None else lazy
        for index in applied_order:
            input_ = apply_transform(self.transforms[index], input_, self.map_items, self.unpack_items,
                                     lazy=_lazy, overrides=self.overrides, log_stats=self.log_stats)
        if isinstance(input_, MetaImage):
            self.push_transform(input_, extra_info={"applied_order": [int(i) for i in applied_order]})
        elif isinstance(input_, dict):
            for key in input_:
                if isinstance(input_[key], MetaImage):
                    self.push_transform(input_[key], extra_info={"applied_order": [int(i) for i in applied_order]})
        input_ = apply_pending_transforms(input_, overrides=self.overrides)
        return input_

    def inverse(self, data):
        if len(self.transforms) == 0:
            return data
        applied_order = None
        if isinstance(data, MetaImage):
            t = self.get_most_recent_transform(data, pop=True)
            applied_order = t[TraceKeys.EXTRA_INFO]["applied_order"]
        elif isinstance(data, dict):
            for key in data:
                if isinstance(data[key], MetaImage) and data[key].applied_operations:
                    t = self.get_most_recent_transform(data[key], pop=True)
                    applied_order = t[TraceKeys.EXTRA_INFO]["applied_order"]
        if applied_order is None:
            raise RuntimeError("No previous RandomOrder transform recorded.")
        for idx in reversed(applied_order):
            t = self.transforms[idx]
            if isinstance(t, InvertibleTransform):
                data = apply_transform(t.inverse, data, self.map_items, self.unpack_items)
        return data


class SomeOf(Compose):
    """Apply a random subset, in random order (reference: compose.py:638)."""

    def __init__(self, transforms=None, map_items: bool = True, unpack_items: bool = False,
                 log_stats: bool | str = False, num_transforms: int | tuple[int, int] | None = None,
                 replace: bool = False, weights: list[int] | None = None,
                 lazy: bool | None = False, overrides: dict | None = None):
        super().__init__(transforms, map_items, unpack_items, log_stats, lazy, overrides)
        self.min_num_transforms, self.max_num_transforms = self._ensure_valid_num_transforms(num_transforms)
        self.replace = replace
        self.weights = self._normalize_probabilities(weights)

    def _ensure_valid_num_transforms(self, num_transforms):
        if num_transforms is None:
            return (0, len(self.transforms))
        if isinstance(num_transforms, int):
            n = min(num_transforms, len(self.transforms))
            return (n, n)
        if isinstance(num_transforms, (tuple, list)) and len(num_transforms) == 2:
            return (int(num_transforms[0]), int(num_transforms[1]))
        raise ValueError(f"Invalid num_transforms: {num_transforms}")

    def _normalize_probabilities(self, weights):
        if weights is None or len(self.transforms) == 0:
            return None
        w = np.array(weights, dtype=float)
        if np.any(w < 0) or np.all(w == 0):
            raise ValueError("invalid weights")
        return (w / w.sum()).tolist()

    def __call__(self, data, start: int = 0, end: int | None = None, threading: bool = False,
                 lazy: bool | None = None):
        if len(self.transforms) == 0:
            return data
        sample_size = self.R.randint(self.min_num_transforms, self.max_num_transforms + 1)
        applied_order = self.R.choice(len(self.transforms), sample_size, replace=self.replace,
                                      p=self.weights).tolist()
        _lazy = self._lazy if lazy is None else lazy
        for i in applied_order:
            data = apply_transform(self.transforms[i], data, self.map_items, self.unpack_items,
                                   lazy=_lazy, overrides=self.overrides, log_stats=self.log_stats)
        if isinstance(data, MetaImage):
            self.push_transform(data, extra_info={"applied_order": [int(i) for i in applied_order]})
        elif isinstance(data, dict):
            for key in data:
                if isinstance(data[key], MetaImage):
                    self.push_transform(data[key], extra_info={"applied_order": [int(i) for i in applied_order]})
        data = apply_pending_transforms(data, overrides=self.overrides)
        return data

    def inverse(self, data):
        if len(self.transforms) == 0:
            return data
        applied_order = None
        if isinstance(data, MetaImage):
            t = self.get_most_recent_transform(data, pop=True)
            applied_order = t[TraceKeys.EXTRA_INFO]["applied_order"]
        elif isinstance(data, dict):
            for key in data:
                if isinstance(data[key], MetaImage) and data[key].applied_operations:
                    t = self.get_most_recent_transform(data[key], pop=True)
                    applied_order = t[TraceKeys.EXTRA_INFO]["applied_order"]
        if applied_order is None:
            raise RuntimeError("No previous SomeOf transform recorded.")
        for idx in reversed(applied_order):
            t = self.transforms[idx]
            if isinstance(t, InvertibleTransform):
                data = apply_transform(t.inverse, data, self.map_items, self.unpack_items)
        return data
