"""Batch regularization transforms: MixUp/CutMix/CutOut
(reference: monai/transforms/regularization/array.py:27-171)."""
from __future__ import annotations

from abc import abstractmethod
from typing import Any

import numpy as np

from ..data.meta_image import MetaImage
from ..utils.backend import to_numpy
from ..utils.type_conversion import convert_to_dst_type
from .transform import RandomizableTransform

__all__ = ["MixUp", "CutMix", "CutOut"]


class Mixer(RandomizableTransform):
    """Shared mixing machinery (reference: regularization/array.py:27)."""

    def __init__(self, batch_size: int, alpha: float = 1.0):
        super().__init__()
        if alpha <= 0:
            raise ValueError(f"Expected positive number, but got {alpha = }")
        self.alpha = alpha
        self.batch_size = batch_size

    @abstractmethod
    def apply(self, data):
        raise NotImplementedError

    def randomize(self, data=None) -> None:
        super().randomize(None)  # reference Mixer.randomize draws _do_transform first
        self._params = (
            self.R.beta(self.alpha, self.alpha, self.batch_size).astype(np.float32),
            self.R.permutation(self.batch_size),
            [self.R.randint(0, d) for d in data.shape[2:]] if data is not None else [],
        )


class MixUp(Mixer):
    """Convex sample mixing (reference: regularization/array.py:59)."""

    def apply(self, data):
        arr = to_numpy(data.data if isinstance(data, MetaImage) else data)
        weight, perm, _ = self._params
        nsamples, *dims = arr.shape
        if len(weight) != nsamples:
            raise ValueError(f"Expected batch of size: {len(weight)}, but got {nsamples}")
        mixweight = weight.reshape([nsamples] + [1] * len(dims))
        out = mixweight * arr + (1 - mixweight) * arr[perm]
        res, *_ = convert_to_dst_type(out, data.data if isinstance(data, MetaImage) else data)
        return data.new_like(res) if isinstance(data, MetaImage) else res

    def __call__(self, data, labels=None, randomize: bool = True):
        if randomize:
            self.randomize()
        if labels is None:
            return self.apply(data)
        return self.apply(data), self.apply(labels)


class CutMix(Mixer):
    """Patch swapping between samples (reference: regularization/array.py:103)."""

    def apply(self, data):
        arr = to_numpy(data.data if isinstance(data, MetaImage) else data)
        weights, perm, coords = self._params
        nsamples, _, *dims = arr.shape
        out = arr.copy()
        for s, weight in enumerate(weights):
            lengths = [d * np.sqrt(1 - weight) for d in dims]
            idx = [slice(None), slice(None)] + [slice(c, min(int(np.ceil(c + le)), d))
                                                for c, le, d in zip(coords, lengths, dims)]
            out[tuple([s] + idx[1:])] = arr[perm[s]][tuple(idx[1:])]
        res, *_ = convert_to_dst_type(out, arr)
        return data.new_like(res) if isinstance(data, MetaImage) else res

    def apply_on_labels(self, labels):
        arr = to_numpy(labels.data if isinstance(labels, MetaImage) else labels)
        weights, perm, _ = self._params
        nsamples, *dims = arr.shape
        mixweight = weights.reshape([nsamples] + [1] * len(dims))
        out = mixweight * arr + (1 - mixweight) * arr[perm]
        res, *_ = convert_to_dst_type(out, arr)
        return labels.new_like(res) if isinstance(labels, MetaImage) else res

    def __call__(self, data, labels=None, randomize: bool = True):
        if randomize:
            self.randomize(to_numpy(data.data if isinstance(data, MetaImage) else data))
        augmented = self.apply(data)
        return (augmented, self.apply_on_labels(labels)) if labels is not None else augmented


class CutOut(Mixer):
    """Zero random patches (reference: regularization/array.py:—)."""

    def apply(self, data):
        arr = to_numpy(data.data if isinstance(data, MetaImage) else data)
        weights, _, coords = self._params
        nsamples, _, *dims = arr.shape
        out = arr.copy()
        for s, weight in enumerate(weights):
            lengths = [d * np.sqrt(1 - weight) for d in dims]
            idx = [slice(c, min(int(np.ceil(c + le)), d)) for c, le, d in zip(coords, lengths, dims)]
            out[tuple([s, slice(None)] + idx)] = 0
        res, *_ = convert_to_dst_type(out, arr)
        return data.new_like(res) if isinstance(data, MetaImage) else res

    def __call__(self, data, randomize: bool = True):
        if randomize:
            self.randomize(to_numpy(data.data if isinstance(data, MetaImage) else data))
        return self.apply(data)
