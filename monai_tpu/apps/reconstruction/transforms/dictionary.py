"""Dict transforms for accelerated-MRI pipelines
(reference: monai/apps/reconstruction/transforms/dictionary.py:31-331)."""
from __future__ import annotations

from collections.abc import Hashable, Mapping, Sequence

import numpy as np
import jax.numpy as jnp

from ....data.meta_image import MetaImage
from ....transforms.croppad_array import SpatialCrop
from ....transforms.intensity_array import NormalizeIntensity
from ....transforms.transform import MapTransform, RandomizableTransform
from ....utils.backend import to_numpy
from ....utils.enums import FastMRIKeys
from .array import EquispacedKspaceMask, RandomKspaceMask

__all__ = ["ExtractDataKeyFromMetaKeyd", "RandomKspaceMaskd", "EquispacedKspaceMaskd",
           "ReferenceBasedSpatialCropd", "ReferenceBasedNormalizeIntensityd"]


class ExtractDataKeyFromMetaKeyd(MapTransform):
    """Move values out of a metadata dict entry into the top-level dict
    (reference: recon transforms/dictionary.py:31)."""

    def __init__(self, keys, meta_key: str, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.meta_key = meta_key

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        if self.meta_key not in d:
            raise ValueError(f"{self.meta_key} is not found in the data.")
        meta = d[self.meta_key]
        for key in self.keys:
            if key in meta:
                d[str(key)] = meta[key]
        return d


class RandomKspaceMaskd(RandomizableTransform, MapTransform):
    """(reference: recon transforms/dictionary.py:72)."""

    masker_cls = RandomKspaceMask

    def __init__(self, keys, center_fractions: Sequence[float],
                 accelerations: Sequence[float], spatial_dims: int = 2,
                 is_complex: bool = True, allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.masker = self.masker_cls(center_fractions, accelerations, spatial_dims,
                                      is_complex)

    def set_random_state(self, seed=None, state=None):
        self.masker.set_random_state(seed, state)
        return self

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key + "_masked"], d[key + "_masked_ifft"] = self.masker(d[key])
            d[FastMRIKeys.MASK] = self.masker.mask
        return d


class EquispacedKspaceMaskd(RandomKspaceMaskd):
    """(reference: recon transforms/dictionary.py:141)."""

    masker_cls = EquispacedKspaceMask


class ReferenceBasedSpatialCropd(MapTransform):
    """Center-crop keyed items to the spatial size of a reference item
    (reference: recon transforms/dictionary.py:193)."""

    def __init__(self, keys, ref_key: str, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.ref_key = ref_key

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        ref = d[self.ref_key]
        ref_shape = (ref.data if isinstance(ref, MetaImage) else ref).shape[-2:]
        for key in self.key_iterator(d):
            item = d[key]
            arr = item.data if isinstance(item, MetaImage) else item
            # crop the LAST two spatial dims to the reference size, centered
            starts = [(s - r) // 2 for s, r in zip(arr.shape[-2:], ref_shape)]
            slicer = [slice(None)] * (arr.ndim - 2) + [
                slice(st, st + r) for st, r in zip(starts, ref_shape)]
            out = arr[tuple(slicer)]
            d[key] = item.new_like(out) if isinstance(item, MetaImage) else out
        return d


class ReferenceBasedNormalizeIntensityd(MapTransform):
    """Normalize keyed items with the mean/std of a reference item; stores the stats
    under "mean"/"std" (reference: recon transforms/dictionary.py:246)."""

    def __init__(self, keys, ref_key: str, subtrahend=None, divisor=None,
                 nonzero: bool = False, channel_wise: bool = False, dtype=np.float32,
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.ref_key = ref_key
        self.default_normalizer = NormalizeIntensity(subtrahend, divisor, nonzero,
                                                     channel_wise, dtype)

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        ref = d[self.ref_key]
        arr = to_numpy(ref.data if isinstance(ref, MetaImage) else ref)
        if self.default_normalizer.subtrahend is None:
            mean = float(arr.mean())
            std = float(arr.std())
        else:
            mean = self.default_normalizer.subtrahend
            std = self.default_normalizer.divisor
        for key in self.key_iterator(d):
            item = d[key]
            a = item.data if isinstance(item, MetaImage) else item
            out = (a - mean) / max(std, 1e-12)
            d[key] = item.new_like(out) if isinstance(item, MetaImage) else out
        d["mean"] = mean
        d["std"] = std
        return d
