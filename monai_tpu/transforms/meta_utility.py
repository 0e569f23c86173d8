"""MetaImage <-> plain-dict conversion transforms
(reference: monai/transforms/meta_utility/dictionary.py:42 FromMetaTensord,
:89 ToMetaTensord). ``FromMetaImaged``/``ToMetaImaged`` are the native names;
``FromMetaTensord``/``ToMetaTensord`` are familiarity aliases."""
from __future__ import annotations

from typing import Hashable, Mapping

import numpy as np

from ..data.meta_image import MetaImage
from ..utils.backend import to_jax, to_numpy
from ..utils.misc import ensure_tuple_rep
from .inverse import InvertibleTransform
from .transform import MapTransform

__all__ = ["FromMetaImaged", "ToMetaImaged", "FromMetaTensord", "ToMetaTensord"]

DEFAULT_POST_FIX = "meta_dict"


class FromMetaImaged(MapTransform, InvertibleTransform):
    """Unpack MetaImage entries into `key`, `key_meta_dict`, `key_transforms`
    (reference: meta_utility/dictionary.py:42)."""

    def __init__(self, keys, data_type="jax", allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.data_types = ensure_tuple_rep(data_type, len(self.keys))

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key, dtype in self.key_iterator(d, self.data_types):
            img = d[key]
            if not isinstance(img, MetaImage):
                continue
            arr = to_jax(img.data) if dtype in ("jax", "tensor") else to_numpy(img.data)
            d[key] = arr
            d[f"{key}_{DEFAULT_POST_FIX}"] = dict(img.meta)
            d[f"{key}_transforms"] = list(img.applied_operations)
        return d

    def inverse(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            meta = d.pop(f"{key}_{DEFAULT_POST_FIX}", {})
            ops = d.pop(f"{key}_transforms", [])
            d[key] = MetaImage(d[key], meta=meta, applied_operations=ops)
        return d


class ToMetaImaged(MapTransform, InvertibleTransform):
    """Pack `key` + `key_meta_dict` + `key_transforms` back into a MetaImage
    (reference: meta_utility/dictionary.py:89)."""

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            meta = d.pop(f"{key}_{DEFAULT_POST_FIX}", {})
            ops = d.pop(f"{key}_transforms", [])
            d[key] = MetaImage(d[key], meta=meta, applied_operations=ops)
        return d

    def inverse(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            img = d[key]
            if isinstance(img, MetaImage):
                d[key] = img.data
                d[f"{key}_{DEFAULT_POST_FIX}"] = dict(img.meta)
                d[f"{key}_transforms"] = list(img.applied_operations)
        return d


FromMetaTensord = FromMetaImaged
ToMetaTensord = ToMetaImaged
