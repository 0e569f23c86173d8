"""Auto3DSeg data-correction transforms
(reference: monai/apps/auto3dseg/transforms.py:25 EnsureSameShaped)."""
from __future__ import annotations

import warnings
from collections.abc import Hashable, Mapping

import numpy as np

from ...transforms.spatial_array import Resize
from ...transforms.transform import MapTransform
from ...utils.misc import ImageMetaKey

__all__ = ["EnsureSameShaped"]


class EnsureSameShaped(MapTransform):
    """Resize label items whose spatial shape differs from ``source_key``'s by at
    most ``allowed_shape_difference`` per dim (nearest interpolation); raise for
    larger mismatches. Corrects public datasets with slightly-off label shapes
    (reference: apps/auto3dseg/transforms.py:25)."""

    def __init__(self, keys="label", allow_missing_keys: bool = False,
                 source_key: str = "image", allowed_shape_difference: int = 5,
                 warn: bool = True) -> None:
        super().__init__(keys, allow_missing_keys)
        self.source_key = source_key
        self.allowed_shape_difference = allowed_shape_difference
        self.warn = warn

    def __call__(self, data: Mapping[Hashable, object]) -> dict[Hashable, object]:
        d = dict(data)
        image_shape = tuple(d[self.source_key].shape[1:])
        for key in self.key_iterator(d):
            label_shape = tuple(d[key].shape[1:])
            if label_shape == image_shape:
                continue
            filename = ""
            meta = getattr(d[key], "meta", None)
            if isinstance(meta, Mapping):
                filename = meta.get(ImageMetaKey.FILENAME_OR_OBJ, "")
            if np.allclose(list(label_shape), list(image_shape),
                           atol=self.allowed_shape_difference):
                if self.warn:
                    warnings.warn(
                        f"The {key} with shape {label_shape} was resized to match the "
                        f"source shape {image_shape}, the metadata was not updated {filename}.")
                d[key] = Resize(spatial_size=image_shape, mode="nearest")(d[key])
            else:
                raise ValueError(f"The {key} shape {label_shape} is different from the "
                                 f"source shape {image_shape} {filename}.")
        return d
