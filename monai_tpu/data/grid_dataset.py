"""Patch iteration datasets (reference: monai/data/grid_dataset.py:42,102,160,366)."""
from __future__ import annotations

from collections.abc import Callable, Generator, Hashable, Iterable, Mapping, Sequence
from typing import Any

import numpy as np

from ..transforms.transform import apply_transform
from ..utils.enums import NumpyPadMode, PatchKeys, WSIPatchKeys
from ..utils.misc import ensure_tuple, first
from .iterable_dataset import IterableDataset
from .meta_image import MetaImage
from .utils import iter_patch

__all__ = ["PatchIter", "PatchIterd", "GridPatchDataset", "PatchDataset"]


class PatchIter:
    """Yield (patch, coords) over an array (reference: grid_dataset.py:42)."""

    def __init__(self, patch_size: Sequence[int], start_pos: Sequence[int] = (),
                 overlap: Sequence[float] | float = 0.0, mode: str | None = NumpyPadMode.WRAP,
                 **pad_opts):
        self.patch_size = (None,) + tuple(ensure_tuple(patch_size))
        self.start_pos = ensure_tuple(start_pos)
        self.overlap = overlap
        self.mode = mode
        self.pad_opts = pad_opts

    def __call__(self, array: Any) -> Generator:
        arr = array.data if isinstance(array, MetaImage) else array
        yield from iter_patch(np.asarray(arr), patch_size=self.patch_size, start_pos=self.start_pos,
                              overlap=self.overlap, copy_back=False, mode=self.mode, **self.pad_opts)


class PatchIterd:
    """Dict version of PatchIter (reference: grid_dataset.py:102)."""

    coords_key = "patch_coords"
    original_spatial_shape_key = "original_spatial_shape"
    start_pos_key = "start_pos"

    def __init__(self, keys, patch_size: Sequence[int], start_pos: Sequence[int] = (),
                 mode: str | None = NumpyPadMode.WRAP, **pad_opts):
        self.keys = ensure_tuple(keys)
        self.patch_iter = PatchIter(patch_size=patch_size, start_pos=start_pos, mode=mode, **pad_opts)

    def __call__(self, data: Mapping) -> Generator:
        d = dict(data)
        spatial_shape = d[first(self.keys)].shape[1:]
        passthrough = {k: v for k, v in d.items() if k not in self.keys}
        streams = [self.patch_iter(d[key]) for key in self.keys]
        for group in zip(*streams):
            coords = group[0][1]
            sample = dict(passthrough)
            sample.update({key: patch_and_coords[0]
                           for key, patch_and_coords in zip(self.keys, group)})
            sample[self.coords_key] = coords
            sample[self.original_spatial_shape_key] = spatial_shape
            sample[self.start_pos_key] = self.patch_iter.start_pos
            yield sample, coords


class GridPatchDataset(IterableDataset):
    """Iterate patches of images from a dataset (reference: grid_dataset.py:160)."""

    def __init__(self, data: Iterable | Sequence, patch_iter: Callable,
                 transform: Callable | None = None, with_coordinates: bool = True):
        super().__init__(data=data, transform=None)
        self.patch_iter = patch_iter
        self.patch_transform = transform
        self.with_coordinates = with_coordinates

    def __iter__(self):
        emit_coords = self.with_coordinates
        for image in super().__iter__():
            for item in self.patch_iter(image):
                patch, extras = item[0], item[1:]
                if self.patch_transform is not None:
                    patch = apply_transform(self.patch_transform, patch, map_items=False)
                yield (patch, extras[0]) if (emit_coords and extras) else patch


class PatchDataset(IterableDataset):
    """N patches per sample via a patch_func (reference: grid_dataset.py:366)."""

    def __init__(self, data: Sequence, patch_func: Callable, samples_per_image: int = 1,
                 transform: Callable | None = None):
        super().__init__(data=data, transform=None)
        self.patch_func = patch_func
        if samples_per_image <= 0:
            raise ValueError("sampler_per_image must be a positive integer.")
        self.samples_per_image = samples_per_image
        self.patch_transform = transform

    def __len__(self) -> int:
        return len(self.data) * self.samples_per_image

    def __iter__(self):
        for image in super().__iter__():
            patches = self.patch_func(image)
            if len(patches) != self.samples_per_image:
                raise RuntimeWarning(
                    f"`patch_func` must return a sequence of length: samples_per_image={self.samples_per_image}.")
            if self.patch_transform is None:
                yield from patches
            else:
                for patch in patches:
                    yield apply_transform(self.patch_transform, patch, map_items=False)
