"""Grid splitting/patching transforms (reference: monai/transforms/spatial/array.py:3099-3356
GridSplit/GridPatch/RandGridPatch)."""
from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import numpy as np

from ..data.meta_image import MetaImage
from ..data.utils import iter_patch
from ..utils.backend import to_numpy
from ..utils.enums import PatchKeys
from ..utils.misc import ensure_tuple, ensure_tuple_rep, fall_back_tuple
from .transform import Randomizable, Transform
from .traits import MultiSampleTrait

__all__ = ["GridSplit", "GridPatch", "RandGridPatch"]


class GridSplit(Transform):
    """Split an image into a regular grid of tiles (reference: spatial/array.py:3099)."""

    def __init__(self, grid: tuple[int, int] = (2, 2), size: int | tuple[int, int] | None = None):
        self.grid = grid
        self.size = None if size is None else ensure_tuple_rep(size, len(grid))

    def __call__(self, image: Any, size=None) -> list:
        input_size = self.size if size is None else ensure_tuple_rep(size, len(self.grid))
        if self.grid == (1, 1) and input_size is None:
            return [image]
        data = image.data if isinstance(image, MetaImage) else image
        split_size, steps = self._get_params(data.shape[1:], input_size)
        patches = []
        for i in range(self.grid[0]):
            for j in range(self.grid[1]):
                sl = (slice(None), slice(i * steps[0], i * steps[0] + split_size[0]),
                      slice(j * steps[1], j * steps[1] + split_size[1]))
                sub = data[sl]
                patches.append(image.new_like(sub) if isinstance(image, MetaImage) else sub)
        return patches

    def _get_params(self, image_size, size=None):
        size = tuple(image_size[i] // self.grid[i] for i in range(len(self.grid))) if size is None else size
        steps = tuple((image_size[i] - size[i]) // (self.grid[i] - 1) if self.grid[i] > 1 else image_size[i]
                      for i in range(len(self.grid)))
        return size, steps


class GridPatch(Transform, MultiSampleTrait):
    """Extract all grid patches, optionally sorted/filtered (reference: spatial/array.py:3155)."""

    def __init__(self, patch_size: Sequence[int], offset: Sequence[int] | None = None,
                 num_patches: int | None = None, overlap: float = 0.0, sort_fn: str | None = None,
                 threshold: float | None = None, pad_mode: str | None = None, **pad_kwargs):
        self.patch_size = (None,) + tuple(patch_size)
        self.offset = (0,) + tuple(offset) if offset else (0,) * (len(patch_size) + 1)
        self.pad_mode = pad_mode
        self.pad_kwargs = pad_kwargs
        self.overlap = overlap
        self.num_patches = num_patches
        self.sort_fn = sort_fn.lower() if sort_fn else None
        self.threshold = threshold

    def filter_threshold(self, image_np: np.ndarray, locations: np.ndarray):
        if self.threshold is None:
            return image_np, locations
        n_dims = len(image_np.shape)
        idx = np.argwhere(image_np.sum(axis=tuple(range(1, n_dims))) < self.threshold).reshape(-1)
        return image_np[idx], locations[idx]

    def filter_count(self, image_np: np.ndarray, locations: np.ndarray):
        if self.sort_fn is None:
            image_np = image_np[: self.num_patches]
            locations = locations[: self.num_patches]
        elif self.num_patches is not None:
            n_dims = len(image_np.shape)
            if self.sort_fn == "min":
                idx = np.argsort(image_np.sum(axis=tuple(range(1, n_dims))))
            elif self.sort_fn == "max":
                idx = np.argsort(-image_np.sum(axis=tuple(range(1, n_dims))))
            else:
                raise ValueError(f'`sort_fn` should be either "min", "max", or None! {self.sort_fn} provided!')
            idx = idx[: self.num_patches]
            image_np = image_np[idx]
            locations = locations[idx]
        return image_np, locations

    def __call__(self, array: Any, randomize: bool = False):
        data = to_numpy(array.data if isinstance(array, MetaImage) else array)
        patch_iterator = iter_patch(
            data, patch_size=self.patch_size, start_pos=self.offset,
            overlap=self.overlap, copy_back=False,
            mode=self.pad_mode if self.pad_mode else None, **self.pad_kwargs)
        patches = list(zip(*patch_iterator))
        patched_image = np.stack(patches[0]) if patches else np.zeros((0,) + data.shape)
        locations = np.stack(patches[1])[:, 1:, 0] if patches else np.zeros((0, data.ndim - 1))
        # filter
        if self.threshold is not None:
            patched_image, locations = self.filter_threshold(patched_image, locations)
        if self.num_patches:
            patched_image, locations = self.filter_count(patched_image, locations)
            if len(patched_image) < self.num_patches:
                padding = self.num_patches - len(patched_image)
                patched_image = np.concatenate(
                    [patched_image, np.full((padding,) + patched_image.shape[1:],
                                            self.pad_kwargs.get("constant_values", 0),
                                            dtype=patched_image.dtype)])
                locations = np.concatenate([locations, np.zeros((padding, locations.shape[1]))])
        out = MetaImage(patched_image) if isinstance(array, MetaImage) else patched_image
        if isinstance(out, MetaImage):
            out.meta[PatchKeys.LOCATION] = locations.T
            out.meta[PatchKeys.COUNT] = len(patched_image)
        return out


class RandGridPatch(GridPatch, Randomizable, MultiSampleTrait):
    """GridPatch with random offset (reference: spatial/array.py:3283)."""

    def __init__(self, patch_size: Sequence[int], min_offset: Sequence[int] | int | None = None,
                 max_offset: Sequence[int] | int | None = None, num_patches: int | None = None,
                 overlap: float = 0.0, sort_fn: str | None = None, threshold: float | None = None,
                 pad_mode: str | None = None, **pad_kwargs):
        super().__init__(patch_size=patch_size, offset=(), num_patches=num_patches, overlap=overlap,
                         sort_fn=sort_fn, threshold=threshold, pad_mode=pad_mode, **pad_kwargs)
        self.min_offset = min_offset
        self.max_offset = max_offset

    def randomize(self, array):
        if self.min_offset is None:
            min_offset = (0,) * (array.ndim - 1)
        else:
            min_offset = ensure_tuple_rep(self.min_offset, array.ndim - 1)
        if self.max_offset is None:
            max_offset = tuple(s % p if p else 0 for s, p in zip(array.shape[1:], self.patch_size[1:]))
        else:
            max_offset = ensure_tuple_rep(self.max_offset, array.ndim - 1)
        self.offset = (0,) + tuple(self.R.randint(low=low, high=high + 1)
                                   for low, high in zip(min_offset, max_offset))

    def __call__(self, array: Any, randomize: bool = True):
        if randomize:
            self.randomize(array.data if isinstance(array, MetaImage) else array)
        return super().__call__(array, randomize)
