"""WSI patch datasets (reference: monai/data/wsi_datasets.py:32 PatchWSIDataset,
:172 SlidingPatchWSIDataset, :321 MaskedPatchWSIDataset)."""
from __future__ import annotations

import inspect
from collections.abc import Callable, Sequence

import numpy as np

from ..transforms.transform import Randomizable, apply_transform
from ..utils.misc import ensure_tuple, ensure_tuple_rep
from .dataset import Dataset
from .meta_image import MetaImage
from .utils import iter_patch_position
from .wsi_reader import BaseWSIReader, WSIReader

__all__ = ["PatchWSIDataset", "SlidingPatchWSIDataset", "MaskedPatchWSIDataset"]


class PatchWSIDataset(Dataset):
    """Extract labeled patches from whole-slide images (reference: wsi_datasets.py:32).

    Each data item: {"image": path, "location": [x, y], "label": ..., optional
    "patch_size"/"patch_level"}.
    """

    def __init__(self, data: Sequence, patch_size=None, patch_level: int | None = None,
                 transform: Callable | None = None, include_label: bool = True,
                 center_location: bool = True, additional_meta_keys: Sequence[str] | None = None,
                 reader="cucim", **kwargs):
        super().__init__(data, transform)
        self.patch_size = None if patch_size is None else ensure_tuple_rep(patch_size, 2)
        self.patch_level = patch_level
        lvl = 0 if patch_level is None else patch_level
        if isinstance(reader, str):
            self.wsi_reader: BaseWSIReader = WSIReader(backend=reader.lower(), level=lvl,
                                                       **kwargs)
        elif inspect.isclass(reader) and issubclass(reader, BaseWSIReader):
            self.wsi_reader = reader(level=lvl, **kwargs)
        elif isinstance(reader, BaseWSIReader):
            self.wsi_reader = reader
        else:
            raise ValueError(f"Unsupported reader type: {reader}.")
        self.backend = self.wsi_reader.backend
        self.include_label = include_label
        self.center_location = center_location
        self.additional_meta_keys = additional_meta_keys or []
        self.wsi_object_dict: dict = {}

    def _get_wsi_object(self, sample: dict):
        path = sample["image"]
        if path not in self.wsi_object_dict:
            self.wsi_object_dict[path] = self.wsi_reader.read(path)
        return self.wsi_object_dict[path]

    def _get_label(self, sample: dict):
        return np.asarray(sample["label"], dtype=np.float32)

    def _get_size(self, sample: dict):
        if self.patch_size is None:
            return ensure_tuple_rep(sample.get("size"), 2)
        return self.patch_size

    def _get_level(self, sample: dict):
        if self.patch_level is None:
            return sample.get("level", 0)
        return self.patch_level

    def _get_location(self, sample: dict):
        if self.center_location:
            size = self._get_size(sample)
            return ensure_tuple(sample["location"][i] - size[i] // 2 for i in range(len(size)))
        return ensure_tuple(sample["location"])

    def _get_data(self, sample: dict):
        if self.backend == "openslide":
            self.wsi_object_dict = {}
        wsi = self._get_wsi_object(sample)
        return self.wsi_reader.get_data(wsi=wsi, location=self._get_location(sample),
                                        size=self._get_size(sample),
                                        level=self._get_level(sample))

    def _transform(self, index: int):
        sample = self.data[index]
        image, metadata = self._get_data(sample)
        for key in self.additional_meta_keys:
            metadata[key] = sample[key]
        output = {"image": MetaImage(image, meta=metadata)}
        if self.include_label:
            output["label"] = self._get_label(sample)
        return apply_transform(self.transform, output) if self.transform else output


class SlidingPatchWSIDataset(Randomizable, PatchWSIDataset):
    """All patches on a regular grid over each slide, optionally with a random offset
    (reference: wsi_datasets.py:172)."""

    def __init__(self, data: Sequence, patch_size=None, patch_level: int | None = None,
                 mask_level: int | None = None, overlap: float = 0.0,
                 offset=(0, 0), offset_limits=None, transform: Callable | None = None,
                 include_label: bool = False, center_location: bool = False,
                 additional_meta_keys=("location", "size", "level"), reader="cucim",
                 seed: int = 0, **kwargs):
        super().__init__(data=[], patch_size=patch_size, patch_level=patch_level,
                         transform=transform, include_label=include_label,
                         center_location=center_location,
                         additional_meta_keys=list(additional_meta_keys), reader=reader,
                         **kwargs)
        self.overlap = overlap
        self.set_random_state(seed)
        self.random_offset = offset == "random"
        self.offset_limits = offset_limits
        self._fixed_offset = (0, 0) if self.random_offset else ensure_tuple_rep(offset, 2)
        self.image_data = list(data)
        for sample in self.image_data:
            self.data.extend(list(self._evaluate_patch_locations(sample)))

    def _get_offset(self, sample):
        if self.random_offset:
            if self.offset_limits is None:
                size = self._get_size(sample)
                limits = tuple((-s, s) for s in size)
            else:
                limits = tuple(self.offset_limits if isinstance(self.offset_limits[0], tuple)
                               else (self.offset_limits,) * 2)
            return tuple(self.R.randint(lo, hi) for lo, hi in limits)
        return self._fixed_offset

    def _evaluate_patch_locations(self, sample):
        patch_size = self._get_size(sample)
        level = self._get_level(sample)
        wsi = self._get_wsi_object(sample)
        wsi_size = self.wsi_reader.get_size(wsi, level)
        offset = self._get_offset(sample)
        locations = list(iter_patch_position(image_size=wsi_size, patch_size=patch_size,
                                             start_pos=offset, overlap=self.overlap,
                                             padded=False))
        out = []
        for loc in locations:
            item = dict(sample)
            item["location"] = tuple(int(v) for v in loc)
            item["size"] = patch_size
            item["level"] = level
            out.append(item)
        return out


class MaskedPatchWSIDataset(PatchWSIDataset):
    """Patches whose centers fall inside a (tissue) mask computed at a coarse level
    (reference: wsi_datasets.py:321)."""

    def __init__(self, data: Sequence, patch_size=None, patch_level: int | None = None,
                 mask_level: int = 7, transform: Callable | None = None,
                 include_label: bool = False, center_location: bool = False,
                 additional_meta_keys=("location", "name"), reader="cucim", **kwargs):
        super().__init__(data=[], patch_size=patch_size, patch_level=patch_level,
                         transform=transform, include_label=include_label,
                         center_location=center_location,
                         additional_meta_keys=list(additional_meta_keys), reader=reader,
                         **kwargs)
        self.mask_level = mask_level
        self.image_data = list(data)
        for sample in self.image_data:
            self.data.extend(list(self._evaluate_patch_locations(sample)))

    def _compute_mask(self, wsi) -> np.ndarray:
        """Otsu-free foreground mask on the coarse level: non-background by intensity."""
        lvl = min(self.mask_level, self.wsi_reader.get_level_count(wsi) - 1)
        img, _ = self.wsi_reader.get_data(wsi, level=lvl)
        gray = img.astype(np.float32).mean(axis=0)
        thresh = gray.mean()
        return (gray < thresh).astype(bool), lvl

    def _evaluate_patch_locations(self, sample):
        patch_size = self._get_size(sample)
        level = self._get_level(sample)
        wsi = self._get_wsi_object(sample)
        mask, mask_lvl = self._compute_mask(wsi)
        coords = np.argwhere(mask)
        ratio = (self.wsi_reader.get_downsample_ratio(wsi, mask_lvl)
                 / self.wsi_reader.get_downsample_ratio(wsi, level))
        out = []
        for yx in coords:
            loc = tuple(int(round(v * ratio)) for v in yx)
            item = dict(sample)
            item["location"] = loc
            item["size"] = patch_size
            item["level"] = level
            item["name"] = str(sample.get("image"))
            out.append(item)
        return out
