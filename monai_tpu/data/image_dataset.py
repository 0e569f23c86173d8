"""ImageDataset: paired image/segmentation file dataset with separate transform chains
(reference: monai/data/image_dataset.py:26 ImageDataset)."""
from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

from ..transforms.io_array import LoadImage
from ..transforms.transform import Randomizable, apply_transform
from ..utils.prng import MAX_SEED

__all__ = ["ImageDataset"]


class ImageDataset(Randomizable):
    """(reference: image_dataset.py:26)."""

    def __init__(self, image_files: Sequence[str], seg_files: Sequence[str] | None = None,
                 labels: Sequence | None = None, transform: Callable | None = None,
                 seg_transform: Callable | None = None, label_transform: Callable | None = None,
                 image_only: bool = True, transform_with_metadata: bool = False,
                 dtype=np.float32, reader=None, *args, **kwargs):
        if seg_files is not None and len(image_files) != len(seg_files):
            raise ValueError("Must have same the number of segmentation as image files: "
                             f"images={len(image_files)}, segmentations={len(seg_files)}.")
        self.image_files = image_files
        self.seg_files = seg_files
        self.labels = labels
        self.transform = transform
        self.seg_transform = seg_transform
        self.label_transform = label_transform
        if image_only and transform_with_metadata:
            raise ValueError("transform_with_metadata=True requires image_only=False.")
        self.image_only = image_only
        self.transform_with_metadata = transform_with_metadata
        self.loader = LoadImage(reader=reader, image_only=True, dtype=dtype, *args, **kwargs)
        self._seed = 0

    def __len__(self) -> int:
        return len(self.image_files)

    def randomize(self, data=None) -> None:
        self._seed = self.R.randint(MAX_SEED, dtype="uint32")

    def __getitem__(self, index: int):
        self.randomize()
        img = self.loader(self.image_files[index])
        seg = None
        if self.seg_files is not None:
            seg = self.loader(self.seg_files[index])
        if self.transform is not None:
            if isinstance(self.transform, Randomizable):
                self.transform.set_random_state(seed=self._seed)
            img = apply_transform(self.transform, img, map_items=False)
        if self.seg_files is not None and self.seg_transform is not None:
            if isinstance(self.seg_transform, Randomizable):
                self.seg_transform.set_random_state(seed=self._seed)
            seg = apply_transform(self.seg_transform, seg, map_items=False)
        label = None
        if self.labels is not None:
            label = self.labels[index]
            if self.label_transform is not None:
                label = apply_transform(self.label_transform, label, map_items=False)
        data = [img]
        if seg is not None:
            data.append(seg)
        if label is not None:
            data.append(label)
        if len(data) == 1:
            return data[0]
        return tuple(data)
