"""ImageDataset: paired image/segmentation file dataset with separate transform chains
(reference API: monai/data/image_dataset.py:26 ImageDataset).

Own implementation: the per-branch "reseed randomizable pipeline, then apply"
step is a single helper, and the output tuple is assembled declaratively.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

from ..transforms.io_array import LoadImage
from ..transforms.transform import Randomizable, apply_transform
from ..utils.prng import MAX_SEED

__all__ = ["ImageDataset"]


class ImageDataset(Randomizable):
    """Loads image (and optional seg/label) files, applying an independent transform
    chain to each, with image/seg chains sharing one random seed per item so paired
    augmentations stay aligned."""

    def __init__(self, image_files: Sequence[str], seg_files: Sequence[str] | None = None,
                 labels: Sequence | None = None, transform: Callable | None = None,
                 seg_transform: Callable | None = None, label_transform: Callable | None = None,
                 image_only: bool = True, transform_with_metadata: bool = False,
                 dtype=np.float32, reader=None, *args, **kwargs):
        if seg_files is not None and len(image_files) != len(seg_files):
            raise ValueError("Must have same the number of segmentation as image files: "
                             f"images={len(image_files)}, segmentations={len(seg_files)}.")
        if image_only and transform_with_metadata:
            raise ValueError("transform_with_metadata=True requires image_only=False.")
        self.image_files = image_files
        self.seg_files = seg_files
        self.labels = labels
        self.transform = transform
        self.seg_transform = seg_transform
        self.label_transform = label_transform
        self.image_only = image_only
        self.transform_with_metadata = transform_with_metadata
        self.loader = LoadImage(reader=reader, image_only=True, dtype=dtype, *args, **kwargs)
        self._seed = 0

    def __len__(self) -> int:
        return len(self.image_files)

    def randomize(self, data=None) -> None:
        self._seed = self.R.randint(MAX_SEED, dtype="uint32")

    def _apply_seeded(self, chain: Callable | None, value):
        """Run one transform chain; Randomizable chains are reseeded with this
        item's seed first so image and seg branches randomize identically."""
        if chain is None or value is None:
            return value
        if isinstance(chain, Randomizable):
            chain.set_random_state(seed=self._seed)
        return apply_transform(chain, value, map_items=False)

    def __getitem__(self, index: int):
        self.randomize()
        img = self._apply_seeded(self.transform, self.loader(self.image_files[index]))
        outputs = [img]
        if self.seg_files is not None:
            seg = self._apply_seeded(self.seg_transform, self.loader(self.seg_files[index]))
            outputs.append(seg)
        if self.labels is not None:
            label = self.labels[index]
            if self.label_transform is not None:
                label = apply_transform(self.label_transform, label, map_items=False)
            outputs.append(label)
        return outputs[0] if len(outputs) == 1 else tuple(outputs)
