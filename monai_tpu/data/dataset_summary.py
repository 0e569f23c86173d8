"""Dataset statistics: spacing/intensity summaries (reference: monai/data/dataset_summary.py:215)."""
from __future__ import annotations

from itertools import chain
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.enums import MetaKeys
from .meta_image import MetaImage

__all__ = ["DatasetSummary"]


class DatasetSummary:
    """Compute target spacing and intensity statistics over a dataset
    (reference: dataset_summary.py)."""

    def __init__(self, dataset, image_key: str = "image", label_key: str = "label",
                 meta_key=None, meta_key_postfix: str = "meta_dict", num_workers: int = 0, **kwargs):
        self.dataset = dataset
        self.image_key = image_key
        self.label_key = label_key
        self.all_meta_data: list = []

    def collect_meta_data(self):
        for item in self.dataset:
            img = item[self.image_key] if isinstance(item, dict) else item
            if isinstance(img, MetaImage):
                self.all_meta_data.append(dict(img.meta))

    def get_target_spacing(self, spacing_key: str = "pixdim", anisotropic_threshold: int = 3,
                           percentile: float = 10.0):
        """Median spacing, with percentile fallback for anisotropic axes
        (reference: dataset_summary.py get_target_spacing)."""
        if len(self.all_meta_data) == 0:
            self.collect_meta_data()
        spacings = []
        for meta in self.all_meta_data:
            if spacing_key in meta:
                spacings.append(np.asarray(meta[spacing_key])[:3])
            elif MetaKeys.AFFINE in meta:
                from .affine_utils import affine_to_spacing

                spacings.append(affine_to_spacing(np.asarray(meta[MetaKeys.AFFINE]), 3))
        all_spacings = np.stack(spacings, axis=0)
        target_spacing = np.median(all_spacings, axis=0)
        if max(target_spacing) / min(target_spacing) >= anisotropic_threshold:
            largest_axis = int(np.argmax(target_spacing))
            target_spacing[largest_axis] = np.percentile(all_spacings[:, largest_axis], percentile)
        return tuple(float(s) for s in target_spacing)

    def calculate_statistics(self, foreground_threshold: int = 0):
        """Mean/std over foreground voxels (reference: dataset_summary.py)."""
        voxel_sum = 0.0
        voxel_square_sum = 0.0
        voxel_max, voxel_min = [], []
        voxel_ct = 0
        for item in self.dataset:
            image = to_numpy(item[self.image_key].data if isinstance(item[self.image_key], MetaImage)
                             else item[self.image_key])
            label = to_numpy(item[self.label_key].data if isinstance(item[self.label_key], MetaImage)
                             else item[self.label_key]) if self.label_key in item else None
            if label is not None:
                fg = image[label > foreground_threshold]
            else:
                fg = image.reshape(-1)
            if fg.size == 0:
                continue
            voxel_max.append(fg.max())
            voxel_min.append(fg.min())
            voxel_ct += fg.size
            voxel_sum += fg.sum()
            voxel_square_sum += np.square(fg.astype(np.float64)).sum()
        self.data_max, self.data_min = float(max(voxel_max)), float(min(voxel_min))
        self.data_mean = float(voxel_sum / max(voxel_ct, 1))
        self.data_std = float(np.sqrt(max(voxel_square_sum / max(voxel_ct, 1) - self.data_mean**2, 0)))
        return {"max": self.data_max, "min": self.data_min, "mean": self.data_mean, "std": self.data_std}

    def calculate_percentiles(self, foreground_threshold: int = 0, sampling_flag: bool = True,
                              interval: int = 10, min_percentile: float = 0.5,
                              max_percentile: float = 99.5):
        """Intensity percentiles over (sampled) foreground voxels (reference: dataset_summary.py)."""
        all_intensities = []
        for item in self.dataset:
            image = to_numpy(item[self.image_key].data if isinstance(item[self.image_key], MetaImage)
                             else item[self.image_key])
            label = to_numpy(item[self.label_key].data if isinstance(item[self.label_key], MetaImage)
                             else item[self.label_key]) if self.label_key in item else None
            fg = image[label > foreground_threshold] if label is not None else image.reshape(-1)
            if sampling_flag:
                fg = fg[::interval]
            all_intensities.append(fg)
        flat = np.concatenate(all_intensities)
        self.data_min_percentile, self.data_max_percentile = np.percentile(
            flat, [min_percentile, max_percentile])
        self.data_median = float(np.median(flat))
        return {"min_percentile": float(self.data_min_percentile),
                "max_percentile": float(self.data_max_percentile),
                "median": self.data_median}
