"""Synthetic test images (reference: monai/data/synthetic.py:21,97)."""
from __future__ import annotations

import numpy as np

from ..ops.gaussian import gaussian_filter

__all__ = ["create_test_image_2d", "create_test_image_3d"]


def create_test_image_2d(width: int, height: int, num_objs: int = 12, rad_max: int = 30, rad_min: int = 5,
                         noise_max: float = 0.0, num_seg_classes: int = 5, channel_dim: int | None = None,
                         random_state: np.random.RandomState | None = None):
    """Blobby circles phantom + segmentation (reference: synthetic.py:21)."""
    if rad_max <= rad_min:
        raise ValueError(f"rad_min {rad_min} should be less than rad_max {rad_max}.")
    if rad_min < 1:
        raise ValueError("rad_min should be no less than 1.")
    min_size = min(width, height)
    if min_size <= 2 * rad_max:
        raise ValueError("the minimal size of the image should be larger than `2 * rad_max`.")
    image = np.zeros((width, height))
    rs: np.random.RandomState = np.random.random.__self__ if random_state is None else random_state  # type: ignore

    for _ in range(num_objs):
        x = rs.randint(rad_max, width - rad_max)
        y = rs.randint(rad_max, height - rad_max)
        rad = rs.randint(rad_min, rad_max)
        spy, spx = np.ogrid[-x:width - x, -y:height - y]
        circle = (spx * spx + spy * spy) <= rad * rad
        if num_seg_classes > 1:
            image[circle] = np.ceil(rs.random() * num_seg_classes)
        else:
            image[circle] = rs.random() * 0.5 + 0.5

    labels = np.ceil(image).astype(np.int32)
    norm = rs.uniform(0, num_seg_classes * noise_max, size=image.shape)
    noisyimage: np.ndarray = np.clip(image + norm, 0, 1).astype(np.float32) if noise_max > 0 else image.astype(np.float32)
    if noise_max > 0:
        noisyimage = np.clip((image / max(num_seg_classes, 1)) + norm, 0, 1).astype(np.float32)
    else:
        noisyimage = (image / max(num_seg_classes, 1)).astype(np.float32)

    if channel_dim is not None:
        if not (isinstance(channel_dim, int) and channel_dim in (-1, 0, 2)):
            raise AssertionError("invalid channel dim.")
        if channel_dim == 0:
            noisyimage = noisyimage[None]
            labels = labels[None]
        else:
            noisyimage = noisyimage[..., None]
            labels = labels[..., None]
    return noisyimage, labels


def create_test_image_3d(height: int, width: int, depth: int, num_objs: int = 12, rad_max: int = 30,
                         rad_min: int = 5, noise_max: float = 0.0, num_seg_classes: int = 5,
                         channel_dim: int | None = None,
                         random_state: np.random.RandomState | None = None):
    """Blobby spheres phantom + segmentation (reference: synthetic.py:97)."""
    if rad_max <= rad_min:
        raise ValueError(f"rad_min {rad_min} should be less than rad_max {rad_max}.")
    if rad_min < 1:
        raise ValueError("rad_min should be no less than 1.")
    min_size = min(height, width, depth)
    if min_size <= 2 * rad_max:
        raise ValueError("the minimal size of the image should be larger than `2 * rad_max`.")
    image = np.zeros((height, width, depth))
    rs: np.random.RandomState = np.random.random.__self__ if random_state is None else random_state  # type: ignore

    for _ in range(num_objs):
        x = rs.randint(rad_max, height - rad_max)
        y = rs.randint(rad_max, width - rad_max)
        z = rs.randint(rad_max, depth - rad_max)
        rad = rs.randint(rad_min, rad_max)
        spy, spx, spz = np.ogrid[-x:height - x, -y:width - y, -z:depth - z]
        sphere = (spx * spx + spy * spy + spz * spz) <= rad * rad
        if num_seg_classes > 1:
            image[sphere] = np.ceil(rs.random() * num_seg_classes)
        else:
            image[sphere] = rs.random() * 0.5 + 0.5

    labels = np.ceil(image).astype(np.int32)
    norm = rs.uniform(0, num_seg_classes * noise_max, size=image.shape)
    if noise_max > 0:
        noisyimage = np.clip((image / max(num_seg_classes, 1)) + norm, 0, 1).astype(np.float32)
    else:
        noisyimage = (image / max(num_seg_classes, 1)).astype(np.float32)

    if channel_dim is not None:
        if not (isinstance(channel_dim, int) and channel_dim in (-1, 0, 3)):
            raise AssertionError("invalid channel dim.")
        if channel_dim == 0:
            noisyimage = noisyimage[None]
            labels = labels[None]
        else:
            noisyimage = noisyimage[..., None]
            labels = labels[..., None]
    return noisyimage, labels
