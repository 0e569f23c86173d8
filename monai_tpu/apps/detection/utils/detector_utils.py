"""Detector input validation / padding helpers (reference:
monai/apps/detection/utils/detector_utils.py:28-213)."""
from __future__ import annotations

import warnings
from typing import Any, Sequence

import numpy as np

from ....transforms.utils import compute_divisible_spatial_size
from ....utils.backend import is_jax, to_numpy
from ....utils.misc import ensure_tuple_rep

__all__ = ["check_input_images", "check_training_targets", "pad_images", "preprocess_images"]


def _is_array(x) -> bool:
    return isinstance(x, np.ndarray) or is_jax(x)


def check_input_images(input_images, spatial_dims: int) -> None:
    """Validate (B, C, spatial...) tensor or list of (C, spatial...) tensors
    (reference: detector_utils.py:28)."""
    if _is_array(input_images):
        if len(input_images.shape) != spatial_dims + 2:
            raise ValueError(
                "When input_images is an array it must be (spatial_dims + 2)-D, i.e. "
                f"{spatial_dims + 2}-D here; got shape {input_images.shape}.")
    elif isinstance(input_images, list):
        for img in input_images:
            if len(img.shape) != spatial_dims + 1:
                raise ValueError(
                    "When input_images is a list, each element must be (spatial_dims + 1)-D, "
                    f"i.e. {spatial_dims + 1}-D here; got shape {img.shape}.")
    else:
        raise ValueError("input_images needs to be a list of arrays or an array.")


def check_training_targets(input_images, targets, spatial_dims: int,
                           target_label_key: str, target_box_key: str) -> list:
    """Validate training targets; reshape empty box arrays to (0, 2*D)
    (reference: detector_utils.py:55)."""
    if targets is None:
        raise ValueError("Please provide ground truth targets during training.")
    if len(input_images) != len(targets):
        raise ValueError(f"len(input_images) should equal len(targets), "
                         f"got {len(input_images)}, {len(targets)}.")
    for i, target in enumerate(targets):
        if (target_label_key not in target) or (target_box_key not in target):
            raise ValueError(f"{target_label_key} and {target_box_key} are expected keys "
                             f"in targets. Got {list(target.keys())}.")
        boxes = target[target_box_key]
        if not _is_array(boxes):
            raise ValueError(f"Expected target boxes to be an array, got {type(boxes)}.")
        if len(boxes.shape) != 2 or boxes.shape[-1] != 2 * spatial_dims:
            if boxes.size == 0:
                warnings.warn(f"Given target boxes has shape {boxes.shape}; reshaped to "
                              f"(0, {2 * spatial_dims}).")
                target[target_box_key] = np.asarray(to_numpy(boxes)).reshape(0, 2 * spatial_dims)
            else:
                raise ValueError(f"Expected target boxes of shape (N, {2 * spatial_dims}), "
                                 f"got {boxes.shape}.")
    return targets


def pad_images(input_images, spatial_dims: int, size_divisible, mode: str = "constant",
               **kwargs: Any) -> tuple:
    """Batch + pad images so spatial sizes are divisible by ``size_divisible``
    (reference: detector_utils.py:111). Returns (batched array, original sizes)."""
    size_divisible = ensure_tuple_rep(size_divisible, spatial_dims)
    np_mode = {"constant": "constant", "reflect": "reflect", "replicate": "edge",
               "circular": "wrap"}.get(str(mode), str(mode))
    if _is_array(input_images):
        orig_size = list(input_images.shape[-spatial_dims:])
        new_size = compute_divisible_spatial_size(orig_size, k=size_divisible)
        pad_width = [(0, 0), (0, 0)] + [(0, max(int(sp_i) - orig_size[i], 0))
                                        for i, sp_i in enumerate(new_size)]
        if max(p[1] for p in pad_width) == 0:
            return input_images, [orig_size] * input_images.shape[0]
        return np.pad(np.asarray(to_numpy(input_images)), pad_width, mode=np_mode,
                      **kwargs), [orig_size] * input_images.shape[0]

    image_sizes = [list(img.shape[-spatial_dims:]) for img in input_images]
    in_channels = input_images[0].shape[0]
    max_size = [max(s[i] for s in image_sizes) for i in range(spatial_dims)]
    new_size = compute_divisible_spatial_size(max_size, k=size_divisible)
    batch = np.zeros((len(input_images), in_channels, *new_size),
                     dtype=np.asarray(to_numpy(input_images[0])).dtype)
    for i, img in enumerate(input_images):
        sl = (i, slice(None)) + tuple(slice(0, s) for s in img.shape[1:])
        batch[sl] = to_numpy(img)
    return batch, image_sizes


def preprocess_images(input_images, spatial_dims: int, size_divisible,
                      mode: str = "constant", **kwargs: Any) -> tuple:
    """Validate + pad to a divisible batched array (reference:
    detector_utils.py:179)."""
    check_input_images(input_images, spatial_dims)
    size_divisible = ensure_tuple_rep(size_divisible, spatial_dims)
    return pad_images(input_images, spatial_dims, size_divisible, mode, **kwargs)
