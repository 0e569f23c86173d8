"""Deepgrow dataset pre-processing (reference: monai/apps/deepgrow/dataset.py:25
create_dataset, :149 _save_data_2d, :216 _save_data_3d)."""
from __future__ import annotations

import logging
import os
from collections.abc import Sequence

import numpy as np

__all__ = ["create_dataset"]

logger = logging.getLogger(__name__)


def _default_transforms(image_key, label_key, pixdim):
    from ...transforms import (
        Compose,
        EnsureChannelFirstd,
        LoadImaged,
        Orientationd,
        Spacingd,
        SqueezeDimd,
    )

    keys = [image_key, label_key]
    mode = ["bilinear", "nearest"]
    return Compose([
        LoadImaged(keys=keys, allow_missing_keys=True),
        EnsureChannelFirstd(keys=keys, allow_missing_keys=True, channel_dim="no_channel"),
        Orientationd(keys=keys, axcodes="RAS", allow_missing_keys=True),
        Spacingd(keys=keys, pixdim=pixdim, mode=mode, allow_missing_keys=True),
        SqueezeDimd(keys=keys, dim=0, allow_missing_keys=True),
    ])


def _to_np(x):
    from ...utils.backend import to_numpy

    from ...data.meta_image import MetaImage

    return to_numpy(x.data if isinstance(x, MetaImage) else x)


def _save_data_2d(vol_idx, vol_image, vol_label, dataset_dir, relative_path):
    """Slice volumes into per-slice .npy pairs (reference: deepgrow/dataset.py:149)."""
    data_list = []
    image_count = 0
    label_count = 0
    unique_labels_count = 0
    os.makedirs(os.path.join(dataset_dir, "images"), exist_ok=True)
    for sid in range(vol_image.shape[0]):
        image = vol_image[sid]
        label = vol_label[sid] if vol_label is not None else None
        if vol_label is not None and np.sum(label) == 0:
            continue
        image_file_prefix = f"vol_idx_{vol_idx:0>4d}_slice_{sid:0>3d}"
        image_file = os.path.join(dataset_dir, "images", image_file_prefix + ".npy")
        np.save(image_file, image)
        image_count += 1
        if label is None:
            data_list.append({"image": (image_file if not relative_path
                                        else os.path.relpath(image_file, dataset_dir))})
            continue
        os.makedirs(os.path.join(dataset_dir, "labels"), exist_ok=True)
        unique_labels = np.unique(label[label != 0])
        unique_labels_count = max(unique_labels_count, len(unique_labels))
        for idx in unique_labels:
            label_file_prefix = f"{image_file_prefix}_region_{int(idx):0>2d}"
            label_file = os.path.join(dataset_dir, "labels", label_file_prefix + ".npy")
            curr_label = (label == idx).astype(np.float32)
            np.save(label_file, curr_label)
            label_count += 1
            data_list.append({
                "image": image_file if not relative_path
                else os.path.relpath(image_file, dataset_dir),
                "label": label_file if not relative_path
                else os.path.relpath(label_file, dataset_dir),
                "region": int(idx),
            })
    logger.info(f"{vol_idx} => images: {image_count}; labels: {label_count}; "
                f"unique: {unique_labels_count}")
    return data_list


def _save_data_3d(vol_idx, vol_image, vol_label, dataset_dir, relative_path):
    """Save volumes as .npy pairs, one per label region (reference: deepgrow/dataset.py:216)."""
    data_list = []
    os.makedirs(os.path.join(dataset_dir, "images"), exist_ok=True)
    image_file_prefix = f"vol_idx_{vol_idx:0>4d}"
    image_file = os.path.join(dataset_dir, "images", image_file_prefix + ".npy")
    np.save(image_file, vol_image)
    if vol_label is None:
        data_list.append({"image": image_file if not relative_path
                          else os.path.relpath(image_file, dataset_dir)})
        return data_list
    os.makedirs(os.path.join(dataset_dir, "labels"), exist_ok=True)
    unique_labels = np.unique(vol_label[vol_label != 0])
    for idx in unique_labels:
        label_file_prefix = f"{image_file_prefix}_region_{int(idx):0>2d}"
        label_file = os.path.join(dataset_dir, "labels", label_file_prefix + ".npy")
        np.save(label_file, (vol_label == idx).astype(np.float32))
        data_list.append({
            "image": image_file if not relative_path
            else os.path.relpath(image_file, dataset_dir),
            "label": label_file if not relative_path
            else os.path.relpath(label_file, dataset_dir),
            "region": int(idx),
        })
    return data_list


def create_dataset(datalist: list[dict], output_dir: str, dimension: int,
                   pixdim: Sequence[float] | float, image_key: str = "image",
                   label_key: str = "label", base_dir=None, limit: int = 0,
                   relative_path: bool = False, transforms=None) -> list[dict]:
    """Pre-process volumes into per-slice (2D) or per-region (3D) deepgrow training data
    (reference: deepgrow/dataset.py:25)."""
    if dimension not in (2, 3):
        raise ValueError("Dimension can be only 2 or 3 for Deepgrow training.")
    if not datalist:
        raise ValueError("Input datalist is empty.")
    transforms = transforms or _default_transforms(image_key, label_key, pixdim)
    new_datalist = []
    for idx, item in enumerate(datalist):
        if limit and idx >= limit:
            break
        image = item[image_key]
        label = item.get(label_key)
        if base_dir:
            image = os.path.join(base_dir, image)
            label = os.path.join(base_dir, label) if label else None
        image = os.path.abspath(image)
        label = os.path.abspath(label) if label else None
        data = transforms({image_key: image, label_key: label} if label
                          else {image_key: image})
        vol_image = np.moveaxis(_to_np(data[image_key]), -1, 0)
        vol_label = data.get(label_key)
        vol_label = np.moveaxis(_to_np(vol_label), -1, 0) if vol_label is not None else None
        if dimension == 2:
            out = _save_data_2d(idx, vol_image, vol_label, output_dir, relative_path)
        else:
            out = _save_data_3d(idx, vol_image, vol_label, output_dir, relative_path)
        new_datalist.extend(out)
    return new_datalist
