"""nnU-Net V2 data-conversion utilities
(reference: monai/apps/nnunet/utils.py: analyze_data, create_new_data_copy,
create_new_dataset_json, NNUNETMode)."""
from __future__ import annotations

import copy
import json
import os

import numpy as np

from ...transforms.io_array import LoadImage
from ...utils.enums import StrEnum
from ...utils.misc import ensure_tuple

__all__ = ["analyze_data", "create_new_data_copy", "create_new_dataset_json", "NNUNETMode"]


class NNUNETMode(StrEnum):
    N_2D = "2d"
    N_3D_FULLRES = "3d_fullres"
    N_3D_LOWRES = "3d_lowres"
    N_3D_CASCADE_FULLRES = "3d_cascade_fullres"


def _load(path):
    img = LoadImage(image_only=True, ensure_channel_first=True, simple_keys=True)(path)
    return img


def analyze_data(datalist_json: dict, data_dir: str) -> tuple[int, int]:
    """Scan a MONAI-style datalist for (num_input_channels, num_foreground_classes)."""
    img = _load(os.path.join(data_dir, datalist_json["training"][0]["image"]))
    num_input_channels = img.shape[0] if img.ndim == 4 else 1
    num_foreground_classes = 0
    for entry in datalist_json["training"]:
        seg = _load(os.path.join(data_dir, entry["label"]))
        num_foreground_classes = max(num_foreground_classes, int(np.asarray(seg).max()))
    return num_input_channels, num_foreground_classes


def create_new_data_copy(test_key: str, datalist_json: dict, data_dir: str,
                         num_input_channels: int, output_datafolder: str) -> None:
    """Re-layout a MONAI datalist into the nnU-Net V2 raw-data convention:
    per-channel ``case_N_XXXX.nii.gz`` images under imagesTr/imagesTs and uint8
    labels under labelsTr/labelsTs, plus a name-mapping datalist.json."""
    from ...data.nifti import write_nifti

    index = 0
    new_datalist: dict = {"training": [], test_key: []}
    for key, img_folder, label_folder in zip(["training", test_key],
                                             ["imagesTr", "imagesTs"],
                                             ["labelsTr", "labelsTs"]):
        if key is None:
            continue
        for entry in datalist_json.get(key, []):
            orig_img = entry["image"] if isinstance(entry, dict) else entry
            case = f"case_{index}"
            index += 1
            img = _load(os.path.join(data_dir, orig_img))
            affine = np.asarray(img.meta.get("original_affine", np.eye(4))) \
                if hasattr(img, "meta") else np.eye(4)
            arr = np.asarray(img)
            for ch in range(num_input_channels):
                suffix = "_" + str(ch + 10000)[-4:]
                write_nifti(arr[ch],
                            os.path.join(output_datafolder, img_folder, case + suffix + ".nii.gz"),
                            affine=affine)
            if isinstance(entry, dict) and "label" in entry:
                seg = _load(os.path.join(data_dir, entry["label"]))
                seg_affine = np.asarray(seg.meta.get("original_affine", np.eye(4))) \
                    if hasattr(seg, "meta") else np.eye(4)
                seg_arr = np.asarray(seg).astype(np.uint8)
                if seg_arr.ndim == 4 and seg_arr.shape[0] == 1:
                    seg_arr = seg_arr[0]
                write_nifti(seg_arr,
                            os.path.join(output_datafolder, label_folder, case + ".nii.gz"),
                            affine=seg_affine)
            if isinstance(entry, dict):
                val = copy.deepcopy(entry)
                val["new_name"] = case
                new_datalist[key].append(val)
            else:
                new_datalist[key].append({"image": entry, "new_name": case})
    with open(os.path.join(output_datafolder, "datalist.json"), "w") as f:
        json.dump(new_datalist, f, sort_keys=True, indent=4, ensure_ascii=False)


def create_new_dataset_json(modality, num_foreground_classes: int, num_input_channels: int,
                            num_training_data: int, output_filepath: str) -> None:
    """Write the nnU-Net V2 ``dataset.json`` (channel_names / labels / numTraining)."""
    modality = ensure_tuple(modality)
    data = {
        "channel_names": {str(j): modality[j] for j in range(num_input_channels)},
        "labels": {"background": 0,
                   **{f"class{j + 1}": j + 1 for j in range(num_foreground_classes)}},
        "numTraining": num_training_data,
        "file_ending": ".nii.gz",
    }
    with open(output_filepath, "w") as f:
        json.dump(data, f, sort_keys=True, indent=4, ensure_ascii=False)
