"""MMAR model-zoo descriptions (reference: monai/apps/mmars/model_desc.py).

Kept as metadata only: downloads require NGC network access, unavailable here.
"""
from __future__ import annotations

import os

__all__ = ["MODEL_DESC", "RemoteMMARKeys"]


class RemoteMMARKeys:
    """(reference: model_desc.py RemoteMMARKeys)."""

    ID = "id"
    NAME = "name"
    URL = "url"
    DOC = "doc"
    FILE_TYPE = "file_type"
    HASH_TYPE = "hash_type"
    HASH_VAL = "hash_val"
    MODEL_FILE = "model_file"
    CONFIG_FILE = "config_file"
    VERSION = "version"


MODEL_DESC = tuple(
    {
        RemoteMMARKeys.ID: name,
        RemoteMMARKeys.NAME: name,
        RemoteMMARKeys.FILE_TYPE: "zip",
        RemoteMMARKeys.HASH_TYPE: "md5",
        RemoteMMARKeys.HASH_VAL: None,
        RemoteMMARKeys.MODEL_FILE: os.path.join("models", "model.pt"),
        RemoteMMARKeys.CONFIG_FILE: os.path.join("config", "config_train.json"),
        RemoteMMARKeys.VERSION: 1,
    }
    for name in (
        "clara_pt_prostate_mri_segmentation",
        "clara_pt_covid19_ct_lesion_segmentation",
        "clara_pt_covid19_3d_ct_classification",
        "clara_pt_covid19_ct_lung_annotation",
        "clara_pt_fed_learning_brain_tumor_mri_segmentation",
        "clara_pt_pathology_metastasis_detection",
        "clara_pt_brain_mri_segmentation",
        "clara_pt_liver_and_tumor_ct_segmentation",
        "clara_pt_pancreas_and_tumor_ct_segmentation",
        "clara_pt_spleen_ct_segmentation",
        "clara_pt_deepgrow_2d_annotation",
        "clara_pt_deepgrow_3d_annotation",
        "clara_pt_self_supervised_learning_segmentation",
    )
)
