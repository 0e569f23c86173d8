"""MMAR download/load utilities (reference: monai/apps/mmars/mmars.py:41-300).

This environment has zero network egress, so ``download_mmar`` raises a clear error;
``load_from_mmar`` works against an already-downloaded local MMAR directory.
"""
from __future__ import annotations

import json
import os
from typing import Any

from .model_desc import MODEL_DESC, RemoteMMARKeys

__all__ = ["get_model_spec", "download_mmar", "load_from_mmar"]


def get_model_spec(idx: int | str):
    """Look up a model spec by index or (case-insensitive) name
    (reference: mmars.py:41)."""
    if isinstance(idx, int):
        return MODEL_DESC[idx]
    key = str(idx).strip().lower()
    for spec in MODEL_DESC:
        if str(spec[RemoteMMARKeys.ID]).strip().lower() == key:
            return spec
    return idx


def download_mmar(item, mmar_dir=None, progress: bool = True, api: bool = True,
                  version: int = -1):
    """(reference: mmars.py:106). Requires NGC network access — unavailable here."""
    raise RuntimeError(
        "download_mmar requires network access to NGC, which is unavailable in this "
        "environment. Place the MMAR directory locally and use load_from_mmar on it.")


def load_from_mmar(item, mmar_dir=None, progress: bool = True, version: int = -1,
                   map_location=None, pretrained: bool = True, weights_only: bool = False,
                   model_key: str = "model", api: bool = True, model_file=None) -> Any:
    """Instantiate the network described by a local MMAR's train config
    (reference: mmars.py:188). Torch checkpoint weights are not loadable into jax
    modules; only the architecture is instantiated."""
    from ...bundle.config_parser import ConfigParser

    spec = get_model_spec(item) if not isinstance(item, dict) else item
    name = spec[RemoteMMARKeys.ID] if isinstance(spec, dict) else str(spec)
    root = os.path.join(mmar_dir or ".", name)
    config_path = os.path.join(root, spec.get(RemoteMMARKeys.CONFIG_FILE,
                                              os.path.join("config", "config_train.json")) \
        if isinstance(spec, dict) else os.path.join("config", "config_train.json"))
    if not os.path.exists(config_path):
        raise FileNotFoundError(
            f"MMAR config not found at {config_path}; download_mmar is unavailable "
            "(zero egress), so the MMAR must already exist locally.")
    with open(config_path) as f:
        conf = json.load(f)
    model_conf = conf.get(model_key, None)
    if model_conf is None:
        raise ValueError(f"config has no '{model_key}' section")
    parser = ConfigParser({"network": {
        "_target_": model_conf.get("name", model_conf.get("path")),
        **model_conf.get("args", {}),
    }})
    return parser.get_parsed_content("network")
