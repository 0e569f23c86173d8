"""MMAR (Medical Model ARchive) loading (reference: monai/apps/mmars/mmars.py:41-300).

Zero-egress environment: ``download_mmar`` cannot reach NGC, but it fully handles the
local side — locating an already-staged MMAR directory or extracting a local
``.zip``/``.tar.gz`` archive into ``mmar_dir``. ``load_from_mmar`` then performs the
reference's whole resolution chain on the extracted archive:

1. read the torch checkpoint (``models/model.pt``; torch CPU is available here),
2. find the model config via the reference's breadth-first ``_get_val`` search
   (checkpoint ``train_conf`` -> ``config/config_train.json`` -> checkpoint root),
3. instantiate the network from ``name`` (resolved in ``monai_tpu.networks.nets``)
   or dotted ``path``,
4. when ``pretrained``, translate the torch state dict into the nnx module's
   parameter pytree — names are normalised and conv kernels transposed
   (torch OI*k -> jax *k IO) with shape checking.
"""
from __future__ import annotations

import json
import os
import tarfile
import zipfile
from collections.abc import Mapping
from pathlib import Path
from typing import Any

import numpy as np

from .model_desc import MODEL_DESC, RemoteMMARKeys as Keys

__all__ = ["get_model_spec", "download_mmar", "load_from_mmar"]


def get_model_spec(idx: int | str):
    """Look up a model spec by index or (case-insensitive) name
    (reference: mmars.py:41)."""
    if isinstance(idx, int):
        return MODEL_DESC[idx]
    if isinstance(idx, str):
        key = idx.strip().lower()
        for spec in MODEL_DESC:
            if str(spec.get(Keys.ID)).strip().lower() == key:
                return spec
    return idx


def _extract_archive(archive: Path, out_dir: Path) -> None:
    if zipfile.is_zipfile(archive):
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(out_dir)
    elif tarfile.is_tarfile(archive):
        with tarfile.open(archive) as tf:
            tf.extractall(out_dir)
    else:
        raise ValueError(f"Unsupported MMAR archive format: {archive}")


def download_mmar(item, mmar_dir=None, progress: bool = True, api: bool = True,
                  version: int = -1) -> Path:
    """Resolve an MMAR locally (reference: mmars.py:106).

    Network download from NGC is unavailable (zero egress); this resolves, in order:
    an already-extracted ``<mmar_dir>/<name>`` directory, or a local
    ``<mmar_dir>/<name>.zip`` / ``.tar.gz`` / ``.tgz`` archive which is extracted
    in place. Anything else raises with the download instruction.
    """
    if not isinstance(item, Mapping):
        item = get_model_spec(item)
    name = item[Keys.NAME] if isinstance(item, Mapping) else str(item)
    if version > 0:
        name = f"{name}_{version}"
    root = Path(mmar_dir or ".")
    model_dir = root / name
    if model_dir.is_dir():
        return model_dir
    for suffix in (".zip", ".tar.gz", ".tgz", ".tar"):
        archive = root / f"{name}{suffix}"
        if archive.is_file():
            _extract_archive(archive, model_dir)
            # archives may wrap everything in a single top-level folder
            entries = list(model_dir.iterdir())
            if len(entries) == 1 and entries[0].is_dir() and not (model_dir / "models").exists():
                return entries[0]
            return model_dir
    raise RuntimeError(
        f"MMAR '{name}' not found under {root} and network download from NGC is "
        "unavailable in this environment. Stage the MMAR directory or its "
        f"zip/tar archive at {root / name}.")


def _get_val(input_dict: Mapping, key: str = "model", default: Any | None = None):
    """Breadth-first search for ``key`` in nested mappings (reference: mmars.py:301)."""
    if key in input_dict:
        return input_dict[key]
    for sub_dict in input_dict:
        val = input_dict[sub_dict]
        if isinstance(val, Mapping):
            found_val = _get_val(val, key=key, default=None)
            if found_val is not None:
                return found_val
    return default


def _to_numpy_state(model_dict: Mapping) -> dict:
    """torch tensors -> numpy arrays, flat {dotted_name: array}."""
    out = {}
    for k, v in model_dict.items():
        if hasattr(v, "detach"):
            out[str(k)] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):
            out[str(k)] = v
    return out


def _assign_torch_weights(model_inst, torch_state: dict) -> tuple[int, int]:
    """Best-effort translation of a torch state dict into an nnx module.

    Matching is by normalised dotted path suffix and shape; conv kernels are
    transposed from torch (O, I, *k) to the jax channel-last layout (*k, I, O).
    Returns (n_changed, n_unchanged_target_leaves).
    """
    import jax
    from flax import nnx

    state = nnx.state(model_inst)
    flat = jax.tree_util.tree_flatten_with_path(state.to_pure_dict())[0]

    def norm(name: str) -> str:
        return (name.replace("weight", "w").replace("kernel", "w")
                .replace("bias", "b").replace(".", "/").lower())

    src = {norm(k): v for k, v in torch_state.items()}
    changed = 0
    new_leaves = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        nkey = norm(key)
        cand = src.get(nkey)
        if cand is None:
            # suffix match (container names differ between frameworks)
            suffix_hits = [v for k, v in src.items() if k.endswith(nkey) or nkey.endswith(k)]
            cand = suffix_hits[0] if len(suffix_hits) == 1 else None
        if cand is None or not hasattr(leaf, "shape"):
            continue
        tgt_shape = tuple(leaf.shape)
        if tuple(cand.shape) == tgt_shape:
            new_leaves[key] = np.asarray(cand, dtype=np.asarray(leaf).dtype)
            changed += 1
        elif cand.ndim >= 3 and tgt_shape == tuple(cand.shape[2:]) + (cand.shape[1], cand.shape[0]):
            # torch conv (O, I, *k) -> jax (*k, I, O)
            perm = tuple(range(2, cand.ndim)) + (1, 0)
            new_leaves[key] = np.transpose(cand, perm).astype(np.asarray(leaf).dtype)
            changed += 1
    if changed:
        pure = state.to_pure_dict()

        def apply(d, prefix=""):
            for k in list(d.keys()):
                key = f"{prefix}/{k}" if prefix else str(k)
                if isinstance(d[k], dict):
                    apply(d[k], key)
                elif key in new_leaves:
                    d[k] = new_leaves[key]
        apply(pure)
        state.replace_by_pure_dict(pure)
        nnx.update(model_inst, state)
    return changed, len(flat) - changed


def load_from_mmar(item, mmar_dir=None, progress: bool = True, version: int = -1,
                   map_location=None, pretrained: bool = True, weights_only: bool = False,
                   model_key: str = "model", api: bool = True, model_file=None) -> Any:
    """Load a network (and optionally its weights) from a local MMAR
    (reference: mmars.py:188)."""
    from ...utils.module import optional_import
    from .. import utils as app_utils

    logger = app_utils.get_logger("monai_tpu.apps.mmars")
    if not isinstance(item, Mapping):
        item = get_model_spec(item)
        if not isinstance(item, Mapping):
            item = {Keys.NAME: str(item)}
    model_dir = download_mmar(item=item, mmar_dir=mmar_dir, progress=progress,
                              version=version, api=api)
    if model_file is None:
        model_file = os.path.join("models", "model.pt")
    _model_file = Path(model_dir) / item.get(Keys.MODEL_FILE, model_file)

    model_dict: dict = {}
    if _model_file.exists():
        if _model_file.name.endswith(".ts"):
            raise ValueError(
                "TorchScript MMARs are not loadable in monai_tpu (no torch runtime "
                "module system); use the .pt checkpoint variant.")
        torch, has_torch = optional_import("torch")
        if has_torch:
            model_dict = torch.load(str(_model_file), map_location=map_location or "cpu",
                                    weights_only=True)
            if not isinstance(model_dict, Mapping):
                model_dict = {model_key: model_dict}
        else:
            raise ImportError("loading MMAR checkpoints requires the 'torch' package.")
    if weights_only:
        if not model_dict:
            raise FileNotFoundError(f"MMAR model file not found: {_model_file}")
        weights = model_dict.get(model_key, model_dict)
        return _to_numpy_state(weights if isinstance(weights, Mapping) else model_dict)

    # 1. checkpoint train_conf  2. config_train.json  3. checkpoint root
    model_config = _get_val(dict(model_dict).get("train_conf", {}), key=model_key, default={})
    if not model_config or not isinstance(model_config, Mapping):
        json_path = Path(model_dir) / item.get(
            Keys.CONFIG_FILE, os.path.join("config", "config_train.json"))
        if json_path.exists():
            with open(json_path) as f:
                model_config = _get_val(dict(json.load(f)), key=model_key, default={})
    if not model_config:
        model_config = _get_val(dict(model_dict), key=model_key, default={})
    if not (model_config and isinstance(model_config, Mapping)):
        raise ValueError(
            f"Could not load model config dictionary from config: "
            f"{item.get(Keys.CONFIG_FILE)}, or from model file: {item.get(Keys.MODEL_FILE)}.")

    if model_config.get("name"):
        from ...networks import nets as monai_nets

        model_name = model_config["name"]
        model_cls = getattr(monai_nets, model_name)
    elif model_config.get("path"):
        model_module, model_name = model_config.get("path", ".").rsplit(".", 1)
        model_cls, has_cls = optional_import(module=model_module, name=model_name)
        if not has_cls:
            raise ValueError(
                f"Could not load MMAR model config {model_config.get('path', '')}; make "
                f"sure the MMAR's sub-folders in '{model_dir}' are on the PYTHONPATH.")
    else:
        raise ValueError(f"Could not load model config {model_config}.")

    logger.info(f"*** Model: {model_cls}")
    model_kwargs = dict(model_config.get("args", None) or {})
    from flax import nnx

    model_kwargs.setdefault("rngs", nnx.Rngs(0))
    try:
        model_inst = model_cls(**model_kwargs)
    except TypeError:
        model_kwargs.pop("rngs", None)
        model_inst = model_cls(**model_kwargs)
    if pretrained and model_dict:
        weights = model_dict.get(model_key, model_dict)
        if isinstance(weights, Mapping):
            changed, unchanged = _assign_torch_weights(model_inst, _to_numpy_state(weights))
            if unchanged:
                logger.warning(f"*** Loading model state -- unchanged: {unchanged}, "
                               f"changed: {changed}.")
    return model_inst
