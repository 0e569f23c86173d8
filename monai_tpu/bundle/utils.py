"""Bundle DSL constants and default templates (reference: monai/bundle/utils.py).

The DSL keys must match the reference exactly (they are the config-file syntax);
the default templates are jax-native equivalents (no device strings, no torch).
"""
from __future__ import annotations

__all__ = ["ID_REF_KEY", "ID_SEP_KEY", "EXPR_KEY", "MACRO_KEY", "MERGE_KEY",
           "DEFAULT_METADATA", "DEFAULT_INFERENCE", "DEFAULT_HANDLERS_ID",
           "DEFAULT_MLFLOW_SETTINGS", "DEFAULT_EXP_MGMT_SETTINGS"]

ID_REF_KEY = "@"    # start of a reference to a ConfigItem
ID_SEP_KEY = "::"   # separator for the ID of a ConfigItem
EXPR_KEY = "$"      # start of a ConfigExpression
MACRO_KEY = "%"     # start of a macro of a config
MERGE_KEY = "+"     # prefix indicating merge instead of override for multi-config reads


def _versions() -> dict:
    import numpy

    try:
        from .. import __version__ as mt_version
    except Exception:
        mt_version = "0.1.0"
    try:
        import jax

        jax_version = jax.__version__
    except Exception:
        jax_version = "unknown"
    return {"monai_tpu": mt_version, "jax": jax_version, "numpy": numpy.__version__}


_v = _versions()

DEFAULT_METADATA = {
    "version": "0.0.1",
    "changelog": {"0.0.1": "Initial version"},
    "monai_tpu_version": _v["monai_tpu"],
    "jax_version": _v["jax"],
    "numpy_version": _v["numpy"],
    "required_packages_version": {},
    "task": "Describe what the network predicts",
    "description": "A longer description of what the network does, use context, inputs, outputs, etc.",
    "authors": "Your Name Here",
    "copyright": "Copyright (c) Your Name Here",
    "network_data_format": {"inputs": {}, "outputs": {}},
}

DEFAULT_INFERENCE = {
    "imports": ["$import glob"],
    "bundle_root": ".",
    "ckpt_path": "$@bundle_root + '/models/model.ckpt'",
    "dataset_dir": "/workspace/data",
    "datalist": "$list(sorted(glob.glob(@dataset_dir + '/*.nii.gz')))",
    "network": {"_target_": "???", "spatial_dims": 2},
    "preprocessing": {
        "_target_": "Compose",
        "transforms": [
            {"_target_": "LoadImaged", "keys": "image"},
            {"_target_": "EnsureChannelFirstd", "keys": "image"},
            {"_target_": "ScaleIntensityd", "keys": "image"},
        ],
    },
    "dataset": {"_target_": "Dataset", "data": "$[{'image': i} for i in @datalist]",
                "transform": "@preprocessing"},
    "dataloader": {"_target_": "DataLoader", "dataset": "@dataset", "batch_size": 1,
                   "shuffle": False},
    "inferer": {"_target_": "SimpleInferer"},
    "postprocessing": {
        "_target_": "Compose",
        "transforms": [
            {"_target_": "Activationsd", "keys": "pred", "softmax": True},
            {"_target_": "AsDiscreted", "keys": "pred", "argmax": True},
        ],
    },
    "evaluator": {
        "_target_": "SupervisedEvaluator",
        "val_data_loader": "@dataloader",
        "network": "@network",
        "inferer": "@inferer",
        "postprocessing": "@postprocessing",
    },
    "initialize": [],
    "run": ["$@evaluator.run()"],
}

# config IDs the experiment-management hooks look for (reference: bundle/utils.py:110)
DEFAULT_HANDLERS_ID = {
    "trainer": {"id": "train::trainer", "handlers": "train::handlers"},
    "validator": {"id": "validate::evaluator", "handlers": "validate::handlers"},
    "evaluator": {"id": "evaluator", "handlers": "handlers"},
}

DEFAULT_MLFLOW_SETTINGS = {
    "handlers_id": DEFAULT_HANDLERS_ID,
    "configs": {
        "tracking_uri": "$@output_dir + '/mlruns'",
        "experiment_name": "monai_tpu_experiment",
        "run_name": None,
        "save_execute_config": True,
        "trainer": {
            "_target_": "MLFlowHandler",
            "tracking_uri": "@tracking_uri",
            "experiment_name": "@experiment_name",
            "run_name": "@run_name",
            "iteration_log": True,
            "output_transform": "$monai_tpu.handlers.from_engine(['loss'], first=True)",
        },
        "validator": {
            "_target_": "MLFlowHandler",
            "tracking_uri": "@tracking_uri",
            "experiment_name": "@experiment_name",
            "run_name": "@run_name",
            "iteration_log": False,
        },
        "evaluator": {
            "_target_": "MLFlowHandler",
            "tracking_uri": "@tracking_uri",
            "experiment_name": "@experiment_name",
            "run_name": "@run_name",
            "iteration_log": False,
        },
    },
}

DEFAULT_EXP_MGMT_SETTINGS = {"mlflow": DEFAULT_MLFLOW_SETTINGS}


def merge_kv(args, k: str, v) -> None:
    """Update dict ``args`` with key/value; a ``+``-prefixed key merges dicts /
    extends lists instead of replacing (reference: bundle/utils.py merge_kv)."""
    import warnings

    if k.startswith(MERGE_KEY):
        id_ = k[1:]
        if id_ in args:
            if isinstance(v, dict) and isinstance(args[id_], dict):
                args[id_].update(v)
            elif isinstance(v, list) and isinstance(args[id_], list):
                args[id_].extend(v)
            else:
                raise ValueError(f"config must be dict or list for key `{k}`, but got {type(v)}: {v}.")
        else:
            warnings.warn(f"Can't merge entry ['{k}'], '{id_}' is not in target dict - copying instead.")
            args[id_] = v
    else:
        args[k] = v


def load_bundle_config(bundle_path: str, *config_names: str, **load_kw_args):
    """Load metadata + named config files from a bundle directory or zip without
    loading the network (reference: bundle/utils.py load_bundle_config)."""
    import json as _json
    import os
    import zipfile

    from .config_parser import ConfigParser

    parser = ConfigParser()
    if not os.path.exists(bundle_path):
        raise ValueError(f"Cannot find bundle file/directory '{bundle_path}'")
    if os.path.isdir(bundle_path):
        parser.read_meta(f=os.path.join(bundle_path, "configs", "metadata.json"), **load_kw_args)
        for cname in config_names:
            cpath = os.path.join(bundle_path, "configs", cname)
            if not os.path.exists(cpath):
                raise ValueError(f"Cannot find config file '{cpath}'")
            parser.read_config(f=cpath, **load_kw_args)
        return parser
    if zipfile.is_zipfile(bundle_path):
        with zipfile.ZipFile(bundle_path) as zf:
            names = zf.namelist()
            meta_name = next((n for n in names if n.endswith("configs/metadata.json")), None)
            if meta_name is None:
                raise ValueError(f"no configs/metadata.json in '{bundle_path}'")
            parser.read_meta(f=_json.loads(zf.read(meta_name)))
            for cname in config_names:
                centry = next((n for n in names if n.endswith(f"configs/{cname}")), None)
                if centry is None:
                    raise ValueError(f"Cannot find config file 'configs/{cname}' in '{bundle_path}'")
                if cname.endswith((".yml", ".yaml")):
                    import yaml

                    parser.read_config(f=yaml.safe_load(zf.read(centry)))
                else:
                    parser.read_config(f=_json.loads(zf.read(centry)))
        return parser
    raise ValueError(f"'{bundle_path}' is neither a directory nor a zip bundle")
