"""Bundle CLI verbs (reference: monai/bundle/scripts.py: run:926, run_workflow:1018,
download:448, verify_metadata:1049, verify_net_in_out:1160, ckpt_export:1439,
init_bundle:—, update_kwargs:75)."""
from __future__ import annotations

import json
import os
import warnings
from collections.abc import Sequence
from pathlib import Path
from typing import Any

from ..utils.misc import ensure_tuple
from .config_parser import ConfigParser
from .workflows import ConfigWorkflow

__all__ = ["run", "run_workflow", "verify_metadata", "verify_net_in_out", "ckpt_export",
           "init_bundle", "update_kwargs", "download", "load"]


def update_kwargs(args: str | dict | None = None, ignore_none: bool = True, **kwargs) -> dict:
    """Merge an args file/dict with kwargs (reference: scripts.py:75)."""
    args_: dict = {}
    if isinstance(args, str):
        args_ = dict(ConfigParser.load_config_file(args))
    elif isinstance(args, dict):
        args_ = dict(args)
    for k, v in kwargs.items():
        if ignore_none and v is None:
            continue
        args_[k] = v
    return args_


def run(run_id: str | None = None, init_id: str | None = None, final_id: str | None = None,
        meta_file: str | Sequence[str] | None = None, config_file: str | Sequence[str] | None = None,
        logging_file: str | None = None, tracking: str | dict | None = None, args_file: str | None = None,
        **override: Any):
    """`python -m monai_tpu.bundle run ...` (reference: scripts.py:926)."""
    _args = update_kwargs(args=args_file, run_id=run_id, init_id=init_id, final_id=final_id,
                          meta_file=meta_file, config_file=config_file, logging_file=logging_file,
                          tracking=tracking, **override)
    if "config_file" not in _args:
        raise ValueError("`config_file` is required for `run`.")
    init_id_ = _args.pop("init_id", None) or "initialize"
    run_id_ = _args.pop("run_id", None) or "run"
    final_id_ = _args.pop("final_id", None) or "finalize"
    cf = _args.pop("config_file")
    mf = _args.pop("meta_file", None)
    lf = _args.pop("logging_file", None)
    _args.pop("tracking", None)
    workflow = ConfigWorkflow(config_file=cf, meta_file=mf, logging_file=lf, init_id=init_id_,
                              run_id=run_id_, final_id=final_id_, workflow_type=None, **_args)
    workflow.initialize()
    ret = workflow.run()
    workflow.finalize()
    return ret


def run_workflow(workflow_name: str | None = None, config_file: str | Sequence[str] | None = None,
                 args_file: str | None = None, **kwargs):
    """Create + run a named workflow class (reference: scripts.py:1018)."""
    from ..utils.module import locate

    _args = update_kwargs(args=args_file, workflow_name=workflow_name, config_file=config_file, **kwargs)
    name = _args.pop("workflow_name", None)
    cls = ConfigWorkflow if name is None else (locate(name) if isinstance(name, str) else name)
    workflow = cls(**_args)
    workflow.initialize()
    workflow.run()
    workflow.finalize()
    return workflow


def verify_metadata(meta_file: str | Sequence[str] | None = None, filepath: str | None = None,
                    create_dir: bool | None = None, hash_val: str | None = None, args_file=None,
                    **kwargs):
    """Validate bundle metadata against its JSON schema (reference: scripts.py:1049).

    Zero-egress note: the schema must already be on disk (schema download is gated).
    """
    _args = update_kwargs(args=args_file, meta_file=meta_file, filepath=filepath, **kwargs)
    meta = ConfigParser.load_config_files(_args["meta_file"])
    schema_path = _args.get("filepath")
    if schema_path and os.path.exists(schema_path):
        try:
            import jsonschema

            with open(schema_path) as f:
                schema = json.load(f)
            jsonschema.validate(instance=meta, schema=schema)
            print("metadata is verified with no error.")
            return True
        except ImportError:
            warnings.warn("jsonschema is not installed; only structural checks performed.")
    required = ["version", "monai_version", "numpy_version"]
    missing = [k for k in required if k not in meta]
    if missing:
        raise ValueError(f"metadata missing required keys: {missing}")
    print("metadata is verified with no error.")
    return True


def verify_net_in_out(net_id: str | None = None, meta_file=None, config_file=None, device=None,
                      p: int | None = None, n: int | None = None, any: int | None = None,
                      extra_forward_args: dict | None = None, args_file=None, **override):
    """Fake-shape forward check of the bundle network (reference: scripts.py:1160)."""
    import numpy as np
    import jax.numpy as jnp

    _args = update_kwargs(args=args_file, net_id=net_id, meta_file=meta_file, config_file=config_file,
                          **override)
    parser = ConfigParser()
    parser.read_config(_args["config_file"])
    if _args.get("meta_file"):
        parser.read_meta(_args["meta_file"])
    net = parser.get_parsed_content(_args.get("net_id") or "network_def")
    meta = parser.get(parser.meta_key, {})
    fmt = meta.get("network_data_format", {})
    input_info = fmt.get("inputs", {}).get("image", {})
    output_info = fmt.get("outputs", {}).get("pred", {})
    input_channels = len(input_info.get("channel_def", {"0": "image"}))
    output_channels = len(output_info.get("channel_def", {"0": "bg", "1": "fg"}))
    spatial_shape = tuple(input_info.get("spatial_shape", (32, 32, 32)))
    spatial_shape = tuple(32 if not isinstance(s, int) else s for s in spatial_shape)
    x = jnp.asarray(np.random.rand(1, input_channels, *spatial_shape).astype(np.float32))
    y = net(x)
    if y.shape[1] != output_channels:
        raise ValueError(f"output channel number `{y.shape[1]}` doesn't match: `{output_channels}`.")
    print("data shape of network is verified with no error.")
    return net


def _export_stablehlo(net, input_shape, out_dir: Path) -> str | None:
    """Serialize the network forward as a jax.export (StableHLO) artifact — the
    TPU-native analog of the reference's TorchScript bundle (scripts.py:1439).
    The artifact is self-contained: weights are baked in as constants, and
    ``load_exported_network`` replays it without the Python model code."""
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from jax import export as jax_export

    graphdef, state = nnx.split(net)

    def fwd(x):
        return nnx.merge(graphdef, state)(x)

    x_spec = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
    exported = jax_export.export(jax.jit(fwd))(x_spec)
    blob = exported.serialize()
    path = out_dir / "model.stablehlo"
    path.write_bytes(blob)
    import json as _json

    (out_dir / "export_meta.json").write_text(_json.dumps(
        {"input_shape": list(input_shape), "dtype": "float32",
         "format": "jax.export/StableHLO"}, indent=2))
    return str(path)


def load_exported_network(filepath: str):
    """Load a ``ckpt_export`` StableHLO artifact; returns a callable(x)."""
    from jax import export as jax_export

    blob = Path(filepath).read_bytes()
    exported = jax_export.deserialize(blob)
    return lambda x: exported.call(x)


def ckpt_export(net_id=None, filepath=None, ckpt_file=None, meta_file=None, config_file=None,
                key_in_ckpt=None, input_shape=None, args_file=None, **override):
    """Export a bundle: orbax params + configs + a serialized jax.export (StableHLO)
    program of the network forward (the reference exports TorchScript,
    scripts.py:1439). ``input_shape`` (default from the bundle metadata, else
    (1, 1, 96, 96, 96)) fixes the exported program's signature."""
    from ..handlers.checkpoint import save_checkpoint

    _args = update_kwargs(args=args_file, net_id=net_id, filepath=filepath, ckpt_file=ckpt_file,
                          meta_file=meta_file, config_file=config_file, **override)
    parser = ConfigParser()
    parser.read_config(_args["config_file"])
    if _args.get("meta_file"):
        parser.read_meta(_args["meta_file"])
    net = parser.get_parsed_content(_args.get("net_id") or "network_def")
    if _args.get("ckpt_file"):
        from ..handlers.checkpoint import load_checkpoint

        key = key_in_ckpt or "model"
        load_checkpoint({key: net}, _args["ckpt_file"], strict=False)
    out = Path(_args["filepath"])
    out.mkdir(parents=True, exist_ok=True)
    save_checkpoint({"model": net}, str(out / "model"))
    ConfigParser.export_config_file(parser.get(), str(out / "config.json"), fmt="json", indent=2)
    if input_shape is None:
        meta = parser.get(parser.meta_key, {})
        info = meta.get("network_data_format", {}).get("inputs", {}).get("image", {})
        spatial = tuple(s if isinstance(s, int) else 96
                        for s in info.get("spatial_shape", (96, 96, 96)))
        input_shape = (1, len(info.get("channel_def", {"0": "image"}))) + spatial
    try:
        _export_stablehlo(net, input_shape, out)
    except Exception as e:  # params+config export still succeeds without AOT artifact
        import warnings

        warnings.warn(f"jax.export StableHLO serialization failed: {e}")
    print(f"exported bundle to {out}")
    return str(out)


def init_bundle(bundle_dir: str, ckpt_file=None, network=None, dataset_license: bool = False,
                metadata_str=None, inference_str=None):
    """Create an empty bundle skeleton (reference: scripts.py:—)."""
    bundle_path = Path(bundle_dir)
    configs_dir = bundle_path / "configs"
    models_dir = bundle_path / "models"
    docs_dir = bundle_path / "docs"
    for d in (configs_dir, models_dir, docs_dir):
        d.mkdir(parents=True, exist_ok=True)
    metadata = metadata_str or {
        "version": "0.0.1",
        "changelog": {"0.0.1": "Initial version"},
        "monai_version": "0.1.0",
        "pytorch_version": "n/a (monai_tpu bundle)",
        "numpy_version": "1.26.0",
        "required_packages_version": {},
        "task": "Describe what the network predicts",
        "description": "A longer description of what the network does",
        "authors": "Your Name Here",
        "copyright": "Copyright (c) Your Name Here",
        "network_data_format": {"inputs": {}, "outputs": {}},
    }
    inference = inference_str or {
        "imports": ["$import glob"],
        "device": "$None",
        "ckpt_path": "$@bundle_root + '/models/model'",
        "network_def": {"_target_": "???", "spatial_dims": 3},
        "preprocessing": {"_target_": "Compose", "transforms": []},
        "postprocessing": {"_target_": "Compose", "transforms": []},
        "inferer": {"_target_": "SimpleInferer"},
    }
    with open(configs_dir / "metadata.json", "w") as f:
        json.dump(metadata, f, indent=2)
    with open(configs_dir / "inference.json", "w") as f:
        json.dump(inference, f, indent=2)
    with open(docs_dir / "README.md", "w") as f:
        f.write("# Your Model Name\n\nDescribe your model here and how to run it.\n")
    return str(bundle_path)


def download(name: str | None = None, version: str | None = None, bundle_dir: str | None = None,
             source: str = "github", repo: str | None = None, url: str | None = None, **kwargs):
    """Bundle download (reference: scripts.py:448).  This environment is zero-egress;
    only pre-staged local paths are supported."""
    if url and os.path.exists(url):
        return url
    raise RuntimeError(
        "network downloads are unavailable in this environment; place the bundle locally and pass "
        "`url=<local path>`.")


def load(name: str, version: str | None = None, bundle_dir: str | None = None, **kwargs):
    """Load a local bundle's network + weights (reference: scripts.py:630)."""
    bundle_dir_ = Path(bundle_dir or ".") / name
    config = bundle_dir_ / "configs" / "inference.json"
    if not config.exists():
        raise FileNotFoundError(f"bundle config not found: {config}")
    parser = ConfigParser()
    parser.read_config(str(config))
    net = parser.get_parsed_content("network_def")
    model_path = bundle_dir_ / "models" / "model"
    if model_path.exists():
        from ..handlers.checkpoint import load_checkpoint

        load_checkpoint({"model": net}, str(model_path), strict=False)
    return net


def create_workflow(workflow_name=None, config_file=None, args_file: str | None = None, **kwargs):
    """Create + initialize (but not run) a bundle workflow (reference:
    scripts.py:1923)."""
    from ..utils.module import locate
    from .workflows import BundleWorkflow

    _args = update_kwargs(args=args_file, workflow_name=workflow_name,
                          config_file=config_file, **kwargs)
    name = _args.pop("workflow_name", None)
    config_file = _args.pop("config_file", None)
    if name is None:
        cls = ConfigWorkflow
    elif isinstance(name, str):
        import monai_tpu.bundle as _bundle_mod

        cls = getattr(_bundle_mod, name, None) or locate(name)
        if cls is None:
            raise ValueError(f"cannot locate specified workflow class: {name}.")
    elif isinstance(name, type) and issubclass(name, BundleWorkflow):
        cls = name
    else:
        raise ValueError("Argument `workflow_name` must be a bundle workflow class name "
                         f"or subclass of BundleWorkflow, got: {name}.")
    workflow = cls(config_file=config_file, **_args) if config_file is not None else cls(**_args)
    workflow.initialize()
    return workflow


def download_large_files(bundle_path: str | None = None, large_file_name: str | None = None) -> None:
    """Download the large files listed in a bundle's large_files.yml/.yaml/.json
    (reference: scripts.py:1935). Zero-egress: resolves and validates the file
    list; the actual fetch requires MONAI_TPU_ALLOW_DOWNLOADS=1."""
    bundle_path_ = Path(bundle_path or ".")
    if large_file_name is None:
        candidates = [bundle_path_ / f"large_files{ext}" for ext in (".yml", ".yaml", ".json")]
        existing = [c for c in candidates if c.exists()]
        if not existing:
            raise FileNotFoundError(f"cannot find the large_files.yml/.yaml/.json under {bundle_path_}.")
        lf_path = existing[0]
    else:
        lf_path = bundle_path_ / large_file_name
        if not lf_path.exists():
            raise FileNotFoundError(f"cannot find the large file list: {lf_path}.")
    parser = ConfigParser()
    parser.read_config(str(lf_path))
    large_files = parser.get().get("large_files", [])
    if os.environ.get("MONAI_TPU_ALLOW_DOWNLOADS", "0") != "1":
        raise RuntimeError(
            f"{len(large_files)} large file entries found in {lf_path}, but network downloads are "
            "unavailable in this environment; set MONAI_TPU_ALLOW_DOWNLOADS=1 with egress to fetch.")
    from ..apps.utils import download_url

    for lf_data in large_files:
        lf_data["fuzzy"] = True
        if lf_data.get("hash_val", "") == "":
            lf_data.pop("hash_val", None)
            lf_data.pop("hash_type", None)
        lf_data["filepath"] = str(bundle_path_ / lf_data.pop("path"))
        download_url(**lf_data)


_GITHUB_API = "https://api.github.com/repos/Project-MONAI/model-zoo"


def get_all_bundles_list(repo: str = "Project-MONAI/model-zoo", tag: str = "dev", auth_token=None):
    """List (name, latest version) of every bundle in a model-zoo repo (reference:
    scripts.py:1695). Requires egress (gated)."""
    if os.environ.get("MONAI_TPU_ALLOW_DOWNLOADS", "0") != "1":
        raise RuntimeError("get_all_bundles_list queries the GitHub API; set "
                           "MONAI_TPU_ALLOW_DOWNLOADS=1 in an egress-enabled environment.")
    import json as _json
    import urllib.request

    url = f"https://api.github.com/repos/{repo}/contents/models?ref={tag}"
    req = urllib.request.Request(url)
    if auth_token:
        req.add_header("Authorization", f"Bearer {auth_token}")
    with urllib.request.urlopen(req) as resp:
        entries = _json.loads(resp.read())
    bundle_names = sorted({e["name"] for e in entries if e.get("type") == "dir"})
    return [(name, get_bundle_versions(name, repo=repo, tag=tag,
                                       auth_token=auth_token)["latest_version"])
            for name in bundle_names]


def get_bundle_versions(bundle_name: str, repo: str = "Project-MONAI/model-zoo",
                        tag: str = "dev", auth_token=None) -> dict:
    """{'latest_version', 'all_versions'} of a model-zoo bundle (reference:
    scripts.py:1774). Requires egress (gated)."""
    if os.environ.get("MONAI_TPU_ALLOW_DOWNLOADS", "0") != "1":
        raise RuntimeError("get_bundle_versions queries the GitHub API; set "
                           "MONAI_TPU_ALLOW_DOWNLOADS=1 in an egress-enabled environment.")
    import json as _json
    import urllib.request

    url = f"https://raw.githubusercontent.com/{repo}/{tag}/models/model_info.json"
    req = urllib.request.Request(url)
    if auth_token:
        req.add_header("Authorization", f"Bearer {auth_token}")
    with urllib.request.urlopen(req) as resp:
        model_info = _json.loads(resp.read())
    versions = sorted(k.split("_v", 1)[1] for k in model_info if k.startswith(f"{bundle_name}_v"))
    if not versions:
        raise ValueError(f"bundle {bundle_name} not found in {repo}@{tag}.")
    return {"latest_version": versions[-1], "all_versions": versions}


def get_bundle_info(bundle_name: str, version: str | None = None,
                    repo: str = "Project-MONAI/model-zoo", tag: str = "dev",
                    auth_token=None) -> dict:
    """Release metadata of one bundle version (reference: scripts.py:1811).
    Requires egress (gated)."""
    if os.environ.get("MONAI_TPU_ALLOW_DOWNLOADS", "0") != "1":
        raise RuntimeError("get_bundle_info queries the GitHub API; set "
                           "MONAI_TPU_ALLOW_DOWNLOADS=1 in an egress-enabled environment.")
    import json as _json
    import urllib.request

    if version is None:
        version = get_bundle_versions(bundle_name, repo, tag, auth_token)["latest_version"]
    url = f"https://raw.githubusercontent.com/{repo}/{tag}/models/model_info.json"
    req = urllib.request.Request(url)
    if auth_token:
        req.add_header("Authorization", f"Bearer {auth_token}")
    with urllib.request.urlopen(req) as resp:
        model_info = _json.loads(resp.read())
    key = f"{bundle_name}_v{version}"
    if key not in model_info:
        raise ValueError(f"bundle {key} not found in {repo}@{tag}.")
    return model_info[key]


def push_to_hf_hub(repo: str, name: str, bundle_dir: str, token: str | None = None,
                   private: bool = True, metadata: dict | None = None, **upload_folder_kwargs):
    """Upload a bundle directory to the Hugging Face Hub (reference:
    scripts.py:1856). Requires egress (gated)."""
    if os.environ.get("MONAI_TPU_ALLOW_DOWNLOADS", "0") != "1":
        raise RuntimeError("push_to_hf_hub uploads to huggingface.co; set "
                           "MONAI_TPU_ALLOW_DOWNLOADS=1 in an egress-enabled environment.")
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    repo_url = api.create_repo(repo_id=repo, private=private, exist_ok=True)
    api.upload_folder(repo_id=repo, folder_path=str(Path(bundle_dir) / name),
                      **upload_folder_kwargs)
    return repo_url


def onnx_export(*args, **kwargs):
    """ONNX export is a torch-runtime exporter with no TPU/XLA analog; the
    portable export path here is StableHLO via ``ckpt_export`` (reference:
    scripts.py:1325 onnx_export)."""
    raise NotImplementedError(
        "onnx_export targets the torch ONNX exporter; use ckpt_export (StableHLO) instead.")


def trt_export(*args, **kwargs):
    """TensorRT export is CUDA-only; the portable export path here is StableHLO
    via ``ckpt_export`` (reference: scripts.py trt_export)."""
    raise NotImplementedError(
        "trt_export targets TensorRT (CUDA); use ckpt_export (StableHLO) instead.")
