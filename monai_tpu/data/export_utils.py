"""Save/load a network artifact with JSON metadata — the jax analog of the
reference's TorchScript-with-metadata helpers (reference:
monai/data/torchscript_utils.py save_net_with_metadata:28 / load_net_with_metadata).

The artifact is a zip containing msgpack'd/pickled parameters, a metadata JSON
(versions + user values), and any extra byte files.
"""
from __future__ import annotations

import datetime
import io
import json
import pickle
import zipfile

__all__ = ["save_net_with_metadata", "load_net_with_metadata"]

METADATA_FILENAME = "meta.json"
PARAMS_FILENAME = "params.pkl"


def _config_values() -> dict:
    import numpy

    try:
        import jax

        jv = jax.__version__
    except Exception:
        jv = "unknown"
    return {"jax": jv, "numpy": numpy.__version__}


def save_net_with_metadata(net_or_params, filename_prefix_or_stream,
                           include_config_vals: bool = True, append_timestamp: bool = False,
                           meta_values=None, more_extra_files=None) -> None:
    """Write `<prefix>.zip` with parameters + metadata JSON (reference:
    torchscript_utils.py:28). ``net_or_params`` may be an nnx.Module or a pytree."""
    try:
        from flax import nnx

        if isinstance(net_or_params, nnx.Module):
            state = nnx.state(net_or_params, nnx.Param)
            net_or_params = nnx.to_pure_dict(state) if hasattr(nnx, "to_pure_dict") \
                else state.to_pure_dict()
    except Exception:
        pass
    now = datetime.datetime.now()
    meta = dict(meta_values or {})
    if include_config_vals:
        meta.update(_config_values())
    meta["timestamp"] = now.astimezone().isoformat()

    if isinstance(filename_prefix_or_stream, str):
        filename = filename_prefix_or_stream
        if append_timestamp:
            filename += "_" + now.strftime("%Y%m%d%H%M%S")
        if not filename.endswith(".zip"):
            filename += ".zip"
        stream = open(filename, "wb")
        close = True
    else:
        stream, close = filename_prefix_or_stream, False
    try:
        with zipfile.ZipFile(stream, "w") as zf:
            zf.writestr(METADATA_FILENAME, json.dumps(meta, indent=2, default=str))
            zf.writestr(PARAMS_FILENAME, pickle.dumps(net_or_params))
            for name, data in (more_extra_files or {}).items():
                zf.writestr(name, data)
    finally:
        if close:
            stream.close()


def load_net_with_metadata(filename_prefix_or_stream, map_location=None,
                           more_extra_files=()):
    """Load (params, metadata dict, {extra name: bytes}) from the artifact
    (reference: torchscript_utils.py load_net_with_metadata)."""
    if isinstance(filename_prefix_or_stream, str):
        name = filename_prefix_or_stream
        if not name.endswith(".zip"):
            name += ".zip"
        fobj = open(name, "rb")
        close = True
    else:
        fobj, close = filename_prefix_or_stream, False
    try:
        with zipfile.ZipFile(io.BytesIO(fobj.read())) as zf:
            meta = json.loads(zf.read(METADATA_FILENAME).decode())
            params = pickle.loads(zf.read(PARAMS_FILENAME))
            extras = {n: zf.read(n) for n in more_extra_files if n in zf.namelist()}
    finally:
        if close:
            fobj.close()
    return params, meta, extras
