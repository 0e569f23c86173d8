"""Dtype and array-kind conversion utilities.

Parity target: monai/utils/type_conversion.py (dtype_numpy_to_torch analogs become
numpy<->jax; convert_data_type:199, convert_to_dst_type:341, get_equivalent_dtype:84).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .backend import is_jax

__all__ = [
    "get_equivalent_dtype",
    "dtype_numpy_to_jax",
    "dtype_jax_to_numpy",
    "get_dtype",
    "convert_data_type",
    "convert_to_numpy",
    "convert_to_jax",
    "convert_to_dst_type",
]


def dtype_numpy_to_jax(dtype) -> jnp.dtype:
    return jnp.dtype(np.dtype(dtype))


def dtype_jax_to_numpy(dtype) -> np.dtype:
    return np.dtype(dtype)


def get_equivalent_dtype(dtype: Any, data_type: type):
    """Map a dtype to the equivalent in the target array-kind's namespace."""
    if dtype is None:
        return None
    if data_type is np.ndarray:
        return np.dtype(dtype)
    return jnp.dtype(dtype)


def get_dtype(data: Any):
    if hasattr(data, "dtype"):
        return data.dtype
    if isinstance(data, Sequence):
        return get_dtype(data[0])
    return type(data)


def convert_to_numpy(data: Any, dtype=None, wrap_sequence: bool = False) -> Any:
    """Recursively convert to numpy (reference: monai/utils/type_conversion.py:138)."""
    if is_jax(data):
        data = np.asarray(jax.device_get(data))
        if dtype is not None:
            data = data.astype(dtype, copy=False)
        return data
    if isinstance(data, np.ndarray):
        return data.astype(dtype, copy=False) if dtype is not None else data
    if isinstance(data, (float, int, bool, np.number)):
        return np.asarray(data, dtype=dtype)
    if isinstance(data, list):
        lst = [convert_to_numpy(i, dtype=dtype) for i in data]
        return np.asarray(lst) if wrap_sequence else lst
    if isinstance(data, tuple):
        tup = tuple(convert_to_numpy(i, dtype=dtype) for i in data)
        return np.asarray(tup) if wrap_sequence else tup
    if isinstance(data, dict):
        return {k: convert_to_numpy(v, dtype=dtype) for k, v in data.items()}
    return data


def convert_to_jax(data: Any, dtype=None, wrap_sequence: bool = False, device=None) -> Any:
    """Recursively convert to jax arrays (analog of convert_to_tensor,
    reference: monai/utils/type_conversion.py:104)."""
    if is_jax(data):
        out = data.astype(dtype) if dtype is not None and data.dtype != jnp.dtype(dtype) else data
    elif isinstance(data, (np.ndarray, float, int, bool, np.number)):
        out = jnp.asarray(data, dtype=dtype)
    elif isinstance(data, list):
        lst = [convert_to_jax(i, dtype=dtype) for i in data]
        return jnp.asarray(np.stack([np.asarray(x) for x in lst])) if wrap_sequence else lst
    elif isinstance(data, tuple):
        tup = tuple(convert_to_jax(i, dtype=dtype) for i in data)
        return jnp.asarray(np.stack([np.asarray(x) for x in tup])) if wrap_sequence else tup
    elif isinstance(data, dict):
        return {k: convert_to_jax(v, dtype=dtype) for k, v in data.items()}
    else:
        return data
    if device is not None:
        out = jax.device_put(out, device)
    return out


def convert_data_type(data: Any, output_type: type | None = None, device=None, dtype=None,
                      wrap_sequence: bool = False):
    """Convert ``data`` to the requested array kind; returns (converted, orig_type, orig_device)
    (reference: monai/utils/type_conversion.py:199)."""
    orig_type: type
    if is_jax(data):
        orig_type = jax.Array
    elif isinstance(data, np.ndarray):
        orig_type = np.ndarray
    else:
        orig_type = type(data)
    orig_device = None
    if is_jax(data):
        try:
            orig_device = next(iter(data.devices()))
        except Exception:
            orig_device = None

    output_type = output_type or orig_type
    if output_type is jax.Array or (isinstance(output_type, type) and issubclass(output_type, jax.Array)):
        out = convert_to_jax(data, dtype=dtype, wrap_sequence=wrap_sequence, device=device)
    elif output_type is np.ndarray:
        out = convert_to_numpy(data, dtype=dtype, wrap_sequence=wrap_sequence)
    else:
        out = data
    return out, orig_type, orig_device


def convert_to_dst_type(src: Any, dst: Any, dtype=None, wrap_sequence: bool = False, device=None):
    """Convert ``src`` to the same array kind as ``dst`` (reference: type_conversion.py:341).

    Returns (converted, orig_type, orig_device)."""
    if dtype is None and hasattr(dst, "dtype"):
        dtype = dst.dtype
    output_type: type = jax.Array if is_jax(dst) else np.ndarray if isinstance(dst, np.ndarray) else type(dst)
    return convert_data_type(src, output_type=output_type, dtype=dtype, wrap_sequence=wrap_sequence, device=device)


def convert_to_list(data) -> list:
    """ndarray/sequence -> plain list (reference: utils/type_conversion.py:396)."""
    return data.tolist() if hasattr(data, "tolist") else list(data)


# --------------------------------------------------------------------------
# dtype-name bridging helpers (reference: utils/type_conversion.py —
# dtype_torch_to_numpy:46, dtype_numpy_to_torch:51, get_dtype_string:77,
# get_numpy_dtype_from_string:67, get_torch_dtype_from_string:72,
# get_dtype_bound_value:~400, safe_dtype_range:~430, convert_to_cupy:~300).
# torch (CPU build) is present in this stack, so the torch bridges are genuine.
# --------------------------------------------------------------------------
def get_numpy_dtype_from_string(dtype: str) -> np.dtype:
    """numpy dtype from its string name, tolerating 'torch.'/'np.' prefixes."""
    return np.empty([], dtype=str(dtype).split(".")[-1]).dtype


def dtype_numpy_to_torch(dtype):
    """numpy dtype -> torch dtype."""
    import torch

    return torch.from_numpy(np.empty([], dtype=dtype)).dtype


def dtype_torch_to_numpy(dtype) -> np.dtype:
    """torch dtype -> numpy dtype."""
    import torch

    return torch.empty([], dtype=dtype).numpy().dtype


def get_torch_dtype_from_string(dtype: str):
    """torch dtype from a string name."""
    return dtype_numpy_to_torch(get_numpy_dtype_from_string(dtype))


def get_dtype_string(dtype) -> str:
    """String name of a dtype ('float32' for torch.float32 / np.float32 / jnp)."""
    s = str(dtype)
    if s.startswith("torch."):
        return s[6:]
    if s.startswith("<class 'numpy."):
        return s[14:-2]
    if s.startswith("<class 'jax.numpy."):
        return s[18:-2]
    return np.dtype(dtype).name if not isinstance(dtype, str) else s


def get_dtype_bound_value(dtype) -> tuple[float, float]:
    """(min, max) representable values of a dtype."""
    np_dtype = np.dtype(get_dtype_string(dtype) if not isinstance(dtype, str) else dtype)
    if np.issubdtype(np_dtype, np.floating):
        info = np.finfo(np_dtype)
    else:
        info = np.iinfo(np_dtype)
    return (info.min, info.max)


def safe_dtype_range(data, dtype=None):
    """Clip values that would overflow ``dtype`` before conversion, recursively
    over dict/list/tuple."""
    if isinstance(data, dict):
        return {k: safe_dtype_range(v, dtype) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(safe_dtype_range(v, dtype) for v in data)
    if isinstance(data, (int, float, bool)) or not hasattr(data, "dtype"):
        return data
    arr = np.asarray(data)
    output_dtype = dtype if dtype is not None else arr.dtype
    lo, hi = get_dtype_bound_value(output_dtype)
    if arr.size and (arr.max() > hi or arr.min() < lo):
        arr = np.clip(arr, lo, hi)
    from .backend import is_jax, to_jax

    return to_jax(arr) if is_jax(data) else arr


def convert_to_cupy(data, dtype=None, wrap_sequence: bool = False, safe: bool = False):
    """Convert to a cupy array (reference: type_conversion.py convert_to_cupy).
    cupy is CUDA-only and not installed on TPU hosts; raises ImportError with
    guidance unless the optional package is present."""
    from .module import optional_import

    cp, has_cp = optional_import("cupy")
    if not has_cp:
        raise ImportError("convert_to_cupy requires the optional 'cupy' package "
                          "(CUDA-only); use convert_to_jax for device arrays here.")
    if safe:
        data = safe_dtype_range(data, dtype)
    if isinstance(data, (np.ndarray, float, int, bool)) or hasattr(data, "__cuda_array_interface__"):
        return cp.asarray(data, dtype)
    if isinstance(data, list):
        if wrap_sequence:
            return cp.asarray(data, dtype)
        return [convert_to_cupy(i, dtype) for i in data]
    if isinstance(data, tuple):
        if wrap_sequence:
            return cp.asarray(data, dtype)
        return tuple(convert_to_cupy(i, dtype) for i in data)
    if isinstance(data, dict):
        return {k: convert_to_cupy(v, dtype) for k, v in data.items()}
    return cp.asarray(np.asarray(data), dtype)
