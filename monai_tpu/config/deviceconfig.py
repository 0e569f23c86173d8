"""Runtime/device configuration report (reference: monai/config/deviceconfig.py:95 print_config)."""
from __future__ import annotations

import os
import platform
import sys
from collections import OrderedDict

import numpy as np

from ..utils.module import get_package_version, optional_import

# In the reference, USE_COMPILED gates the C++/CUDA extension (deviceconfig.py:32).
# Here it gates the Pallas fused kernels (vs pure-XLA fallbacks).
USE_COMPILED = os.environ.get("MONAI_TPU_USE_PALLAS", "1") not in ("0", "false", "False")


class IgniteInfo:
    """Kept for API familiarity; this framework does not depend on ignite."""

    OPT_IMPORT_VERSION = "0.4.11"


def get_config_values() -> OrderedDict:
    import monai_tpu

    output = OrderedDict()
    output["MONAI-TPU"] = monai_tpu.__version__
    output["Numpy"] = np.__version__
    output["JAX"] = get_package_version("jax")
    output["Python"] = sys.version.replace("\n", " ")
    output["OS"] = f"{platform.system()} ({platform.release()})"
    return output


def get_optional_config_values() -> OrderedDict:
    output = OrderedDict()
    for dep in ("flax", "optax", "orbax.checkpoint", "chex", "einops", "scipy", "PIL", "pandas", "yaml", "nibabel"):
        output[dep] = get_package_version(dep)
    return output


def print_config(file=sys.stdout) -> None:
    """Print framework config and dependency versions (reference: deviceconfig.py:95)."""
    for k, v in get_config_values().items():
        print(f"{k} version: {v}", file=file, flush=True)
    print(f"MONAI-TPU rev id: {get_package_version('monai_tpu')}", file=file)
    print("\nOptional dependencies:", file=file)
    for k, v in get_optional_config_values().items():
        print(f"{k} version: {v}", file=file, flush=True)
    print("\nFor details about installing the optional dependencies, please visit the docs.", file=file)


def get_system_info() -> OrderedDict:
    output: OrderedDict = OrderedDict()
    output["System"] = platform.system()
    output["Platform"] = platform.platform()
    output["Processor"] = platform.processor()
    output["Machine"] = platform.machine()
    output["Python version"] = platform.python_version()
    psutil, has_psutil = optional_import("psutil")
    if has_psutil:
        output["CPUs"] = psutil.cpu_count()
        mem = psutil.virtual_memory()
        output["Total physical memory (GB)"] = round(mem.total / 1024**3, 1)
    try:
        import jax

        output["JAX backend"] = jax.default_backend()
        output["JAX devices"] = [str(d) for d in jax.devices()]
        output["JAX process count"] = jax.process_count()
    except Exception as e:  # pragma: no cover
        output["JAX devices"] = f"unavailable ({e})"
    return output


def print_system_info(file=sys.stdout) -> None:
    for k, v in get_system_info().items():
        print(f"{k}: {v}", file=file, flush=True)


def print_debug_info(file=sys.stdout) -> None:
    print("================================", file=file)
    print("Printing MONAI-TPU config...", file=file)
    print("================================", file=file)
    print_config(file)
    print("\n================================", file=file)
    print("Printing system config...", file=file)
    print("================================", file=file)
    print_system_info(file)


def get_gpu_info() -> OrderedDict:
    """Accelerator info (reference: deviceconfig.py get_gpu_info). On this stack
    the accelerators are jax devices (TPU/CPU); the CUDA fields are reported for
    surface parity via torch (CPU build -> False/absent)."""
    output: OrderedDict = OrderedDict()
    try:
        import jax

        devs = jax.devices()
        output["Num devices"] = len(devs)
        output["Backend"] = jax.default_backend()
        for i, d in enumerate(devs):
            output[f"Device {i}"] = str(d)
    except Exception:
        output["Num devices"] = 0
    try:
        import torch

        output["Has CUDA"] = bool(torch.cuda.is_available())
        if output["Has CUDA"]:
            output["CUDA version"] = torch.version.cuda
    except Exception:
        pass
    return output


def print_gpu_info(file=sys.stdout) -> None:
    """Print accelerator info (reference: deviceconfig.py print_gpu_info)."""
    for k, v in get_gpu_info().items():
        print(f"{k}: {v}", file=file, flush=True)
