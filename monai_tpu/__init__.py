"""monai_tpu — a TPU-native medical imaging AI framework (JAX/XLA/Pallas).

Re-designed from scratch for TPU hardware with the capability surface of MONAI
(reference: Project-MONAI/MONAI).  Compute path is jax/XLA/pallas; data pipeline is
host-side numpy feeding sharded device arrays over a ``jax.sharding.Mesh``.
"""
from __future__ import annotations

import sys

__version__ = "0.1.0"

__all__ = [
    "apps",
    "auto3dseg",
    "bundle",
    "config",
    "data",
    "engines",
    "fl",
    "handlers",
    "inferers",
    "losses",
    "metrics",
    "networks",
    "ops",
    "optimizers",
    "parallel",
    "transforms",
    "utils",
    "visualize",
]

_SUBMODULES = set(__all__)


def __getattr__(name: str):
    """Lazy subpackage import — keeps `import monai_tpu` fast."""
    if name in _SUBMODULES:
        import importlib

        mod = importlib.import_module(f"{__name__}.{name}")
        setattr(sys.modules[__name__], name, mod)
        return mod
    if name == "print_config":
        from .config.deviceconfig import print_config

        return print_config
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | _SUBMODULES | {"print_config", "load_submodules"})


def load_submodules(basemod=None, load_all: bool = True, exclude_pattern: str = "(.*(__main__).*)"):
    """Eagerly import every subpackage (reference: monai/utils/module.py:load_submodules;
    here subpackages are lazy by default — call this for reference-style eager loading)."""
    import importlib

    mods = []
    for name in sorted(_SUBMODULES):
        mod = importlib.import_module(f"{__name__}.{name}")
        setattr(sys.modules[__name__], name, mod)
        mods.append(mod)
    return mods, []


class DeprecatedTypesWarningFilter(__import__("logging").Filter):
    """Logging filter dropping numpy/torch deprecated-type warnings emitted by
    third-party imports (reference: monai/__init__.py:31)."""

    _BODIES = ("np.bool8", "np.object0", "np.int0", "np.uint0", "np.void0", "np.str0",
               "np.bytes0", "@validator", "@root_validator", "class-based `config`",
               "pkg_resources", "Implicitly cleaning up")

    def filter(self, record):  # noqa: A003
        return not any(b in record.getMessage() for b in self._BODIES)


import warnings as _warnings_mod

_old_showwarning = _warnings_mod.showwarning


def custom_warning_handler(message, category, filename, lineno, file=None, line=None):
    """showwarning replacement that drops warnings from known-noisy third-party
    modules (reference: monai/__init__.py custom_warning_handler)."""
    ignore_files = ["ignite/handlers/checkpoint", "modelopt/torch/quantization/tensor_quant"]
    if any(ignore in str(filename) for ignore in ignore_files):
        return
    _old_showwarning(message, category, filename, lineno, file, line)
