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
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
