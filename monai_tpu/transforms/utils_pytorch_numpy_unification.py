"""Alias module mirroring the reference's
``monai/transforms/utils_pytorch_numpy_unification.py`` import path. The
implementations live in :mod:`monai_tpu.transforms.utils_backend_unification`
(numpy/jax dual-backend versions of the reference's numpy/torch pairs)."""
from __future__ import annotations

from .utils_backend_unification import *  # noqa: F401,F403
from .utils_backend_unification import __all__  # noqa: F401
