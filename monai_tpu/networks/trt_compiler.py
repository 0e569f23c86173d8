"""TensorRT compiler surface (reference: monai/networks/trt_compiler.py).

TensorRT is CUDA-only; on TPU the equivalent ahead-of-time path is the StableHLO
export in ``bundle/scripts.py`` (``ckpt_export``). These classes keep the
reference's public surface importable so code that feature-detects them degrades
gracefully: constructing an engine raises with a pointer to the TPU path.
``trt_compile`` (networks/utils.py) is the no-op entry point.
"""
from __future__ import annotations

__all__ = ["ShapeError", "TRTEngine", "TrtCompiler"]

_TPU_MSG = ("TensorRT is not available on TPU; use bundle ckpt_export (StableHLO "
            "ahead-of-time compilation) instead.")


class ShapeError(Exception):
    """Input shape incompatible with the compiled engine profile
    (reference: trt_compiler.py ShapeError)."""


class TRTEngine:
    def __init__(self, *args, **kwargs):
        raise RuntimeError(_TPU_MSG)


class TrtCompiler:
    def __init__(self, *args, **kwargs):
        raise RuntimeError(_TPU_MSG)
