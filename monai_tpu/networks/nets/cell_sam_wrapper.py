"""Cell-SAM wrapper (reference: monai/networks/nets/cell_sam_wrapper.py CellSamWrapper).

The reference wraps Meta's segment-anything ViT-B with pretrained SAM weights
(downloaded from a URL). Neither the `segment_anything` package nor network access is
available in this environment; construction raises a clear ImportError.
"""
from __future__ import annotations

from ...utils.module import optional_import

__all__ = ["CellSamWrapper"]


class CellSamWrapper:
    """(reference: cell_sam_wrapper.py CellSamWrapper)."""

    def __init__(self, auto_resize_inputs: bool = True, network_resize_roi=(1024, 1024),
                 checkpoint: str = "sam_vit_b_01ec64.pth", *args, **kwargs):
        _, has = optional_import("segment_anything")
        if not has:
            raise ImportError(
                "CellSamWrapper requires the optional 'segment_anything' package and its "
                "pretrained SAM checkpoint, neither of which is available in this "
                "environment (zero egress).")
