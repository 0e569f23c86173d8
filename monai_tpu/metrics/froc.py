"""FROC metric functions (reference: monai/metrics/froc.py). Implementations are
shared with the pathology app (apps/pathology/metrics.py)."""
from ..apps.pathology.metrics import (  # noqa: F401
    compute_fp_tp_probs,
    compute_fp_tp_probs_nd,
    compute_froc_curve_data,
    compute_froc_score,
)

__all__ = ["compute_fp_tp_probs", "compute_fp_tp_probs_nd", "compute_froc_curve_data",
           "compute_froc_score"]
