from .stain_transforms import ExtractHEStains, NormalizeHEStains
from .hovernet_utils import (
    GenerateWatershedMask,
    GenerateInstanceBorder,
    GenerateDistanceMap,
    GenerateWatershedMarkers,
    HoVerNetInstanceMapPostProcessing,
)
from .metrics import LesionFROC, compute_fp_tp_probs, compute_froc_curve_data, compute_froc_score
