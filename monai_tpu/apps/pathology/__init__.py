from .stain_transforms import ExtractHEStains, NormalizeHEStains
from .hovernet_utils import (
    GenerateWatershedMask,
    GenerateInstanceBorder,
    GenerateDistanceMap,
    GenerateWatershedMarkers,
    HoVerNetInstanceMapPostProcessing,
)
from .post_transforms import (
    Watershed,
    GenerateSuccinctContour,
    GenerateInstanceContour,
    GenerateInstanceCentroid,
    GenerateInstanceType,
    HoVerNetNuclearTypePostProcessing,
    Watershedd,
    GenerateSuccinctContourd,
    GenerateInstanceContourd,
    GenerateInstanceCentroidd,
    GenerateInstanceTyped,
    HoVerNetNuclearTypePostProcessingd,
    GenerateWatershedMaskd,
    GenerateInstanceBorderd,
    GenerateDistanceMapd,
    GenerateWatershedMarkersd,
    HoVerNetInstanceMapPostProcessingd,
    find_contours,
    watershed,
)
from .losses import HoVerNetLoss
from .engines import PrepareBatchHoVerNet
from .inferers import SlidingWindowHoVerNetInferer
from .utils import PathologyProbNMS, compute_isolated_tumor_cells, compute_multi_instance_mask
from .metrics import LesionFROC, compute_fp_tp_probs, compute_froc_curve_data, compute_froc_score
from .handlers_utils import from_engine_hovernet  # noqa: F401,E402
