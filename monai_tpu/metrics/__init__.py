from .confusion_matrix import (
    ConfusionMatrixMetric,
    compute_confusion_matrix_metric,
    get_confusion_matrix,
)
from .meandice import (
    DiceHelper,
    DiceMetric,
    GeneralizedDiceScore,
    MeanIoU,
    compute_dice,
    compute_generalized_dice,
    compute_iou,
)
from .metric import Cumulative, CumulativeIterationMetric, IterationMetric, Metric
from .regression import (
    AveragePrecisionMetric,
    CumulativeAverage,
    FIDMetric,
    MAEMetric,
    MMDMetric,
    MSEMetric,
    PSNRMetric,
    RegressionMetric,
    RMSEMetric,
    ROCAUCMetric,
    SSIMMetric,
    compute_average_precision,
    compute_frechet_distance,
    compute_roc_auc,
)
from .surface_metrics import (
    HausdorffDistanceMetric,
    SurfaceDiceMetric,
    SurfaceDistanceMetric,
    compute_average_surface_distance,
    compute_hausdorff_distance,
    compute_surface_dice,
)
from .utils import (
    do_metric_reduction,
    get_mask_edges,
    get_surface_distance,
    ignore_background,
    is_binary_tensor,
    remap_instance_id,
)
from .extra_metrics import (
    FBetaScore,
    LabelQualityScore,
    LossMetric,
    PanopticQualityMetric,
    VarianceMetric,
    compute_panoptic_quality,
    compute_variance,
    label_quality_score,
)
from .metrics_reloaded import MetricsReloadedBinary, MetricsReloadedCategorical, MetricsReloadedWrapper
from .regression import KernelType, MultiScaleSSIMMetric

from .regression import compute_mmd, compute_ms_ssim, compute_ssim_and_cs

# FROC helpers live with the pathology app's implementation; the reference exports
# them from monai.metrics as well (reference: metrics/froc.py)
from ..apps.pathology.metrics import (
    compute_fp_tp_probs,
    compute_fp_tp_probs_nd,
    compute_froc_curve_data,
    compute_froc_score,
)
from .extra_metrics import compute_f_beta_score, get_f_beta_score
from .regression import compute_mean_error_metrics, get_fid_score
