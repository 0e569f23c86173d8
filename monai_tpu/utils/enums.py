"""Enumerations shared across the framework.

Mirrors the *behavioral surface* of the reference's ``monai/utils/enums.py`` (names kept
compatible so reference users can switch), but only the subset that makes sense for a
JAX/XLA/TPU design is present.  Reference: monai/utils/enums.py.
"""
from __future__ import annotations

from enum import Enum


class StrEnum(str, Enum):
    """Enum whose members are also strings (``str(Member) == value``)."""

    def __str__(self) -> str:
        return self.value

    def __repr__(self) -> str:
        return self.value


class GridSampleMode(StrEnum):
    """Interpolation modes for grid resampling (reference: monai/utils/enums.py:63)."""

    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


class InterpolateMode(StrEnum):
    """Modes for size-based interpolation (reference: monai/utils/enums.py:82)."""

    NEAREST = "nearest"
    NEAREST_EXACT = "nearest-exact"
    LINEAR = "linear"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    TRILINEAR = "trilinear"
    AREA = "area"


class GridSamplePadMode(StrEnum):
    """Padding modes for grid resampling (reference: monai/utils/enums.py:97)."""

    ZEROS = "zeros"
    BORDER = "border"
    REFLECTION = "reflection"


class NumpyPadMode(StrEnum):
    """np.pad modes (reference: monai/utils/enums.py:106)."""

    CONSTANT = "constant"
    EDGE = "edge"
    LINEAR_RAMP = "linear_ramp"
    MAXIMUM = "maximum"
    MEAN = "mean"
    MEDIAN = "median"
    MINIMUM = "minimum"
    REFLECT = "reflect"
    SYMMETRIC = "symmetric"
    WRAP = "wrap"
    EMPTY = "empty"


class PytorchPadMode(StrEnum):
    """Kept for API familiarity; mapped onto numpy modes internally."""

    CONSTANT = "constant"
    REFLECT = "reflect"
    REPLICATE = "replicate"
    CIRCULAR = "circular"


class Method(StrEnum):
    """Padding placement (reference: monai/utils/enums.py:141)."""

    SYMMETRIC = "symmetric"
    END = "end"


class TraceKeys(StrEnum):
    """Keys of the applied/pending operation records (reference: monai/utils/enums.py:324)."""

    CLASS_NAME = "class"
    ID = "id"
    ORIG_SIZE = "orig_size"
    EXTRA_INFO = "extra_info"
    DO_TRANSFORM = "do_transforms"
    KEY_SUFFIX = "_transforms"
    NONE = "none"
    TRACING = "tracing"
    STATUSES = "statuses"
    LAZY = "lazy"
    AFFINE = "affine"


class MetaKeys(StrEnum):
    """Typical keys of the MetaImage ``meta`` dict (reference: monai/utils/enums.py:540)."""

    AFFINE = "affine"
    ORIGINAL_AFFINE = "original_affine"
    SPATIAL_SHAPE = "spatial_shape"
    SPACE = "space"
    ORIGINAL_CHANNEL_DIM = "original_channel_dim"
    FILENAME_OR_OBJ = "filename_or_obj"
    SAVED_TO = "saved_to"


class SpaceKeys(StrEnum):
    """Coordinate-system conventions (reference: monai/utils/enums.py:556)."""

    RAS = "RAS"
    LPS = "LPS"


class PostFix(StrEnum):
    """Dictionary-key suffixes used by dict transforms."""

    META = "meta_dict"
    ORIG_META = "orig_meta_dict"
    TRANSFORMS = "transforms"

    @staticmethod
    def meta(key: str | None = None) -> str:
        return "meta_dict" if key is None else f"{key}_meta_dict"

    @staticmethod
    def transforms(key: str | None = None) -> str:
        return "transforms" if key is None else f"{key}_transforms"


class LazyAttr(StrEnum):
    """Keys of a pending operation dict (reference: monai/utils/enums.py:596)."""

    SHAPE = "lazy_shape"
    AFFINE = "lazy_affine"
    PADDING_MODE = "lazy_padding_mode"
    INTERP_MODE = "lazy_interpolation_mode"
    DTYPE = "lazy_dtype"
    ALIGN_CORNERS = "lazy_align_corners"
    RESAMPLE_MODE = "lazy_resample_mode"


class ChannelMatching(StrEnum):
    PAD = "pad"
    PROJECT = "project"


class SkipMode(StrEnum):
    CAT = "cat"
    ADD = "add"
    MUL = "mul"


class CommonKeys(StrEnum):
    """Engine batch/output keys (reference: monai/utils/enums.py:425)."""

    IMAGE = "image"
    LABEL = "label"
    PRED = "pred"
    LOSS = "loss"
    METADATA = "metadata"


class GanKeys(StrEnum):
    REALS = "reals"
    FAKES = "fakes"
    LATENTS = "latents"
    GLOSS = "g_loss"
    DLOSS = "d_loss"


class BlendMode(StrEnum):
    """Sliding-window blending (reference: monai/utils/enums.py:146)."""

    CONSTANT = "constant"
    GAUSSIAN = "gaussian"


class PatchKeys(StrEnum):
    LOCATION = "location"
    SIZE = "size"
    COUNT = "count"


class WSIPatchKeys(StrEnum):
    LOCATION = "location"
    LEVEL = "level"
    SIZE = "size"
    COUNT = "count"
    PATH = "path"


class Average(StrEnum):
    """ROC-AUC / confusion-matrix averaging (reference: monai/utils/enums.py:212)."""

    MACRO = "macro"
    WEIGHTED = "weighted"
    MICRO = "micro"
    NONE = "none"


class MetricReduction(StrEnum):
    """Metric reduction modes (reference: monai/utils/enums.py:239)."""

    NONE = "none"
    MEAN = "mean"
    SUM = "sum"
    MEAN_BATCH = "mean_batch"
    SUM_BATCH = "sum_batch"
    MEAN_CHANNEL = "mean_channel"
    SUM_CHANNEL = "sum_channel"


class LossReduction(StrEnum):
    """Loss reduction modes (reference: monai/utils/enums.py:252)."""

    NONE = "none"
    MEAN = "mean"
    SUM = "sum"


class DiceCEReduction(StrEnum):
    MEAN = "mean"
    SUM = "sum"


class Weight(StrEnum):
    """GeneralizedDiceLoss weighting (reference: monai/utils/enums.py:273)."""

    SQUARE = "square"
    SIMPLE = "simple"
    UNIFORM = "uniform"


class EngineStatsKeys(StrEnum):
    RANK = "rank"
    CURRENT_ITERATION = "current_iteration"
    CURRENT_EPOCH = "current_epoch"
    TOTAL_EPOCHS = "total_epochs"
    TOTAL_ITERATIONS = "total_iterations"
    BEST_VALIDATION_EPOCH = "best_validation_epoch"
    BEST_VALIDATION_METRIC = "best_validation_metric"


class ColorOrder(StrEnum):
    RGB = "RGB"
    BGR = "BGR"


class DiceMetricMode(StrEnum):
    STANDARD = "standard"
    GLOBAL = "global"


class TransformBackends(StrEnum):
    """Which array namespaces a transform supports.

    The reference distinguishes TORCH/NUMPY/CUPY (monai/utils/enums.py:293); here the two
    backends are NUMPY (host pipeline) and JAX (device / jit-compatible).
    """

    NUMPY = "numpy"
    JAX = "jax"


class BoxModeName(StrEnum):
    """Box parametrization names (reference: monai/utils/enums.py:367)."""

    XYXY = "xyxy"
    XYZXYZ = "xyzxyz"
    XXYY = "xxyy"
    XXYYZZ = "xxyyzz"
    XYXYZZ = "xyxyzz"
    XYWH = "xywh"
    XYZWHD = "xyzwhd"
    CCWH = "ccwh"
    CCCWHD = "cccwhd"


class CompInitMode(StrEnum):
    """Component instantiation modes for the bundle system (reference: monai/utils/enums.py:410)."""

    DEFAULT = "default"
    CALLABLE = "callable"
    DEBUG = "debug"
    PARTIAL = "partial"


class AlgoKeys(StrEnum):
    ID = "identifier"
    ALGO = "algo_instance"
    IS_TRAINED = "is_trained"
    SCORE = "best_metric"


class AdversarialKeys(StrEnum):
    REALS = "reals"
    FAKES = "fakes"
    REAL_LOGITS = "real_logits"
    FAKE_LOGITS = "fake_logits"
    RECONSTRUCTION_LOSS = "reconstruction_loss"
    GENERATOR_LOSS = "generator_loss"
    DISCRIMINATOR_LOSS = "discriminator_loss"


class OrderingType(StrEnum):
    RASTER_SCAN = "raster_scan"
    S_CURVE = "s_curve"
    RANDOM = "random"


class OrderingTransformations(StrEnum):
    ROTATE_90 = "rotate_90"
    TRANSPOSE = "transpose"
    REFLECT = "reflect"


class DataStatsKeys(StrEnum):
    """Keys for dataset statistical analysis (reference: utils/enums.py:577)."""

    SUMMARY = "stats_summary"
    BY_CASE = "stats_by_cases"
    BY_CASE_IMAGE_PATH = "image_filepath"
    BY_CASE_LABEL_PATH = "label_filepath"
    IMAGE_STATS = "image_stats"
    FG_IMAGE_STATS = "image_foreground_stats"
    LABEL_STATS = "label_stats"
    IMAGE_HISTOGRAM = "image_histogram"


class ImageStatsKeys(StrEnum):
    """(reference: utils/enums.py:593)."""

    SHAPE = "shape"
    CHANNELS = "channels"
    CROPPED_SHAPE = "cropped_shape"
    SPACING = "spacing"
    SIZEMM = "sizemm"
    INTENSITY = "intensity"
    HISTOGRAM = "histogram"


class LabelStatsKeys(StrEnum):
    """(reference: utils/enums.py:608)."""

    LABEL_UID = "labels"
    PIXEL_PCT = "foreground_percentage"
    IMAGE_INTST = "image_intensity"
    LABEL = "label"
    LABEL_SHAPE = "shape"
    LABEL_NCOMP = "ncomponents"


class UpsampleMode(StrEnum):
    """(reference: utils/enums.py UpsampleMode)."""

    DECONV = "deconv"
    DECONVGROUP = "deconvgroup"
    NONTRAINABLE = "nontrainable"
    PIXELSHUFFLE = "pixelshuffle"


class DownsampleMode(StrEnum):
    """(reference: utils/enums.py DownsampleMode)."""

    CONV = "conv"
    CONVGROUP = "convgroup"
    NONTRAINABLE = "nontrainable"
    PIXELUNSHUFFLE = "pixelunshuffle"
    MAXPOOL = "maxpool"
    AVGPOOL = "avgpool"


class SplineMode(StrEnum):
    """Spline interpolation orders (reference: utils/enums.py SplineMode)."""

    ZERO = 0
    ONE = 1
    TWO = 2
    THREE = 3
    FOUR = 4
    FIVE = 5


class NdimageMode(StrEnum):
    """scipy.ndimage boundary modes (reference: utils/enums.py NdimageMode)."""

    REFLECT = "reflect"
    GRID_MIRROR = "grid-mirror"
    CONSTANT = "constant"
    GRID_CONSTANT = "grid-constant"
    NEAREST = "nearest"
    MIRROR = "mirror"
    GRID_WRAP = "grid-wrap"
    WRAP = "wrap"


class ForwardMode(StrEnum):
    """(reference: utils/enums.py ForwardMode)."""

    TRAIN = "train"
    EVAL = "eval"


class GridPatchSort(StrEnum):
    """(reference: utils/enums.py GridPatchSort)."""

    RANDOM = "random"
    MIN = "min"
    MAX = "max"


class ProbMapKeys(StrEnum):
    """(reference: utils/enums.py ProbMapKeys)."""

    LOCATION = "mask_location"
    SIZE = "mask_size"
    COUNT = "num_patches"
    NAME = "name"


class FastMRIKeys(StrEnum):
    """(reference: utils/enums.py FastMRIKeys)."""

    KSPACE = "kspace"
    MASK = "mask"
    FILENAME = "filename"
    RECON = "reconstruction_rss"
    ACQUISITION = "acquisition"
    MAX = "max"
    NORM = "norm"
    PID = "patient_id"


class BundleProperty(StrEnum):
    """(reference: utils/enums.py BundleProperty)."""

    DESC = "description"
    REQUIRED = "required"


class BundlePropertyConfig(StrEnum):
    """(reference: utils/enums.py BundlePropertyConfig)."""

    ID = "id"
    REF_ID = "refer_id"


class StatusMembers(StrEnum):
    """(reference: utils/enums.py StatusMembers)."""

    STATUS = "status"
    EPOCHS = "epochs"
    ITERS = "iters"
    LOSS = "loss"


class TraceStatusKeys(StrEnum):
    """(reference: utils/enums.py TraceStatusKeys)."""

    PENDING_DURING_APPLY = "pending_during_apply"


class AdversarialIterationEvents(StrEnum):
    """Event names fired inside adversarial training iterations
    (reference: utils/enums.py AdversarialIterationEvents)."""

    RECONSTRUCTION_LOSS_COMPLETED = "reconstruction_loss_completed"
    GENERATOR_FORWARD_COMPLETED = "generator_forward_completed"
    GENERATOR_DISCRIMINATOR_FORWARD_COMPLETED = "generator_discriminator_forward_completed"
    GENERATOR_LOSS_COMPLETED = "generator_loss_completed"
    GENERATOR_BACKWARD_COMPLETED = "generator_backward_completed"
    GENERATOR_MODEL_COMPLETED = "generator_model_completed"
    DISCRIMINATOR_REALS_FORWARD_COMPLETED = "discriminator_reals_forward_completed"
    DISCRIMINATOR_FAKES_FORWARD_COMPLETED = "discriminator_fakes_forward_completed"
    DISCRIMINATOR_LOSS_COMPLETED = "discriminator_loss_completed"
    DISCRIMINATOR_BACKWARD_COMPLETED = "discriminator_backward_completed"
    DISCRIMINATOR_MODEL_COMPLETED = "discriminator_model_completed"


class HoVerNetMode(StrEnum):
    """HoVerNet implementation variants (reference: utils/enums.py:622)."""

    FAST = "FAST"
    ORIGINAL = "ORIGINAL"


class HoVerNetBranch(StrEnum):
    """HoVerNet output branches (reference: utils/enums.py:633)."""

    HV = "horizontal_vertical"
    NP = "nucleus_prediction"
    NC = "type_prediction"


class JITMetadataKeys(StrEnum):
    """Metadata keys for exported (AOT/StableHLO) model artifacts
    (reference: utils/enums.py:422, there for TorchScript)."""

    NAME = "name"
    TIMESTAMP = "timestamp"
    VERSION = "version"
    DESCRIPTION = "description"
