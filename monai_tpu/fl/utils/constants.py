"""FL constants (reference: monai/fl/utils/constants.py)."""
from __future__ import annotations

from ...utils.enums import StrEnum


class WeightType(StrEnum):
    WEIGHTS = "fl_weights_full"
    WEIGHT_DIFF = "fl_weight_diff"


class ModelType(StrEnum):
    BEST_MODEL = "fl_best_model"
    FINAL_MODEL = "fl_final_model"


class ExtraItems(StrEnum):
    ABORT = "fl_abort"
    MODEL_NAME = "fl_model_name"
    CLIENT_NAME = "fl_client_name"
    APP_ROOT = "fl_app_root"
    MODEL_TYPE = "fl_model_type"
    LOGGING_FILE = "fl_logging_file"


class FlPhase(StrEnum):
    IDLE = "fl_idle"
    TRAIN = "fl_train"
    EVALUATE = "fl_evaluate"
    GET_WEIGHTS = "fl_get_weights"
    GET_DATA_STATS = "fl_get_data_stats"


class FlStatistics(StrEnum):
    DATA_STATS = "data_stats"
    DATA_COUNT = "data_count"
    FAIL_COUNT = "fail_count"
    TOTAL_DATA = "total_data"
    FEATURE_NAMES = "feature_names"


class RequiredBundleKeys(StrEnum):
    BUNDLE_ROOT = "bundle_root"


class BundleKeys(StrEnum):
    TRAINER = "train::trainer"
    EVALUATOR = "validate::evaluator"
    TRAIN_TRAINER_MAX_EPOCHS = "train::trainer::max_epochs"


class FiltersType(StrEnum):
    PRE_FILTERS = "pre_filters"
    POST_WEIGHT_FILTERS = "post_weight_filters"
    POST_EVALUATE_FILTERS = "post_evaluate_filters"
    POST_STATISTICS_FILTERS = "post_statistics_filters"
