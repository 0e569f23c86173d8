from .checkpoint import CheckpointLoader, CheckpointSaver, load_checkpoint, save_checkpoint
from .handlers import (
    ClassificationSaver,
    EarlyStopHandler,
    GarbageCollector,
    LogfileHandler,
    LrScheduleHandler,
    MetricLogger,
    MetricsSaver,
    StatsHandler,
    ValidationHandler,
)
from .ignite_metric import (
    ConfusionMatrix,
    HausdorffDistance,
    IgniteMetricHandler,
    MeanAbsoluteError,
    MeanDice,
    MeanIoUHandler,
    MeanSquaredError,
    PeakSignalToNoiseRatio,
    ROCAUC,
    RootMeanSquaredError,
    SurfaceDistance,
    from_engine,
)
from .extra_handlers import (
    DecollateBatch,
    MLFlowHandler,
    ParamSchedulerHandler,
    PostProcessing,
    ProbMapProducer,
    SmartCacheHandler,
)
from .tensorboard_handlers import (
    TensorBoardHandler,
    TensorBoardImageHandler,
    TensorBoardStatsHandler,
)
from .handlers import (
    ClearMLHandler,
    ClearMLImageHandler,
    ClearMLStatsHandler,
    MarkHandler,
    MetricLoggerKeys,
    RangeHandler,
    RangePopHandler,
    RangePushHandler,
    TrtHandler,
)
from .ignite_metric import (
    AveragePrecision,
    MetricsReloadedBinaryHandler,
    MetricsReloadedCategoricalHandler,
    PanopticQuality,
)
from .utils import ignore_data, stopping_fn_from_loss, stopping_fn_from_metric, write_metrics_reports
