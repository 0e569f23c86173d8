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
