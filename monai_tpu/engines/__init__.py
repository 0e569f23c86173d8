from .evaluator import EnsembleEvaluator, Evaluator, SupervisedEvaluator
from .events import EventEmitter, Events, IterationEvents
from .gan_trainer import AdversarialTrainer, GanTrainer
from .trainer import SupervisedTrainer, Trainer
from .utils import (
    DiffusionPrepareBatch,
    VPredictionPrepareBatch,
    PrepareBatch,
    PrepareBatchDefault,
    PrepareBatchExtraInput,
    default_make_latent,
    default_metric_cmp_fn,
    default_prepare_batch,
    engine_apply_transform,
    get_devices_spec,
)
from .workflow import State, Workflow
