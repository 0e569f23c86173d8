from .lr_scheduler import ExponentialLRSchedule, LinearLRSchedule, WarmupCosineSchedule
from .novograd import Novograd, novograd
from .utils import generate_param_groups
from .lr_finder import LearningRateFinder

# reference class names (reference: optimizers/lr_scheduler.py:41 LinearLR,
# :52 ExponentialLR) — here they are optax-style schedule factories
LinearLR = LinearLRSchedule
ExponentialLR = ExponentialLRSchedule
from .lr_finder import DataLoaderIter, TrainDataLoaderIter, ValDataLoaderIter
