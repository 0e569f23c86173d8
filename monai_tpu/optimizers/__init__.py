from .lr_scheduler import ExponentialLRSchedule, LinearLRSchedule, WarmupCosineSchedule
from .novograd import Novograd, novograd
from .utils import generate_param_groups
from .lr_finder import LearningRateFinder
