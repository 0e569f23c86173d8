from . import blocks, layers, nets, schedulers
from .utils import copy_model_state, count_params, meshgrid_ij, one_hot, pixelshuffle
