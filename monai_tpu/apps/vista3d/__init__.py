from .inferer import point_based_window_inferer
from .sampler import sample_prompt_pairs
from .transforms import Relabeld, VistaPostTransformd, VistaPreTransformd
