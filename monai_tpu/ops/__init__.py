from .gaussian import gaussian_1d, gaussian_filter, separable_filtering
from .resample import (
    affine_grid,
    affine_resample,
    grid_count,
    grid_pull,
    grid_push,
    resolve_mode,
)
