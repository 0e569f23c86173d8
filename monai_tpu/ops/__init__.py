from .gaussian import gaussian_1d, gaussian_filter, separable_filtering
from .resample import (
    affine_grid,
    affine_resample,
    grid_count,
    grid_pull,
    grid_push,
    resolve_mode,
)
from .filtering import bilateral_filter, bilateral_grid_filter, phl_filter
from .pallas_filtering import bilateral_filter_pallas, pallas_available
