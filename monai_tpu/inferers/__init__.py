from .diffusion_inferer import (
    ControlNetDiffusionInferer,
    DiffusionInferer,
    LatentDiffusionInferer,
)
from .inferer import (
    Inferer,
    SimpleInferer,
    SliceInferer,
    SlidingWindowInferer,
    SlidingWindowInfererAdapt,
)
from .merger import AvgMerger, Merger
from .patch_inferer import PatchInferer
from .splitter import SlidingWindowSplitter, Splitter
from .utils import compute_scan_interval, sliding_window_inference
