from .diffusion_inferer import (
    ControlNetDiffusionInferer,
    ControlNetLatentDiffusionInferer,
    DiffusionInferer,
    LatentDiffusionInferer,
    VQVAETransformerInferer,
)
from .inferer import (
    Inferer,
    SaliencyInferer,
    SimpleInferer,
    SliceInferer,
    SlidingWindowInferer,
    SlidingWindowInfererAdapt,
)
from .merger import AvgMerger, Merger, ZarrAvgMerger
from .patch_inferer import PatchInferer
from .splitter import SlidingWindowSplitter, Splitter, WSISlidingWindowSplitter
from .utils import compute_scan_interval, sliding_window_inference
