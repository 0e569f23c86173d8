"""Array post transforms (reference: monai/apps/pathology/transforms/post/array.py);
implementations in apps/pathology/post_transforms.py and hovernet_utils.py."""
from ...hovernet_utils import (
    GenerateDistanceMap,
    GenerateInstanceBorder,
    GenerateWatershedMarkers,
    GenerateWatershedMask,
    HoVerNetInstanceMapPostProcessing,
)
from ...post_transforms import (
    GenerateInstanceCentroid,
    GenerateInstanceContour,
    GenerateInstanceType,
    GenerateSuccinctContour,
    HoVerNetNuclearTypePostProcessing,
    Watershed,
)

__all__ = [
    "Watershed", "GenerateWatershedMask", "GenerateInstanceBorder", "GenerateDistanceMap",
    "GenerateWatershedMarkers", "GenerateSuccinctContour", "GenerateInstanceContour",
    "GenerateInstanceCentroid", "GenerateInstanceType",
    "HoVerNetInstanceMapPostProcessing", "HoVerNetNuclearTypePostProcessing",
]
