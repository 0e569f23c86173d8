"""Dict post transforms (reference: monai/apps/pathology/transforms/post/dictionary.py)."""
from ...post_transforms import (
    GenerateDistanceMapd,
    GenerateInstanceBorderd,
    GenerateInstanceCentroidd,
    GenerateInstanceContourd,
    GenerateInstanceTyped,
    GenerateSuccinctContourd,
    GenerateWatershedMarkersd,
    GenerateWatershedMaskd,
    HoVerNetInstanceMapPostProcessingd,
    HoVerNetNuclearTypePostProcessingd,
    Watershedd,
)

__all__ = ["Watershedd", "GenerateSuccinctContourd", "GenerateInstanceContourd",
           "GenerateInstanceCentroidd", "GenerateInstanceTyped",
           "HoVerNetNuclearTypePostProcessingd", "GenerateWatershedMaskd",
           "GenerateInstanceBorderd", "GenerateDistanceMapd",
           "GenerateWatershedMarkersd", "HoVerNetInstanceMapPostProcessingd"]
# reference-style aliases
WatershedD = WatershedDict = Watershedd
GenerateSuccinctContourD = GenerateSuccinctContourDict = GenerateSuccinctContourd
GenerateInstanceContourD = GenerateInstanceContourDict = GenerateInstanceContourd
GenerateInstanceCentroidD = GenerateInstanceCentroidDict = GenerateInstanceCentroidd
GenerateInstanceTypeD = GenerateInstanceTypeDict = GenerateInstanceTyped
