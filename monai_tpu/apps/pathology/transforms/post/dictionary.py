"""Dict post transforms (reference: monai/apps/pathology/transforms/post/dictionary.py)."""
from ...post_transforms import (
    GenerateInstanceCentroidd,
    GenerateInstanceContourd,
    GenerateInstanceTyped,
    GenerateSuccinctContourd,
    HoVerNetNuclearTypePostProcessingd,
    Watershedd,
)

__all__ = ["Watershedd", "GenerateSuccinctContourd", "GenerateInstanceContourd",
           "GenerateInstanceCentroidd", "GenerateInstanceTyped",
           "HoVerNetNuclearTypePostProcessingd"]
# reference-style aliases
WatershedD = WatershedDict = Watershedd
GenerateSuccinctContourD = GenerateSuccinctContourDict = GenerateSuccinctContourd
GenerateInstanceContourD = GenerateInstanceContourDict = GenerateInstanceContourd
GenerateInstanceCentroidD = GenerateInstanceCentroidDict = GenerateInstanceCentroidd
GenerateInstanceTypeD = GenerateInstanceTypeDict = GenerateInstanceTyped
