from .array import EquispacedKspaceMask, KspaceMask, RandomKspaceMask
from .dictionary import (
    EquispacedKspaceMaskd,
    ExtractDataKeyFromMetaKeyd,
    RandomKspaceMaskd,
    ReferenceBasedNormalizeIntensityd,
    ReferenceBasedSpatialCropd,
)
