from .complex_utils import (
    complex_abs,
    complex_conj,
    complex_mul,
    convert_to_tensor_complex,
)
from .mri_utils import root_sum_of_squares
from .networks import CoilSensitivityModel, ComplexUnet, VariationalNetworkModel
from .fastmri_reader import FastMRIReader
from .transforms import (
    EquispacedKspaceMask,
    EquispacedKspaceMaskd,
    ExtractDataKeyFromMetaKeyd,
    KspaceMask,
    RandomKspaceMask,
    RandomKspaceMaskd,
    ReferenceBasedNormalizeIntensityd,
    ReferenceBasedSpatialCropd,
)
