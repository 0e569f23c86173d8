from .coil_sensitivity_model import CoilSensitivityModel
from .complex_unet import ComplexUnet
from .varnet import VariationalNetworkModel
