from .basic_unet import BasicUNet, BasicUnet, Basicunet
from .densenet import (
    DenseNet,
    DenseNet121,
    DenseNet169,
    DenseNet201,
    DenseNet264,
    densenet121,
    densenet169,
    densenet201,
    densenet264,
)
from .unet import UNet, Unet
