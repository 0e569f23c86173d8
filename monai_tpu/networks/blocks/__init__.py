from .convolutions import Convolution, ResidualUnit, same_padding, stride_minus_kernel_padding
from .upsample import SubpixelUpsample, UpSample, interpolate
