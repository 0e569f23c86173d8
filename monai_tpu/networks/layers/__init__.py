from .factories import (
    Act,
    Conv,
    ConvTrans,
    Dropout,
    LayerFactory,
    Norm,
    Pool,
    get_act_fn,
    get_act_layer,
    get_dropout_layer,
    get_norm_layer,
    get_pool_layer,
    split_args,
)
from .filtering import (
    BilateralFilter,
    PHLFilter,
    TrainableBilateralFilter,
    TrainableJointBilateralFilter,
)
from .gmm import GaussianMixtureModel
from .simplelayers import (
    LLTM,
    ChannelPad,
    Flatten,
    GaussianFilter,
    HilbertTransform,
    MeanFilter,
    MedianFilter,
    Reshape,
    SavitzkyGolayFilter,
    SkipConnection,
    apply_filter,
)
from .vector_quantizer import EMAQuantizer, VectorQuantizer
from .conjugate_gradient import ConjugateGradient
from .drop_path import DropPath
from .weight_init import icnr_init, normal_init, trunc_normal
from .simplelayers import (
    GEGLU,
    ApplyFilter,
    EllipticalFilter,
    LaplaceFilter,
    MemoryEfficientSwish,
    Mish,
    SharpenFilter,
    Swish,
)
from .spatial_transforms import AffineTransform, grid_count, grid_grad, grid_pull, grid_push, normalize_transform, to_norm_affine
from .convutils import calculate_out_shape, gaussian_1d, polyval
from .factories import Pad, RelPosEmbedding, get_pad_layer, get_rel_pos_embedding_layer
from .simplelayers import get_binary_kernel, median_filter
from .weight_init import trunc_normal_
