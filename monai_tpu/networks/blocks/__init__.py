from .attention import (
    CrossAttentionBlock,
    MLPBlock,
    PatchEmbed,
    PatchEmbeddingBlock,
    SABlock,
    TransformerBlock,
)
from .crf import CRF
from .convolutions import Convolution, ResidualUnit, same_padding, stride_minus_kernel_padding
from .dynunet_block import (
    UnetBasicBlock,
    UnetOutBlock,
    UnetResBlock,
    UnetrBasicBlock,
    UnetrPrUpBlock,
    UnetrUpBlock,
    UnetUpBlock,
    get_conv_layer,
)
from .upsample import SubpixelUpsample, UpSample, interpolate
from .warp import DVF2DDF, Warp
from .squeeze_and_excitation import (
    ChannelSELayer,
    ResidualSELayer,
    SEBlock,
    SEBottleneck,
    SEResNetBottleneck,
    SEResNeXtBottleneck,
)
from .spade_norm import SPADE
from .cablock import CABlock, FeedForward
from .dints_block import (
    ActiConvNormBlock,
    FactorizedIncreaseBlock,
    FactorizedReduceBlock,
    P3DActiConvNormBlock,
)
from .aspp import SimpleASPP
from .denseblock import ConvDenseBlock, DenseBlock
from .feature_pyramid_network import BackboneWithFPN, FeaturePyramidNetwork, LastLevelMaxPool
from .text_embedding import TextEncoder
from .acti_norm import ADN
from .downsample import DownSample, Downsample, MaxAvgPool, SubpixelDownsample
from .encoder import BaseEncoder
from .feature_pyramid_network import ExtraFPNBlock, LastLevelP6P7
from .localnet_block import (
    LocalNetDownSampleBlock,
    LocalNetFeatureExtractorBlock,
    LocalNetResidualBlock,
    LocalNetUpSampleBlock,
    ResidualBlock,
)
from .regunet_block import (
    RegistrationDownSampleBlock,
    RegistrationExtractionBlock,
    RegistrationResidualConvBlock,
)
from .spatialattention import SpatialAttentionBlock
from .fcn import FCN, GCN, MCFCN, Refine
from .attention_utils import DecomposedRelativePosEmbedding, add_decomposed_rel_pos, get_rel_pos
from .dynunet_block import get_output_padding, get_padding
from .fft_utils_t import (
    fftn_centered,
    fftn_centered_t,
    fftshift,
    ifftn_centered,
    ifftn_centered_t,
    ifftshift,
    roll,
    roll_1d,
)
from .pos_embed_utils import build_sincos_position_embedding
from .segresnet_block import get_upsample_layer

# activation blocks live with the simple layers; re-exported here to mirror the
# reference's networks/blocks/activation.py public surface
from ..layers.simplelayers import GEGLU, MemoryEfficientSwish, Mish, Swish, SwishImplementation

# reference-name aliases
Upsample = UpSample
SubpixelUpSample = Subpixelupsample = SubpixelUpsample
SubpixelDownSample = Subpixeldownsample = SubpixelDownsample


def __getattr__(name):
    # blocks that structurally live inside their network's module; lazy to avoid
    # a blocks <-> nets import cycle
    _net_blocks = {
        "ResBlock": "segresnet",
        "MedNeXtBlock": "mednext", "MedNeXtDownBlock": "mednext",
        "MedNeXtUpBlock": "mednext", "MedNeXtOutBlock": "mednext",
    }
    mod = _net_blocks.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    val = getattr(importlib.import_module(f"..nets.{mod}", __name__), name)
    globals()[name] = val
    return val


def __dir__():
    return sorted(set(globals()) | {"ResBlock", "MedNeXtBlock", "MedNeXtDownBlock",
                                    "MedNeXtUpBlock", "MedNeXtOutBlock"})
