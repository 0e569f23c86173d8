from .ahnet import AHNet, AHnet, Ahnet
from .attentionunet import AttentionUnet
from .cell_sam_wrapper import CellSamWrapper
from .fullyconnectednet import FullyConnectedNet, VarFullyConnectedNet
from .autoencoderkl import AutoencoderKL
from .controlnet import ControlNet
from .diffusion_model_unet import DiffusionModelEncoder, DiffusionModelUNet
from .spade_autoencoderkl import SPADEAutoencoderKL
from .spade_diffusion_model_unet import SPADEDiffusionModelUNet
from .spade_network import SPADEDecoder, SPADEEncoder, SPADENet, SPADENetResBlock
from .patchgan_discriminator import MultiScalePatchDiscriminator, PatchDiscriminator
from .transformer import DecoderOnlyTransformer
from .vqvae import VQVAE
from .autoencoder import AutoEncoder, VarAutoEncoder
from .basic_unet import BasicUNet, BasicUnet, Basicunet
from .basic_unetplusplus import BasicUNetPlusPlus, BasicUnetPlusPlus

BasicunetPlusPlus = basicunetplusplus = BasicUNetPlusPlus
from .highresnet import HighResBlock, HighResNet
from .regunet import GlobalNet, LocalNet, RegUNet
from .segresnet_ds import SegResNetDS, SegResNetDS2
from .vista3d import VISTA3D, vista3d132
from .classifier import Classifier, Critic, Discriminator, Generator, Regressor
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
from .dynunet import DynUNet

DynUnet = Dynunet = dynunet = DynUNet
Densenet = DenseNet
Densenet121 = densenet121
Densenet169 = densenet169
Densenet201 = densenet201
Densenet264 = densenet264

from .resnet import (
    ResNet,
    ResNetBlock,
    ResNetBottleneck,
    ResNetEncoder,
    ResNetFeatures,
    resnet10,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnet200,
)
from .efficientnet import (
    BlockArgs,
    EfficientNet,
    EfficientNetBN,
    EfficientNetBNFeatures,
    EfficientNetEncoder,
    drop_connect,
    get_efficientnet_image_size,
)
from .flexible_unet import FLEXUNET_BACKBONE, FlexibleUNet, FlexUNet, FlexUNetEncoderRegister
from .hovernet import HoVerNet

HoVernet = HoverNet = Hovernet = HoVerNet
from .masked_autoencoder_vit import MaskedAutoEncoderViT
from .mednext import (
    MedNext,
    MedNeXt,
    MedNextB,
    MedNeXtB,
    MedNextBase,
    MedNeXtBase,
    MedNextL,
    MedNeXtL,
    MedNextLarge,
    MedNeXtLarge,
    MedNextM,
    MedNeXtM,
    MedNextMedium,
    MedNeXtMedium,
    MedNextS,
    MedNeXtS,
    MedNextSmall,
    MedNeXtSmall,
    create_mednext,
)
from .milmodel import MILModel
from .netadapter import NetAdapter, TorchVisionFCModel
from .quicknat import Quicknat, QuickNAT
from .daf3d import DAF3D
from .dints import DiNTS, TopologyConstruction, TopologyInstance, TopologySearch
from .restormer import Restormer
from .transchex import (
    BertAttention,
    BertMixedLayer,
    BertOutput,
    BertPreTrainedModel,
    MultiModal,
    Pooler,
    Transchex,
)
from .senet import (
    SENet,
    SENet154,
    SEResNet50,
    SEResNet101,
    SEResNet152,
    SEResNext50,
    SEResNext101,
)

SEnet = Senet = senet = SENet
SEnet154 = Senet154 = senet154 = SENet154
SEresnet50 = Seresnet50 = seresnet50 = SEResNet50
SEresnet101 = Seresnet101 = seresnet101 = SEResNet101
SEresnet152 = Seresnet152 = seresnet152 = SEResNet152
SEResNeXt50 = SEresnext50 = Seresnext50 = seresnext50 = SEResNext50
SEResNeXt101 = SEresnext101 = Seresnext101 = seresnext101 = SEResNext101
from .segresnet import SegResNet, SegResNetVAE
from .swin_unetr import MERGING_MODE, PatchMerging, PatchMergingV2, SwinTransformer, SwinUNETR
from .unet import UNet, Unet
from .unetr import UNETR
from .vit import ViT, ViTAutoEnc
from .vnet import VNet
from .voxelmorph import VoxelMorph, VoxelMorphUNet
