from .dice import (
    Dice,
    DiceCELoss,
    DiceFocalLoss,
    DiceLoss,
    GeneralizedDiceFocalLoss,
    GeneralizedDiceLoss,
    GeneralizedWassersteinDiceLoss,
    MaskedDiceLoss,
    dice_ce,
    dice_focal,
)
from .focal_loss import FocalLoss, sigmoid_focal_loss, softmax_focal_loss
from .other import (
    AsymmetricFocalLoss,
    CrossEntropyLoss,
    AsymmetricFocalTverskyLoss,
    AsymmetricUnifiedFocalLoss,
    BarlowTwinsLoss,
    BendingEnergyLoss,
    ContrastiveLoss,
    DeepSupervisionLoss,
    DiffusionLoss,
    GlobalMutualInformationLoss,
    HausdorffDTLoss,
    LocalNormalizedCrossCorrelationLoss,
    LogHausdorffDTLoss,
    MaskedLoss,
    MultiScaleLoss,
    SoftclDiceLoss,
    SoftDiceclDiceLoss,
    SSIMLoss,
    TverskyLoss,
    soft_skel,
)
from .adversarial_loss import (
    AdversarialCriterions,
    BoxGIoULoss,
    JukeboxLoss,
    PatchAdversarialLoss,
    SURELoss,
    giou,
)
from .nacl_loss import NACLLoss
from .perceptual import PerceptualLoss

# reference lowercase aliases (reference: losses/dice.py:1066)
generalized_dice = GeneralizedDiceLoss
generalized_dice_focal = GeneralizedDiceFocalLoss
generalized_wasserstein_dice = GeneralizedWassersteinDiceLoss
from .adversarial_loss import complex_diff_abs_loss, sure_loss_function
from .other import soft_dice, soft_dilate, soft_erode, soft_open, spatial_gradient
