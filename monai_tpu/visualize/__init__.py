from .class_activation_maps import CAM, GradCAM, GradCAMpp, default_normalizer
from .occlusion_sensitivity import OcclusionSensitivity
from .utils import blend_images, matshow3d
from .gradient_based import GuidedBackpropGrad, GuidedBackpropSmoothGrad, SmoothGrad, VanillaGrad
