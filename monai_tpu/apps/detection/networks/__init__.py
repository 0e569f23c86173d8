from .retinanet import RetinaNet, RetinaNetClassificationHead, RetinaNetDetector, RetinaNetHead, RetinaNetRegressionHead
from .retinanet import (  # noqa: F401,E402
    RetinaNetWithBackbone,
    resnet_fpn_feature_extractor,
    retinanet_resnet50_fpn_detector,
)
