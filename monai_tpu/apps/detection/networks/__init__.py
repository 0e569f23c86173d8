from .retinanet import RetinaNet, RetinaNetClassificationHead, RetinaNetDetector, RetinaNetHead, RetinaNetRegressionHead
