from .networks.retinanet import RetinaNet, RetinaNetDetector, RetinaNetHead
from .utils.anchor_utils import AnchorGenerator, AnchorGeneratorWithAnchorShape
from .utils.box_coder import BoxCoder
from .utils.matchers import ATSSMatcher, Matcher
from .utils.sampler import HardNegativeSampler
from .metrics import COCOMetric, matching_batch
from .utils.box_selector import BoxSelector
from .networks.retinanet import RetinaNetClassificationHead, RetinaNetRegressionHead
from .utils.sampler import HardNegativeSamplerBase
