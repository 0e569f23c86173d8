from .coco import COCOMetric
from .matching import matching_batch
