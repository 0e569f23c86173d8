from .array import ExtractHEStains, NormalizeHEStains
from .dictionary import (
    ExtractHEStainsd,
    ExtractHEStainsD,
    ExtractHEStainsDict,
    NormalizeHEStainsd,
    NormalizeHEStainsD,
    NormalizeHEStainsDict,
)
