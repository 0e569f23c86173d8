"""Dict wrappers for stain normalisation (reference:
monai/apps/pathology/transforms/stain/dictionary.py)."""
from __future__ import annotations

from .....transforms.transform import MapTransform
from ...stain_transforms import ExtractHEStains, NormalizeHEStains

__all__ = ["ExtractHEStainsd", "ExtractHEStainsD", "ExtractHEStainsDict",
           "NormalizeHEStainsd", "NormalizeHEStainsD", "NormalizeHEStainsDict"]


class ExtractHEStainsd(MapTransform):
    """Dict wrapper of ExtractHEStains (reference: stain/dictionary.py)."""

    def __init__(self, keys, tli: float = 240, alpha: float = 1, beta: float = 0.15,
                 max_cref=(1.9705, 1.0308), allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.extractor = ExtractHEStains(tli=tli, alpha=alpha, beta=beta, max_cref=max_cref)

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.extractor(d[key])
        return d


class NormalizeHEStainsd(MapTransform):
    """Dict wrapper of NormalizeHEStains (reference: stain/dictionary.py)."""

    def __init__(self, keys, tli: float = 240, alpha: float = 1, beta: float = 0.15,
                 target_he=((0.5626, 0.2159), (0.7201, 0.8012), (0.4062, 0.5581)),
                 max_cref=(1.9705, 1.0308), allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.normalizer = NormalizeHEStains(tli=tli, alpha=alpha, beta=beta,
                                            target_he=target_he, max_cref=max_cref)

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.normalizer(d[key])
        return d


ExtractHEStainsD = ExtractHEStainsDict = ExtractHEStainsd
NormalizeHEStainsD = NormalizeHEStainsDict = NormalizeHEStainsd
