"""Stain normalisation array transforms (reference:
monai/apps/pathology/transforms/stain/array.py); implementation in
apps/pathology/stain_transforms.py."""
from ...stain_transforms import ExtractHEStains, NormalizeHEStains

__all__ = ["ExtractHEStains", "NormalizeHEStains"]
