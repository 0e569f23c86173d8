"""Coil sensitivity estimation (reference:
monai/apps/reconstruction/networks/nets/coil_sensitivity_model.py:29)."""
from ..._networks_impl import CoilSensitivityModel

__all__ = ["CoilSensitivityModel"]
