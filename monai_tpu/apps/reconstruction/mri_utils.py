"""MRI helpers (reference: monai/apps/reconstruction/mri_utils.py)."""
from __future__ import annotations

from typing import Any

from ...utils.backend import xp

__all__ = ["root_sum_of_squares", "root_sum_of_squares_t"]


def root_sum_of_squares(x: Any, spatial_dim: int) -> Any:
    """RSS coil combination (reference: mri_utils.py root_sum_of_squares)."""
    ns = xp(x)
    return ns.sqrt((x**2).sum(axis=spatial_dim) + 1e-12)


root_sum_of_squares_t = root_sum_of_squares
