"""Pathology lesion utilities (reference: monai/apps/pathology/utils.py).

scikit-image is unavailable in this environment; connected-component labeling uses
scipy.ndimage and the region major-axis length is derived from the eigenvalues of
the per-region central-moment covariance matrix (the same ellipse-of-equal-moments
definition skimage.regionprops uses)."""
from __future__ import annotations

import numpy as np

from ...transforms.post_array import ProbNMS

__all__ = ["compute_multi_instance_mask", "compute_isolated_tumor_cells", "PathologyProbNMS"]


def compute_multi_instance_mask(mask: np.ndarray, threshold: float):
    """Label tumor regions of a binary mask, merging regions closer than
    ``threshold`` pixels (reference: apps/pathology/utils.py:26)."""
    from scipy import ndimage as ndi

    neg = 255 - mask * 255
    distance = ndi.distance_transform_edt(neg)
    binary = distance < threshold
    filled = ndi.binary_fill_holes(binary)
    labeled, _ = ndi.label(filled, structure=np.ones((3,) * mask.ndim))
    return labeled


def _major_axis_length(coords: np.ndarray) -> float:
    """Major axis of the ellipse with the same normalized second central moments as
    the pixel region (skimage.regionprops.major_axis_length equivalent)."""
    c = coords - coords.mean(axis=0, keepdims=True)
    cov = c.T @ c / coords.shape[0]
    eigvals = np.linalg.eigvalsh(cov)
    return float(4.0 * np.sqrt(eigvals[-1]))


def compute_isolated_tumor_cells(tumor_mask: np.ndarray, threshold: float) -> list[int]:
    """Labels whose longest diameter is below ``threshold`` — Isolated Tumor Cells
    (reference: apps/pathology/utils.py:45)."""
    itc_list = []
    for label in range(1, int(np.amax(tumor_mask)) + 1):
        coords = np.argwhere(tumor_mask == label)
        if coords.size and _major_axis_length(coords.astype(np.float64)) < threshold:
            itc_list.append(label)
    return itc_list


class PathologyProbNMS(ProbNMS):
    """ProbNMS with WSI ``resolution_level`` rescaling of output coordinates
    (reference: apps/pathology/utils.py:60)."""

    def __call__(self, probs_map, resolution_level: int = 0):
        resolution = 2 ** resolution_level
        outputs = []
        for out in ProbNMS.__call__(self, probs_map):
            prob, coord = out[0], np.asarray(out[1:])
            coord_wsi = ((coord + 0.5) * resolution).astype(int)
            outputs.append([prob] + list(coord_wsi))
        return outputs
