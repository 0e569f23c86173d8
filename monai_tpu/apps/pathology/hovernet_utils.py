"""HoVerNet instance-map post-processing (reference: monai/apps/pathology/transforms/
post/array.py — watershed on hover-map gradients)."""
from __future__ import annotations

import numpy as np

from ...transforms.transform import Transform
from ...utils.backend import to_numpy

__all__ = ["GenerateWatershedMask", "GenerateInstanceBorder", "GenerateDistanceMap",
           "GenerateWatershedMarkers", "HoVerNetInstanceMapPostProcessing"]


class GenerateWatershedMask(Transform):
    """Foreground mask from nucleus-prediction logits (reference: post/array.py)."""

    def __init__(self, activation: str = "softmax", threshold: float | None = None,
                 min_object_size: int = 10):
        self.activation = activation
        self.threshold = threshold
        self.min_object_size = min_object_size

    def __call__(self, prob_map):
        from scipy import ndimage as ndi

        arr = to_numpy(prob_map.data if hasattr(prob_map, "data") and not isinstance(prob_map, np.ndarray)
                       else prob_map)
        if self.activation == "softmax" and arr.shape[0] > 1:
            e = np.exp(arr - arr.max(axis=0, keepdims=True))
            probs = e / e.sum(axis=0, keepdims=True)
            mask = np.argmax(probs, axis=0) > 0
        else:
            probs = 1 / (1 + np.exp(-arr[0]))
            mask = probs > (self.threshold or 0.5)
        # remove small objects + fill holes
        labeled, _ = ndi.label(mask)
        sizes = np.bincount(labeled.ravel())
        keep = np.where(sizes >= self.min_object_size)[0]
        keep = keep[keep != 0]
        mask = np.isin(labeled, keep)
        mask = ndi.binary_fill_holes(mask)
        return mask[None].astype(np.uint8)


class GenerateInstanceBorder(Transform):
    """Border map from hover-map gradients (reference: post/array.py)."""

    def __init__(self, kernel_size: int = 5):
        self.kernel_size = kernel_size

    def __call__(self, mask, hover_map):
        from scipy.ndimage import sobel

        mask_np = to_numpy(mask)[0].astype(bool)
        hv = to_numpy(hover_map.data if hasattr(hover_map, "data") and not isinstance(hover_map, np.ndarray)
                      else hover_map)
        h_map, v_map = hv[0], hv[1]

        def norm01(x):
            mn, mx = x.min(), x.max()
            return (x - mn) / max(mx - mn, 1e-8)

        h_norm = norm01(h_map)
        v_norm = norm01(v_map)
        sob_h = norm01(np.abs(sobel(h_norm, axis=1)))
        sob_v = norm01(np.abs(sobel(v_norm, axis=0)))
        border = np.maximum(sob_h, sob_v)
        border = border - (1 - mask_np)
        return np.clip(border, 0, 1)[None]


class GenerateDistanceMap(Transform):
    """Distance map = mask - border (reference: post/array.py)."""

    def __init__(self, smooth_fn=None):
        self.smooth_fn = smooth_fn

    def __call__(self, mask, instance_border):
        mask_np = to_numpy(mask)[0].astype(np.float32)
        border = to_numpy(instance_border)[0]
        dist = (1.0 - border) * mask_np
        if self.smooth_fn is not None:
            dist = np.asarray(self.smooth_fn(dist[None]))[0]
        return -dist[None]


class GenerateWatershedMarkers(Transform):
    """Markers = mask - thresholded border (reference: post/array.py)."""

    def __init__(self, threshold: float = 0.4, radius: int = 2, min_object_size: int = 10):
        self.threshold = threshold
        self.radius = radius
        self.min_object_size = min_object_size

    def __call__(self, mask, instance_border):
        from scipy import ndimage as ndi

        mask_np = to_numpy(mask)[0].astype(np.int32)
        border = to_numpy(instance_border)[0]
        marker = mask_np - (border >= self.threshold).astype(np.int32)
        marker = np.clip(marker, 0, 1).astype(bool)
        marker = ndi.binary_opening(marker, structure=np.ones((3, 3)))
        labeled, _ = ndi.label(marker)
        sizes = np.bincount(labeled.ravel())
        keep = np.where(sizes >= self.min_object_size)[0]
        keep = keep[keep != 0]
        out = np.where(np.isin(labeled, keep), labeled, 0)
        return out[None]


class HoVerNetInstanceMapPostProcessing(Transform):
    """Full HoVerNet instance segmentation postprocessing pipeline: watershed the
    hover-gradient distance map, then extract per-instance bounding box, contour,
    and centroid (reference: apps/pathology/transforms/post/array.py:655)."""

    def __init__(self, activation: str = "softmax", mask_threshold: float | None = None,
                 min_object_size: int = 10, sobel_kernel_size: int = 5,
                 distance_smooth_fn=None, marker_threshold: float = 0.4,
                 marker_radius: int = 2, marker_postprocess_fn=None,
                 watershed_connectivity: int | None = 1, min_num_points: int = 3,
                 contour_level: float | None = None):
        from .post_transforms import GenerateInstanceCentroid, GenerateInstanceContour, Watershed

        self.generate_mask = GenerateWatershedMask(activation, mask_threshold, min_object_size)
        self.generate_border = GenerateInstanceBorder(sobel_kernel_size)
        self.generate_dist = GenerateDistanceMap(smooth_fn=distance_smooth_fn)
        self.generate_markers = GenerateWatershedMarkers(marker_threshold, marker_radius,
                                                         min_object_size)
        self.marker_postprocess_fn = marker_postprocess_fn
        self.watershed = Watershed(connectivity=watershed_connectivity)
        self.generate_instance_contour = GenerateInstanceContour(min_num_points, contour_level)
        self.generate_instance_centroid = GenerateInstanceCentroid()

    def __call__(self, nuclear_prediction, hover_map):
        from ...transforms.croppad_array import BoundingRect
        from ...transforms.post_array import FillHoles

        mask = self.generate_mask(nuclear_prediction)
        border = self.generate_border(mask, hover_map)
        dist = self.generate_dist(mask, border)
        markers = self.generate_markers(mask, border)
        if self.marker_postprocess_fn is not None:
            markers = self.marker_postprocess_fn(markers)
        instance_map = self.watershed(dist, mask, markers)

        instance_info = {}
        for inst_id in sorted(set(np.unique(instance_map)) - {0}):
            inst_mask = instance_map == inst_id
            bbox = BoundingRect()(inst_mask)
            inst_mask = inst_mask[:, bbox[0][0]:bbox[0][1], bbox[0][2]:bbox[0][3]]
            offset = [bbox[0][2], bbox[0][0]]
            contour = self.generate_instance_contour(np.asarray(FillHoles()(inst_mask)), offset)
            if contour is not None:
                instance_info[int(inst_id)] = {
                    "bounding_box": bbox,
                    "centroid": self.generate_instance_centroid(inst_mask, offset),
                    "contour": contour,
                }
        return instance_info, instance_map
