"""Detection box transforms, array API
(reference: monai/apps/detection/transforms/array.py:66-546)."""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ....data.box_utils import (
    clip_boxes_to_image,
    convert_box_mode,
    convert_box_to_standard_mode,
    standardize_empty_box,
)
from ....transforms.transform import Transform
from ....utils.backend import to_numpy
from ....utils.misc import ensure_tuple, ensure_tuple_rep
from .box_ops import (
    apply_affine_to_boxes,
    convert_box_to_mask,
    convert_mask_to_box,
    flip_boxes,
    resize_boxes,
    rot90_boxes,
    zoom_boxes,
)
from ....data.box_utils import spatial_crop_boxes

__all__ = ["StandardizeEmptyBox", "ConvertBoxMode", "ConvertBoxToStandardMode",
           "AffineBox", "ZoomBox", "ResizeBox", "FlipBox", "ClipBoxToImage",
           "BoxToMask", "MaskToBox", "SpatialCropBox", "RotateBox90"]


class StandardizeEmptyBox(Transform):
    """Give empty box arrays the (0, 2*sd) shape (reference: detection array.py:66)."""

    def __init__(self, spatial_dims: int):
        self.spatial_dims = spatial_dims

    def __call__(self, boxes):
        return standardize_empty_box(boxes, self.spatial_dims)


class ConvertBoxMode(Transform):
    """Convert between box conventions (reference: detection array.py:87)."""

    def __init__(self, src_mode=None, dst_mode=None):
        self.src_mode = src_mode
        self.dst_mode = dst_mode

    def __call__(self, boxes):
        return convert_box_mode(boxes, src_mode=self.src_mode, dst_mode=self.dst_mode)


class ConvertBoxToStandardMode(Transform):
    """(reference: detection array.py:156)."""

    def __init__(self, mode=None):
        self.mode = mode

    def __call__(self, boxes):
        return convert_box_to_standard_mode(boxes, mode=self.mode)


class AffineBox(Transform):
    """(reference: detection array.py:195)."""

    def __call__(self, boxes, affine=None):
        if affine is None:
            return boxes
        return apply_affine_to_boxes(boxes, affine)


class ZoomBox(Transform):
    """Zoom boxes consistently with a Zoom() of the image; with ``keep_size`` the
    pad/slice offset the image zoom applies is added to the box coordinates
    (reference: detection array.py:214)."""

    def __init__(self, zoom, keep_size: bool = False, **kwargs):
        self.zoom = zoom
        self.keep_size = keep_size

    def __call__(self, boxes, src_spatial_size=None):
        from ....data.box_utils import get_spatial_dims

        sd = get_spatial_dims(boxes=boxes)
        self._zoom = ensure_tuple_rep(self.zoom, sd)
        if not self.keep_size:
            return zoom_boxes(boxes, self._zoom)
        if src_spatial_size is None:
            raise ValueError("keep_size=True, src_spatial_size must be provided.")
        src = ensure_tuple_rep(src_spatial_size, sd)
        dst = [int(round(z * ss)) for z, ss in zip(self._zoom, src)]
        self._zoom = tuple(ds / float(ss) for ss, ds in zip(src, dst))
        zoomed = np.array(to_numpy(zoom_boxes(boxes, self._zoom)))
        # mirror Zoom(keep_size=True): symmetric pad (diff>0) or centre slice (diff<0)
        for axis, (od, zd) in enumerate(zip(src, dst)):
            diff = od - zd
            half = abs(diff) // 2
            if diff > 0:
                zoomed[:, axis] += half
                zoomed[:, axis + sd] += half
            elif diff < 0:
                zoomed[:, axis] -= half
                zoomed[:, axis + sd] -= half
        return zoomed


class ResizeBox(Transform):
    """(reference: detection array.py:268)."""

    def __init__(self, spatial_size, size_mode: str = "all", **kwargs):
        self.spatial_size = spatial_size
        self.size_mode = size_mode

    def __call__(self, boxes, src_spatial_size):
        boxes_np = np.asarray(to_numpy(boxes))
        sd = boxes_np.shape[-1] // 2
        src = ensure_tuple_rep(src_spatial_size, sd)
        if self.size_mode == "longest":
            scale = max(ensure_tuple(self.spatial_size)) / max(src)
            dst = tuple(int(round(s * scale)) for s in src)
        else:
            dst = ensure_tuple_rep(self.spatial_size, sd)
        return resize_boxes(boxes_np, src, dst)


class FlipBox(Transform):
    """(reference: detection array.py:323)."""

    def __init__(self, spatial_axis=None):
        self.spatial_axis = spatial_axis

    def __call__(self, boxes, spatial_size):
        return flip_boxes(boxes, spatial_size, self.spatial_axis)


class ClipBoxToImage(Transform):
    """Clip boxes and filter matching labels (reference: detection array.py:351)."""

    def __init__(self, remove_empty: bool = False):
        self.remove_empty = remove_empty

    def __call__(self, boxes, labels, spatial_size):
        from .box_ops import select_labels

        boxes_clip, keep = clip_boxes_to_image(boxes, spatial_size, self.remove_empty)
        return boxes_clip, select_labels(labels, keep)


class BoxToMask(Transform):
    """(reference: detection array.py:400)."""

    def __init__(self, bg_label: int = -1, ellipse_mask: bool = False):
        self.bg_label = bg_label
        self.ellipse_mask = ellipse_mask

    def __call__(self, boxes, labels, spatial_size):
        return convert_box_to_mask(boxes, labels, spatial_size, self.bg_label,
                                   self.ellipse_mask)


class MaskToBox(Transform):
    """(reference: detection array.py:437)."""

    def __init__(self, bg_label: int = -1, box_dtype=np.float32, label_dtype=np.int64):
        self.bg_label = bg_label
        self.box_dtype = box_dtype
        self.label_dtype = label_dtype

    def __call__(self, boxes_mask):
        return convert_mask_to_box(boxes_mask, self.bg_label, self.box_dtype,
                                   self.label_dtype)


class SpatialCropBox(Transform):
    """Crop boxes consistently with a SpatialCrop of the image; returns (cropped
    boxes, labels filtered by the kept-box mask) (reference: detection
    transforms/array.py:475 SpatialCropBox)."""

    def __init__(self, roi_center=None, roi_size=None, roi_start=None, roi_end=None,
                 roi_slices=None):
        from ....transforms.croppad_array import SpatialCrop

        self._cropper = SpatialCrop(roi_center=roi_center, roi_size=roi_size,
                                    roi_start=roi_start, roi_end=roi_end,
                                    roi_slices=roi_slices)
        for s in self._cropper.slices:
            if s.start < 0 or s.stop < 0 or (s.step is not None and s.step < 0):
                raise ValueError("negative indexing is not supported for SpatialCropBox.")

    @property
    def slices(self):
        return self._cropper.slices

    def __call__(self, boxes, labels):
        from ....data.box_utils import get_spatial_dims
        from .box_ops import select_labels

        sd = min(len(self.slices), get_spatial_dims(boxes=boxes))
        boxes_crop, keep = spatial_crop_boxes(
            boxes, [self.slices[a].start for a in range(sd)],
            [self.slices[a].stop for a in range(sd)])
        return boxes_crop, select_labels(labels, keep)


class RotateBox90(Transform):
    """Rotate boxes by 90 degrees k times in the plane given by two spatial axes
    (reference: detection transforms/array.py:546 RotateBox90)."""

    def __init__(self, k: int = 1, spatial_axes=(0, 1)):
        if len(spatial_axes) != 2:
            raise ValueError("spatial_axes must be 2 ints defining the rotation plane.")
        self.k = k
        self.spatial_axes = tuple(spatial_axes)

    def __call__(self, boxes, spatial_size):
        return rot90_boxes(boxes, spatial_size, self.k, self.spatial_axes)
