"""Detection box transforms, dictionary API
(reference: monai/apps/detection/transforms/dictionary.py:102-1100)."""
from __future__ import annotations

import numpy as np

from ....data.meta_image import MetaImage
from ....transforms.transform import MapTransform, RandomizableTransform
from ....utils.backend import to_numpy
from ....utils.misc import ensure_tuple, ensure_tuple_rep
from .array import (
    AffineBox,
    BoxToMask,
    ClipBoxToImage,
    ConvertBoxMode,
    ConvertBoxToStandardMode,
    FlipBox,
    MaskToBox,
    StandardizeEmptyBox,
    ZoomBox,
)

__all__ = ["StandardizeEmptyBoxd", "ConvertBoxModed", "ConvertBoxToStandardModed",
           "AffineBoxToImageCoordinated", "AffineBoxToWorldCoordinated", "ZoomBoxd",
           "FlipBoxd", "ClipBoxToImaged", "BoxToMaskd", "MaskToBoxd"]


def _image_spatial(img):
    arr = to_numpy(img.data if isinstance(img, MetaImage) else img)
    return arr.shape[1:]


class StandardizeEmptyBoxd(MapTransform):
    """(reference: detection dictionary.py:102)."""

    def __init__(self, box_keys, box_ref_image_keys: str, allow_missing_keys: bool = False):
        super().__init__(box_keys, allow_missing_keys)
        self.box_ref_image_keys = box_ref_image_keys

    def __call__(self, data):
        d = dict(data)
        sd = len(_image_spatial(d[self.box_ref_image_keys]))
        conv = StandardizeEmptyBox(sd)
        for key in self.key_iterator(d):
            d[key] = conv(d[key])
        return d


class ConvertBoxModed(MapTransform):
    """(reference: detection dictionary.py:146)."""

    def __init__(self, box_keys, src_mode=None, dst_mode=None,
                 allow_missing_keys: bool = False):
        super().__init__(box_keys, allow_missing_keys)
        self.converter = ConvertBoxMode(src_mode, dst_mode)

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key])
        return d


class ConvertBoxToStandardModed(MapTransform):
    """(reference: detection dictionary.py:202)."""

    def __init__(self, box_keys, mode=None, allow_missing_keys: bool = False):
        super().__init__(box_keys, allow_missing_keys)
        self.converter = ConvertBoxToStandardMode(mode)

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key])
        return d


class AffineBoxToImageCoordinated(MapTransform):
    """World -> image voxel coordinates using the reference image affine
    (reference: detection dictionary.py:257)."""

    def __init__(self, box_keys, box_ref_image_keys: str, allow_missing_keys: bool = False,
                 image_meta_key: str | None = None, image_meta_key_postfix: str = "meta_dict",
                 affine_lps_to_ras: bool = False):
        super().__init__(box_keys, allow_missing_keys)
        self.box_ref_image_keys = box_ref_image_keys
        self.image_meta_key = image_meta_key or f"{box_ref_image_keys}_{image_meta_key_postfix}"
        self.affine_lps_to_ras = affine_lps_to_ras
        self.converter = AffineBox()

    def _get_affine(self, d):
        ref = d[self.box_ref_image_keys]
        if isinstance(ref, MetaImage) and ref.affine is not None:
            affine = np.asarray(ref.affine)
        elif self.image_meta_key in d:
            affine = np.asarray(d[self.image_meta_key]["affine"])
        else:
            raise ValueError("reference image affine not found.")
        if self.affine_lps_to_ras:
            from ....data.affine_utils import orientation_ras_lps

            affine = orientation_ras_lps(affine)
        return affine

    def __call__(self, data):
        d = dict(data)
        affine = self._get_affine(d)
        inv = np.linalg.inv(affine)
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key], affine=inv)
        return d

    def inverse(self, data):
        d = dict(data)
        affine = self._get_affine(d)
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key], affine=affine)
        return d


class AffineBoxToWorldCoordinated(AffineBoxToImageCoordinated):
    """Image voxel -> world coordinates (reference: detection dictionary.py:349)."""

    def __call__(self, data):
        d = dict(data)
        affine = self._get_affine(d)
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key], affine=affine)
        return d

    def inverse(self, data):
        d = dict(data)
        affine = self._get_affine(d)
        inv = np.linalg.inv(affine)
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key], affine=inv)
        return d


class ZoomBoxd(MapTransform):
    """Zoom images (via the spatial Zoom transform) and boxes together
    (reference: detection dictionary.py:397)."""

    def __init__(self, image_keys, box_keys, box_ref_image_keys, zoom,
                 mode="area", padding_mode="edge", align_corners=None,
                 keep_size: bool = True, allow_missing_keys: bool = False, **kwargs):
        super().__init__(image_keys, allow_missing_keys)
        self.box_keys = ensure_tuple(box_keys)
        self.box_ref_image_keys = box_ref_image_keys
        from ....transforms.spatial_array import Zoom

        self.zoomer = Zoom(zoom=zoom, mode=mode, padding_mode=padding_mode,
                           keep_size=keep_size, **kwargs)
        self.zoom = zoom

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.zoomer(d[key])
        for key in self.box_keys:
            d[key] = ZoomBox(self.zoom)(d[key])
        return d


class FlipBoxd(MapTransform):
    """Flip images and boxes together (reference: detection dictionary.py:643)."""

    def __init__(self, image_keys, box_keys, box_ref_image_keys,
                 spatial_axis=None, allow_missing_keys: bool = False):
        super().__init__(image_keys, allow_missing_keys)
        self.box_keys = ensure_tuple(box_keys)
        self.box_ref_image_keys = box_ref_image_keys
        from ....transforms.spatial_array import Flip

        self.flipper = Flip(spatial_axis=spatial_axis)
        self.box_flipper = FlipBox(spatial_axis)

    def __call__(self, data):
        d = dict(data)
        spatial_size = _image_spatial(d[self.box_ref_image_keys])
        for key in self.key_iterator(d):
            d[key] = self.flipper(d[key])
        for key in self.box_keys:
            d[key] = self.box_flipper(d[key], spatial_size)
        return d


class ClipBoxToImaged(MapTransform):
    """(reference: detection dictionary.py:785)."""

    def __init__(self, box_keys, label_keys, box_ref_image_keys,
                 remove_empty: bool = True, allow_missing_keys: bool = False):
        box_keys = ensure_tuple(box_keys)
        if len(box_keys) != 1:
            raise ValueError("ClipBoxToImaged supports one box key.")
        super().__init__(box_keys, allow_missing_keys)
        self.label_keys = ensure_tuple(label_keys)
        self.box_ref_image_keys = box_ref_image_keys
        self.clipper = ClipBoxToImage(remove_empty=remove_empty)

    def __call__(self, data):
        d = dict(data)
        spatial_size = _image_spatial(d[self.box_ref_image_keys])
        box_key = self.keys[0]
        labels = [d[k] for k in self.label_keys]
        d[box_key], clipped = self.clipper(d[box_key], labels, spatial_size)
        clipped = clipped if isinstance(clipped, tuple) else (clipped,)
        for k, v in zip(self.label_keys, clipped):
            d[k] = v
        return d


class BoxToMaskd(MapTransform):
    """(reference: detection dictionary.py:831)."""

    def __init__(self, box_keys, box_mask_keys, label_keys, box_ref_image_keys,
                 min_fg_label: int | None = None, ellipse_mask: bool = False,
                 allow_missing_keys: bool = False):
        super().__init__(box_keys, allow_missing_keys)
        self.box_mask_keys = ensure_tuple(box_mask_keys)
        self.label_keys = ensure_tuple(label_keys)
        self.box_ref_image_keys = box_ref_image_keys
        self.min_fg_label = min_fg_label
        self.ellipse_mask = ellipse_mask

    def __call__(self, data):
        d = dict(data)
        spatial_size = _image_spatial(d[self.box_ref_image_keys])
        for box_key, mask_key, label_key in zip(self.keys, self.box_mask_keys,
                                                self.label_keys):
            labels = np.asarray(to_numpy(d[label_key]))
            offset = 0
            if self.min_fg_label is not None and labels.size and labels.min() < self.min_fg_label:
                offset = self.min_fg_label - int(labels.min())
            conv = BoxToMask(bg_label=(self.min_fg_label or 0) - 1,
                             ellipse_mask=self.ellipse_mask)
            d[mask_key] = conv(d[box_key], labels + offset, spatial_size)
        return d


class MaskToBoxd(MapTransform):
    """(reference: detection dictionary.py:903)."""

    def __init__(self, box_mask_keys, box_keys, label_keys, min_fg_label: int | None = None,
                 box_dtype=np.float32, label_dtype=np.int64, allow_missing_keys: bool = False):
        super().__init__(box_mask_keys, allow_missing_keys)
        self.box_keys = ensure_tuple(box_keys)
        self.label_keys = ensure_tuple(label_keys)
        self.converter = MaskToBox(bg_label=(min_fg_label or 0) - 1, box_dtype=box_dtype,
                                   label_dtype=label_dtype)

    def __call__(self, data):
        d = dict(data)
        for mask_key, box_key, label_key in zip(self.keys, self.box_keys, self.label_keys):
            boxes, labels = self.converter(d[mask_key])
            d[box_key] = boxes
            d[label_key] = labels
        return d
