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
           "RandZoomBoxd", "FlipBoxd", "RandFlipBoxd", "ClipBoxToImaged", "BoxToMaskd",
           "MaskToBoxd", "RandCropBoxByPosNegLabeld", "RotateBox90d", "RandRotateBox90d"]


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
        src_spatial_size = _image_spatial(d[self.box_ref_image_keys])
        for key in self.key_iterator(d):
            d[key] = self.zoomer(d[key])
        for key in self.box_keys:
            d[key] = ZoomBox(self.zoom, keep_size=self.zoomer.keep_size)(
                d[key], src_spatial_size=src_spatial_size)
        return d


class RandZoomBoxd(RandomizableTransform, MapTransform):
    """Randomly zoom images and boxes together with a shared factor
    (reference: detection dictionary.py:500)."""

    def __init__(self, image_keys, box_keys, box_ref_image_keys, prob: float = 0.1,
                 min_zoom=0.9, max_zoom=1.1, mode="area", padding_mode="edge",
                 align_corners=None, keep_size: bool = True,
                 allow_missing_keys: bool = False, **kwargs):
        from ....transforms.spatial_array import RandZoom

        self.image_keys = ensure_tuple(image_keys)
        self.box_keys = ensure_tuple(box_keys)
        MapTransform.__init__(self, self.image_keys + self.box_keys, allow_missing_keys)
        RandomizableTransform.__init__(self, prob)
        self.box_ref_image_keys = ensure_tuple_rep(box_ref_image_keys, len(self.box_keys))
        self.rand_zoom = RandZoom(prob=1.0, min_zoom=min_zoom, max_zoom=max_zoom,
                                  keep_size=keep_size, **kwargs)
        self.mode = ensure_tuple_rep(mode, len(self.image_keys))
        self.padding_mode = ensure_tuple_rep(padding_mode, len(self.image_keys))
        self.align_corners = ensure_tuple_rep(align_corners, len(self.image_keys))
        self.keep_size = keep_size

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.rand_zoom.set_random_state(seed, state)
        return self

    def __call__(self, data):
        d = dict(data)
        first_key = self.first_key(d)
        if first_key == ():
            return d
        self.randomize(None)
        # one shared zoom factor for every key (reference draws it from rand_zoom)
        self.rand_zoom.randomize(d[first_key].data if isinstance(d[first_key], MetaImage)
                                 else d[first_key])

        for box_key, box_ref_image_key in zip(self.box_keys, self.box_ref_image_keys):
            if self._do_transform:
                src_spatial_size = _image_spatial(d[box_ref_image_key])
                # snap the zoom so box and image zooms agree on the integer output size
                dst_spatial_size = [int(round(z * ss))
                                    for z, ss in zip(self.rand_zoom._zoom, src_spatial_size)]
                self.rand_zoom._zoom = [ds / float(ss)
                                        for ss, ds in zip(src_spatial_size, dst_spatial_size)]
                d[box_key] = ZoomBox(zoom=self.rand_zoom._zoom, keep_size=self.keep_size)(
                    d[box_key], src_spatial_size=src_spatial_size)

        for key, mode, padding_mode, align_corners in zip(self.image_keys, self.mode,
                                                          self.padding_mode, self.align_corners):
            if self._do_transform:
                d[key] = self.rand_zoom(d[key], mode=mode, padding_mode=padding_mode,
                                        align_corners=align_corners, randomize=False)
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


class RandFlipBoxd(RandomizableTransform, MapTransform):
    """Randomly flip images and boxes together (reference: detection dictionary.py:705)."""

    def __init__(self, image_keys, box_keys, box_ref_image_keys, prob: float = 0.1,
                 spatial_axis=None, allow_missing_keys: bool = False):
        from ....transforms.spatial_array import Flip

        self.image_keys = ensure_tuple(image_keys)
        self.box_keys = ensure_tuple(box_keys)
        MapTransform.__init__(self, self.image_keys + self.box_keys, allow_missing_keys)
        RandomizableTransform.__init__(self, prob)
        self.box_ref_image_keys = ensure_tuple_rep(box_ref_image_keys, len(self.box_keys))
        self.flipper = Flip(spatial_axis=spatial_axis)
        self.box_flipper = FlipBox(spatial_axis=spatial_axis)

    def __call__(self, data):
        d = dict(data)
        self.randomize(None)
        if not self._do_transform:
            return d
        for key in self.image_keys:
            d[key] = self.flipper(d[key])
        for box_key, box_ref_image_key in zip(self.box_keys, self.box_ref_image_keys):
            spatial_size = _image_spatial(d[box_ref_image_key])
            d[box_key] = self.box_flipper(d[box_key], spatial_size)
        return d


class RandCropBoxByPosNegLabeld(MapTransform, RandomizableTransform):
    """Sample ``num_samples`` fixed-size crops whose centres balance patches that
    contain a box (foreground) vs background; crops images, boxes and labels
    consistently (reference: detection dictionary.py:1014 — the patch sampler of
    the reference RetinaNet training recipe)."""

    def __init__(self, image_keys, box_keys: str, label_keys, spatial_size,
                 pos: float = 1.0, neg: float = 1.0, num_samples: int = 1,
                 whole_box: bool = True, thresh_image_key: str | None = None,
                 image_threshold: float = 0.0, fg_indices_key: str | None = None,
                 bg_indices_key: str | None = None, meta_keys=None,
                 meta_key_postfix: str = "meta_dict", allow_smaller: bool = False,
                 allow_missing_keys: bool = False):
        self.image_keys = ensure_tuple(image_keys)
        if len(self.image_keys) < 1:
            raise ValueError("At least one image_keys should be provided.")
        MapTransform.__init__(self, self.image_keys, allow_missing_keys)
        RandomizableTransform.__init__(self, prob=1.0)
        box_keys_tuple = ensure_tuple(box_keys)
        if len(box_keys_tuple) != 1:
            raise ValueError("Please provide a single key for box_keys.")
        self.box_keys = box_keys_tuple[0]
        self.label_keys = ensure_tuple(label_keys)
        self.spatial_size_ = spatial_size
        if pos < 0 or neg < 0:
            raise ValueError(f"pos and neg must be nonnegative, got pos={pos} neg={neg}.")
        if pos + neg == 0:
            raise ValueError("Incompatible values: pos=0 and neg=0.")
        self.pos_ratio = pos / (pos + neg)
        if num_samples < 1:
            raise ValueError(f"num_samples needs to be positive int, got {num_samples}.")
        self.num_samples = num_samples
        self.whole_box = whole_box
        self.thresh_image_key = thresh_image_key
        self.image_threshold = image_threshold
        self.fg_indices_key = fg_indices_key
        self.bg_indices_key = bg_indices_key
        self.centers: list | None = None
        self.allow_smaller = allow_smaller

    def generate_fg_center_boxes_np(self, boxes, image_size) -> np.ndarray:
        """Boxes of valid crop-centre positions: any centre inside the extended box
        yields a patch containing (whole_box: the whole of) the source box."""
        spatial_dims = len(image_size)
        boxes_np = np.asarray(to_numpy(boxes))
        extended_boxes = np.zeros_like(boxes_np, dtype=int)
        boxes_start = np.ceil(boxes_np[:, :spatial_dims]).astype(int)
        boxes_stop = np.floor(boxes_np[:, spatial_dims:]).astype(int)
        for axis in range(spatial_dims):
            if not self.whole_box:
                extended_boxes[:, axis] = boxes_start[:, axis] - self.spatial_size[axis] // 2 + 1
                extended_boxes[:, axis + spatial_dims] = (
                    boxes_stop[:, axis] + self.spatial_size[axis] // 2 - 1)
            else:
                extended_boxes[:, axis] = np.minimum(
                    boxes_stop[:, axis] - self.spatial_size[axis] // 2 - 1, boxes_start[:, axis])
                extended_boxes[:, axis + spatial_dims] = np.maximum(
                    extended_boxes[:, axis] + self.spatial_size[axis] // 2, boxes_stop[:, axis])
        from ....data.box_utils import clip_boxes_to_image

        extended_boxes, _ = clip_boxes_to_image(extended_boxes, image_size, remove_empty=True)
        return extended_boxes

    def randomize(self, boxes, image_size, fg_indices=None, bg_indices=None,
                  thresh_image=None) -> None:
        from ....transforms.utils import (generate_pos_neg_label_crop_centers,
                                          map_binary_to_indices)
        from .box_ops import convert_box_to_mask

        if fg_indices is None or bg_indices is None:
            extended_boxes_np = self.generate_fg_center_boxes_np(boxes, image_size)
            mask_img = convert_box_to_mask(extended_boxes_np,
                                           np.ones(extended_boxes_np.shape[0]),
                                           image_size, bg_label=0, ellipse_mask=False)
            mask_img = np.amax(np.asarray(to_numpy(mask_img)), axis=0, keepdims=True)[0:1]
            fg_indices_, bg_indices_ = map_binary_to_indices(mask_img, thresh_image,
                                                             self.image_threshold)
        else:
            fg_indices_, bg_indices_ = fg_indices, bg_indices
        self.centers = generate_pos_neg_label_crop_centers(
            self.spatial_size, self.num_samples, self.pos_ratio, image_size,
            fg_indices_, bg_indices_, self.R, self.allow_smaller)

    def __call__(self, data):
        from copy import deepcopy

        from ....transforms.croppad_array import SpatialCrop
        from .array import SpatialCropBox

        d = dict(data)
        image_size = _image_spatial(d[self.image_keys[0]])
        from ....utils.misc import fall_back_tuple

        self.spatial_size = fall_back_tuple(self.spatial_size_, image_size)

        boxes = d[self.box_keys]
        labels = [d[label_key] for label_key in self.label_keys]
        fg_indices = d.pop(self.fg_indices_key, None) if self.fg_indices_key else None
        bg_indices = d.pop(self.bg_indices_key, None) if self.bg_indices_key else None
        thresh_image = d[self.thresh_image_key] if self.thresh_image_key else None
        self.randomize(boxes, image_size, fg_indices, bg_indices, thresh_image)
        if self.centers is None:
            raise ValueError("no available ROI centers to crop.")

        results = [dict(d) for _ in range(self.num_samples)]
        for i, center in enumerate(self.centers):
            results[i] = deepcopy(d)
            cropper = SpatialCrop(roi_center=tuple(center), roi_size=self.spatial_size)
            crop_start = [max(s.start, 0) for s in cropper.slices]
            crop_end = [min(s.stop, sz) for s, sz in zip(cropper.slices, image_size)]
            crop_slices = [slice(int(s), int(e)) for s, e in zip(crop_start, crop_end)]
            cropper = SpatialCrop(roi_slices=crop_slices)
            for image_key in self.image_keys:
                results[i][image_key] = cropper(d[image_key])
            boxcropper = SpatialCropBox(roi_slices=crop_slices)
            results[i][self.box_keys], cropped_labels = boxcropper(boxes, labels)
            for label_key, cropped_labels_i in zip(self.label_keys, cropped_labels):
                results[i][label_key] = cropped_labels_i
        return results


class RotateBox90d(MapTransform):
    """Rotate images and boxes by 90 degrees k times
    (reference: detection dictionary.py:1226)."""

    def __init__(self, image_keys, box_keys, box_ref_image_keys, k: int = 1,
                 spatial_axes=(0, 1), allow_missing_keys: bool = False):
        from ....transforms.spatial_array import Rotate90

        self.image_keys = ensure_tuple(image_keys)
        self.box_keys = ensure_tuple(box_keys)
        super().__init__(self.image_keys + self.box_keys, allow_missing_keys)
        self.box_ref_image_keys = ensure_tuple_rep(box_ref_image_keys, len(self.box_keys))
        from .array import RotateBox90

        self.img_rotator = Rotate90(k, spatial_axes)
        self.box_rotator = RotateBox90(k, spatial_axes)

    def __call__(self, data):
        d = dict(data)
        for key, box_ref_image_key in zip(self.box_keys, self.box_ref_image_keys):
            spatial_size = list(_image_spatial(d[box_ref_image_key]))
            d[key] = self.box_rotator(d[key], spatial_size)
        for key in self.image_keys:
            d[key] = self.img_rotator(d[key])
        return d


class RandRotateBox90d(RandomizableTransform, MapTransform):
    """With probability ``prob`` rotate images and boxes by 90 degrees a random
    1..max_k times (reference: detection dictionary.py:1294)."""

    def __init__(self, image_keys, box_keys, box_ref_image_keys, prob: float = 0.1,
                 max_k: int = 3, spatial_axes=(0, 1), allow_missing_keys: bool = False):
        self.image_keys = ensure_tuple(image_keys)
        self.box_keys = ensure_tuple(box_keys)
        MapTransform.__init__(self, self.image_keys + self.box_keys, allow_missing_keys)
        RandomizableTransform.__init__(self, prob)
        self.box_ref_image_keys = ensure_tuple_rep(box_ref_image_keys, len(self.box_keys))
        self.max_k = max_k
        self.spatial_axes = tuple(spatial_axes)
        self._rand_k = 0

    def randomize(self, data=None) -> None:
        # reference draws k BEFORE the prob sample (dictionary.py:1373)
        self._rand_k = self.R.randint(self.max_k) + 1
        super().randomize(None)

    def __call__(self, data):
        from ....transforms.spatial_array import Rotate90
        from .array import RotateBox90

        self.randomize()
        d = dict(data)
        if self._rand_k % 4 == 0 or not self._do_transform:
            return d
        box_rotator = RotateBox90(self._rand_k, self.spatial_axes)
        img_rotator = Rotate90(self._rand_k, self.spatial_axes)
        for key, box_ref_image_key in zip(self.box_keys, self.box_ref_image_keys):
            spatial_size = list(_image_spatial(d[box_ref_image_key]))
            d[key] = box_rotator(d[key], spatial_size)
        for key in self.image_keys:
            d[key] = img_rotator(d[key])
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
