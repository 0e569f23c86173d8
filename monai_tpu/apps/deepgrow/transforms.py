"""DeepGrow click-guidance transforms (reference: monai/apps/deepgrow/transforms.py
AddInitialSeedPointd, AddGuidanceSignald, FindDiscrepancyRegionsd, AddRandomGuidanced,
FindAllValidSlicesd)."""
from __future__ import annotations

import json
from typing import Any

import numpy as np

from ...data.meta_image import MetaImage
from ...transforms.transform import MapTransform, Randomizable, Transform
from ...utils.backend import to_numpy

__all__ = ["FindAllValidSlicesd", "AddInitialSeedPointd", "AddGuidanceSignald",
           "FindDiscrepancyRegionsd", "AddRandomGuidanced", "SpatialCropForegroundd",
           "AddGuidanceFromPointsd", "SpatialCropGuidanced", "ResizeGuidanced",
           "RestoreLabeld", "Fetch2DSliced"]


def _arr(x):
    return to_numpy(x.data if isinstance(x, MetaImage) else x)


class FindAllValidSlicesd(MapTransform):
    """Record slices containing foreground (reference: deepgrow/transforms.py)."""

    def __init__(self, label: str = "label", sids: str = "sids"):
        super().__init__(keys=label)
        self.label = label
        self.sids = sids

    def __call__(self, data):
        d = dict(data)
        label = _arr(d[self.label])
        if label.shape[0] != 1:
            raise ValueError(f"Only supports single channel labels, got {label.shape}.")
        sids = [sid for sid in range(label.shape[-1]) if np.sum(label[..., sid]) != 0] \
            if label.ndim == 4 else []
        d[self.sids] = np.asarray(sids)
        return d


class AddInitialSeedPointd(Randomizable, MapTransform):
    """Sample an initial positive click from the label (reference: deepgrow/transforms.py)."""

    def __init__(self, label: str = "label", guidance: str = "guidance", sids: str = "sids",
                 sid: str = "sid", connected_regions: int = 5):
        super().__init__(keys=label)
        self.label = label
        self.sids_key = sids
        self.sid_key = sid
        self.guidance = guidance
        self.connected_regions = connected_regions
        self.sid = None

    def randomize(self, data):
        sids = data.get(self.sids_key)
        self.sid = None
        if sids is not None and len(sids):
            self.sid = sids[self.R.randint(len(sids))]

    def _seed_point(self, label: np.ndarray) -> list:
        from scipy import ndimage as ndi

        pos_guidance = []
        labeled, num = ndi.label(label[0] > 0.5)
        for ridx in range(1, min(num, self.connected_regions) + 1):
            region = (labeled == ridx).astype(np.float32)
            if region.sum() == 0:
                continue
            dist = ndi.distance_transform_edt(region).flatten()
            probability = np.exp(dist) - 1.0
            idx = np.where(region.flatten() > 0)[0]
            probability = probability[idx]
            seed = idx[self.R.choice(len(idx), p=probability / probability.sum())]
            g = np.asarray(np.unravel_index(seed, region.shape)).tolist()
            pos_guidance.append([0] + g if label.ndim < 4 else g)
        return pos_guidance

    def __call__(self, data):
        d = dict(data)
        self.randomize(d)
        label = _arr(d[self.label])
        if self.sid is not None and label.ndim == 4:
            label2d = label[..., int(self.sid)]
            pos = self._seed_point(label2d)
            pos = [[p[0], p[1], int(self.sid)] if len(p) == 2 else p + [int(self.sid)] for p in pos]
        else:
            pos = self._seed_point(label)
        d[self.guidance] = json.dumps([pos, []])  # [positives, negatives]
        return d


class AddGuidanceSignald(MapTransform):
    """Convert click coordinates into gaussian guidance channels
    (reference: deepgrow/transforms.py AddGuidanceSignald)."""

    def __init__(self, image: str = "image", guidance: str = "guidance", sigma: int = 2,
                 number_intensity_ch: int = 1):
        super().__init__(keys=image)
        self.image = image
        self.guidance = guidance
        self.sigma = sigma
        self.number_intensity_ch = number_intensity_ch

    def _signal(self, shape, points) -> np.ndarray:
        from ...ops.gaussian import gaussian_filter

        signal = np.zeros(shape, dtype=np.float32)
        for p in points:
            coords = tuple(int(c) for c in p[-len(shape):])
            if all(0 <= c < s for c, s in zip(coords, shape)):
                signal[coords] = 1.0
        if signal.max() > 0:
            signal = np.asarray(gaussian_filter(signal[None], self.sigma))[0]
            mx = signal.max()
            if mx > 0:
                signal = signal / mx
        return signal

    def __call__(self, data):
        d = dict(data)
        image = _arr(d[self.image])
        guidance = d[self.guidance]
        if isinstance(guidance, str):
            guidance = json.loads(guidance)
        pos, neg = guidance[0], guidance[1]
        spatial = image.shape[1:]
        pos_sig = self._signal(spatial, pos)
        neg_sig = self._signal(spatial, neg)
        img_ch = image[: self.number_intensity_ch]
        out = np.concatenate([img_ch, pos_sig[None], neg_sig[None]], axis=0)
        if isinstance(d[self.image], MetaImage):
            d[self.image] = d[self.image].new_like(out)
        else:
            d[self.image] = out
        return d


class FindDiscrepancyRegionsd(MapTransform):
    """FN/FP regions between label and prediction (reference: deepgrow/transforms.py)."""

    def __init__(self, label: str = "label", pred: str = "pred", discrepancy: str = "discrepancy"):
        super().__init__(keys=label)
        self.label = label
        self.pred = pred
        self.discrepancy = discrepancy

    def __call__(self, data):
        d = dict(data)
        label = _arr(d[self.label])
        pred = _arr(d[self.pred])
        disc_fn = np.logical_and(label > 0.5, pred <= 0.5).astype(np.float32)
        disc_fp = np.logical_and(label <= 0.5, pred > 0.5).astype(np.float32)
        d[self.discrepancy] = [disc_fn, disc_fp]
        return d


class AddRandomGuidanced(Randomizable, MapTransform):
    """Add a corrective click in the discrepancy region (reference: deepgrow/transforms.py)."""

    def __init__(self, guidance: str = "guidance", discrepancy: str = "discrepancy",
                 probability: str = "probability"):
        super().__init__(keys=guidance, allow_missing_keys=True)
        self.guidance = guidance
        self.discrepancy = discrepancy
        self.probability = probability
        self._will_interact = True

    def randomize(self, data):
        probability = data.get(self.probability, 1.0)
        self._will_interact = self.R.choice([True, False], p=[probability, 1.0 - probability])

    def _find_click(self, discrepancy: np.ndarray):
        from scipy import ndimage as ndi

        region = discrepancy[0] if discrepancy.ndim == 4 else discrepancy
        if region.sum() == 0:
            return None
        dist = ndi.distance_transform_edt(region > 0.5).flatten()
        idx = np.where(region.flatten() > 0.5)[0]
        probability = np.exp(dist[idx]) - 1.0
        if probability.sum() == 0:
            return None
        seed = idx[self.R.choice(len(idx), p=probability / probability.sum())]
        return np.asarray(np.unravel_index(seed, region.shape)).tolist()

    def __call__(self, data):
        d = dict(data)
        self.randomize(d)
        guidance = d.get(self.guidance, "[[], []]")
        if isinstance(guidance, str):
            guidance = json.loads(guidance)
        if self._will_interact:
            disc_fn, disc_fp = d[self.discrepancy]
            if np.sum(disc_fn) > np.sum(disc_fp):
                click = self._find_click(disc_fn)
                if click is not None:
                    guidance[0].append(click)
            else:
                click = self._find_click(disc_fp)
                if click is not None:
                    guidance[1].append(click)
        d[self.guidance] = json.dumps(guidance)
        return d


DEFAULT_POST_FIX = "meta_dict"


def _meta_for(d: dict, key: str, meta_key, postfix: str) -> dict:
    mk = meta_key or f"{key}_{postfix}"
    if mk not in d or not isinstance(d.get(mk), dict):
        d[mk] = d.get(mk) if isinstance(d.get(mk), dict) else {}
    return d[mk]


class SpatialCropForegroundd(MapTransform):
    """Foreground crop that guarantees a minimal patch size and records the box in
    the meta dict (reference: deepgrow/transforms.py:349).

    If the foreground bounding box fits inside ``spatial_size`` in every dim, crop a
    ``spatial_size`` patch around the box center instead of the tight box.
    """

    def __init__(self, keys, source_key: str, spatial_size, select_fn=None,
                 channel_indices=None, margin: int = 0, allow_smaller: bool = True,
                 meta_keys=None, meta_key_postfix: str = DEFAULT_POST_FIX,
                 start_coord_key: str = "foreground_start_coord",
                 end_coord_key: str = "foreground_end_coord",
                 original_shape_key: str = "foreground_original_shape",
                 cropped_shape_key: str = "foreground_cropped_shape",
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        from ...transforms.utils import is_positive
        from ...utils.misc import ensure_tuple, ensure_tuple_rep

        self.source_key = source_key
        self.spatial_size = list(spatial_size)
        self.select_fn = select_fn or is_positive
        self.channel_indices = channel_indices
        self.margin = margin
        self.allow_smaller = allow_smaller
        self.meta_keys = (ensure_tuple_rep(None, len(self.keys)) if meta_keys is None
                          else ensure_tuple(meta_keys))
        self.meta_key_postfix = ensure_tuple_rep(meta_key_postfix, len(self.keys))
        self.start_coord_key = start_coord_key
        self.end_coord_key = end_coord_key
        self.original_shape_key = original_shape_key
        self.cropped_shape_key = cropped_shape_key

    def __call__(self, data):
        from ...transforms.croppad_array import SpatialCrop
        from ...transforms.utils import generate_spatial_bounding_box

        d = dict(data)
        box_start, box_end = generate_spatial_bounding_box(
            _arr(d[self.source_key]), self.select_fn, self.channel_indices, self.margin,
            self.allow_smaller)
        center = list(np.mean([box_start, box_end], axis=0).astype(int))
        current_size = list(np.subtract(box_end, box_start).astype(int))
        if np.all(np.less(current_size, self.spatial_size)):
            cropper = SpatialCrop(roi_center=center, roi_size=self.spatial_size)
            box_start = [s.start for s in cropper.slices]
            box_end = [s.stop for s in cropper.slices]
        else:
            cropper = SpatialCrop(roi_start=box_start, roi_end=box_end)
        for key, meta_key, postfix in self.key_iterator(d, self.meta_keys, self.meta_key_postfix):
            meta = _meta_for(d, key, meta_key, postfix)
            meta[self.start_coord_key] = box_start
            meta[self.end_coord_key] = box_end
            meta[self.original_shape_key] = d[key].shape
            image = cropper(d[key])
            meta[self.cropped_shape_key] = image.shape
            d[key] = image
        return d


class AddGuidanceFromPointsd(Transform):
    """Convert user clicks (original HWD coords) into guidance in the current image
    grid (reference: deepgrow/transforms.py:462)."""

    def __init__(self, ref_image: str, guidance: str = "guidance",
                 foreground: str = "foreground", background: str = "background",
                 axis: int = 0, depth_first: bool = True, spatial_dims: int = 2,
                 slice_key: str = "slice", meta_keys=None,
                 meta_key_postfix: str = DEFAULT_POST_FIX):
        self.ref_image = ref_image
        self.guidance = guidance
        self.foreground = foreground
        self.background = background
        self.axis = axis
        self.depth_first = depth_first
        self.dimensions = spatial_dims
        self.slice = slice_key
        self.meta_keys = meta_keys
        self.meta_key_postfix = meta_key_postfix

    def _apply(self, pos_clicks, neg_clicks, factor, slice_num):
        pos = neg = []
        if self.dimensions == 2:
            points = list(pos_clicks) + list(neg_clicks)
            slices = list(np.unique(np.array(points)[:, self.axis]))
            slice_idx = slices[0] if slice_num is None else next(x for x in slices if x == slice_num)
            if len(pos_clicks):
                pc = np.array(pos_clicks)
                pos = (pc[pc[:, self.axis] == slice_idx] * factor)[:, 1:].astype(int).tolist()
            if len(neg_clicks):
                nc = np.array(neg_clicks)
                neg = (nc[nc[:, self.axis] == slice_idx] * factor)[:, 1:].astype(int).tolist()
            return [pos, neg, slice_idx]
        if len(pos_clicks):
            pos = np.multiply(pos_clicks, factor).astype(int).tolist()
        if len(neg_clicks):
            neg = np.multiply(neg_clicks, factor).astype(int).tolist()
        return [pos, neg]

    def __call__(self, data):
        d = dict(data)
        meta_dict_key = self.meta_keys or f"{self.ref_image}_{self.meta_key_postfix}"
        meta = d.get(meta_dict_key)
        if meta is None and isinstance(d.get(self.ref_image), MetaImage):
            meta = d[self.ref_image].meta
        if meta is None or "spatial_shape" not in meta:
            raise RuntimeError(f'Missing meta_dict "{meta_dict_key}" with "spatial_shape"!')
        original_shape = np.asarray(meta["spatial_shape"])
        current_shape = list(_arr(d[self.ref_image]).shape)
        if self.depth_first:
            if self.axis != 0:
                raise RuntimeError("Depth first means the depth axis should be 0.")
            original_shape = np.roll(original_shape, 1)
        factor = np.array(current_shape) / original_shape
        fg_bg = []
        for key in (self.foreground, self.background):
            clicks = [list(np.roll(c, 1)) if self.depth_first else list(c)
                      for c in np.array(d.get(key, []), dtype=int)]
            fg_bg.append(clicks)
        d[self.guidance] = self._apply(fg_bg[0], fg_bg[1], factor, d.get(self.slice))
        return d


class SpatialCropGuidanced(MapTransform):
    """Crop around the guidance clicks with a minimal patch size; records the box
    and rebases the guidance (reference: deepgrow/transforms.py:577)."""

    def __init__(self, keys, guidance: str, spatial_size, margin: int = 20,
                 meta_keys=None, meta_key_postfix: str = DEFAULT_POST_FIX,
                 start_coord_key: str = "foreground_start_coord",
                 end_coord_key: str = "foreground_end_coord",
                 original_shape_key: str = "foreground_original_shape",
                 cropped_shape_key: str = "foreground_cropped_shape",
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        from ...utils.misc import ensure_tuple, ensure_tuple_rep

        self.guidance = guidance
        self.spatial_size = list(spatial_size)
        self.margin = margin
        self.meta_keys = (ensure_tuple_rep(None, len(self.keys)) if meta_keys is None
                          else ensure_tuple(meta_keys))
        self.meta_key_postfix = ensure_tuple_rep(meta_key_postfix, len(self.keys))
        self.start_coord_key = start_coord_key
        self.end_coord_key = end_coord_key
        self.original_shape_key = original_shape_key
        self.cropped_shape_key = cropped_shape_key

    def bounding_box(self, points, img_shape):
        from ...utils.misc import ensure_tuple_rep

        ndim = len(img_shape)
        margin = ensure_tuple_rep(self.margin, ndim)
        box_start, box_end = [0] * ndim, [0] * ndim
        for di in range(ndim):
            dt = points[..., di]
            box_start[di] = max(min(dt - margin[di]), 0)
            box_end[di] = min(img_shape[di], max(dt + margin[di] + 1))
        return box_start, box_end

    def __call__(self, data):
        from ...transforms.croppad_array import SpatialCrop

        d = dict(data)
        first_key = self.first_key(d)
        if first_key == ():
            return d
        guidance = d[self.guidance]
        original_spatial_shape = _arr(d[first_key]).shape[1:]
        box_start, box_end = self.bounding_box(np.array(guidance[0] + guidance[1]),
                                               original_spatial_shape)
        center = list(np.mean([box_start, box_end], axis=0).astype(int))
        spatial_size = self.spatial_size
        box_size = list(np.subtract(box_end, box_start).astype(int))
        spatial_size = spatial_size[-len(box_size):]
        if len(spatial_size) < len(box_size):
            diff = len(box_size) - len(spatial_size)
            spatial_size = list(original_spatial_shape[1:1 + diff]) + spatial_size
        if np.all(np.less(box_size, spatial_size)):
            if len(center) == 3:
                center[0] = spatial_size[0] // 2
            cropper = SpatialCrop(roi_center=center, roi_size=spatial_size)
        else:
            cropper = SpatialCrop(roi_start=box_start, roi_end=box_end)
        box_start = np.array([s.start for s in cropper.slices])
        box_end = np.array([s.stop for s in cropper.slices])
        for key, meta_key, postfix in self.key_iterator(d, self.meta_keys, self.meta_key_postfix):
            if not np.array_equal(_arr(d[key]).shape[1:], original_spatial_shape):
                raise RuntimeError("All the images in keys should have the same spatial shape.")
            meta = _meta_for(d, key, meta_key, postfix)
            meta[self.start_coord_key] = box_start
            meta[self.end_coord_key] = box_end
            meta[self.original_shape_key] = d[key].shape
            image = cropper(d[key])
            meta[self.cropped_shape_key] = image.shape
            d[key] = image
        pos_clicks, neg_clicks = guidance[0], guidance[1]
        pos = np.subtract(pos_clicks, box_start).tolist() if len(pos_clicks) else []
        neg = np.subtract(neg_clicks, box_start).tolist() if len(neg_clicks) else []
        d[self.guidance] = [pos, neg]
        return d


class ResizeGuidanced(Transform):
    """Rescale guidance click coordinates after the image was resized
    (reference: deepgrow/transforms.py:707)."""

    def __init__(self, guidance: str, ref_image: str, meta_keys=None,
                 meta_key_postfix: str = DEFAULT_POST_FIX,
                 cropped_shape_key: str = "foreground_cropped_shape"):
        self.guidance = guidance
        self.ref_image = ref_image
        self.meta_keys = meta_keys
        self.meta_key_postfix = meta_key_postfix
        self.cropped_shape_key = cropped_shape_key

    def __call__(self, data):
        d = dict(data)
        guidance = d[self.guidance]
        meta = d[self.meta_keys or f"{self.ref_image}_{self.meta_key_postfix}"]
        current_shape = _arr(d[self.ref_image]).shape[1:]
        cropped_shape = meta[self.cropped_shape_key][1:]
        factor = np.divide(current_shape, cropped_shape)
        pos_clicks, neg_clicks = guidance[0], guidance[1]
        pos = np.multiply(pos_clicks, factor).astype(int).tolist() if len(pos_clicks) else []
        neg = np.multiply(neg_clicks, factor).astype(int).tolist() if len(neg_clicks) else []
        d[self.guidance] = [pos, neg]
        return d


class RestoreLabeld(MapTransform):
    """Undo Resize -> Crop -> Spacing -> Slicing so a 2D/3D prediction overlays the
    original volume (reference: deepgrow/transforms.py:758)."""

    def __init__(self, keys, ref_image: str, slice_only: bool = False, mode="nearest",
                 align_corners=None, meta_keys=None,
                 meta_key_postfix: str = DEFAULT_POST_FIX,
                 start_coord_key: str = "foreground_start_coord",
                 end_coord_key: str = "foreground_end_coord",
                 original_shape_key: str = "foreground_original_shape",
                 cropped_shape_key: str = "foreground_cropped_shape",
                 allow_missing_keys: bool = False, restore_resizing: bool = True,
                 restore_cropping: bool = True, restore_spacing: bool = True,
                 restore_slicing: bool = True):
        super().__init__(keys, allow_missing_keys)
        from ...utils.misc import ensure_tuple, ensure_tuple_rep

        self.ref_image = ref_image
        self.slice_only = slice_only
        self.mode = ensure_tuple_rep(mode, len(self.keys))
        self.align_corners = ensure_tuple_rep(align_corners, len(self.keys))
        self.meta_keys = (ensure_tuple_rep(None, len(self.keys)) if meta_keys is None
                          else ensure_tuple(meta_keys))
        self.meta_key_postfix = meta_key_postfix
        self.start_coord_key = start_coord_key
        self.end_coord_key = end_coord_key
        self.original_shape_key = original_shape_key
        self.cropped_shape_key = cropped_shape_key
        self.restore_resizing = restore_resizing
        self.restore_cropping = restore_cropping
        self.restore_spacing = restore_spacing
        self.restore_slicing = restore_slicing

    def __call__(self, data):
        from ...transforms.spatial_array import Resize

        d = dict(data)
        meta_dict = d[f"{self.ref_image}_{self.meta_key_postfix}"]
        for key, mode, align_corners, meta_key in self.key_iterator(
                d, self.mode, self.align_corners, self.meta_keys):
            image = _arr(d[key])
            if self.restore_resizing:
                cropped_shape = meta_dict[self.cropped_shape_key]
                if np.any(np.not_equal(image.shape, cropped_shape)):
                    image = _arr(Resize(spatial_size=cropped_shape[1:], mode=mode)(image))
            if self.restore_cropping:
                original_shape = meta_dict[self.original_shape_key]
                result = np.zeros(original_shape, dtype=np.float32)
                box_start = meta_dict[self.start_coord_key]
                box_end = meta_dict[self.end_coord_key]
                sd = min(len(box_start), len(image.shape[1:]))
                slices = tuple([slice(None)] + [slice(int(s), int(e))
                                                for s, e in zip(box_start[:sd], box_end[:sd])])
                result[slices] = image
            else:
                result = image
            spatial_shape = list(np.roll(meta_dict["spatial_shape"], 1))
            if self.restore_spacing:
                current_size = result.shape[1:]
                spatial_size = spatial_shape[-len(current_size):]
                if np.any(np.not_equal(current_size, spatial_size)):
                    result = _arr(Resize(spatial_size=spatial_size, mode=mode)(result))
            slice_idx = meta_dict.get("slice_idx")
            if not self.restore_slicing:
                final_result = result
            elif slice_idx is None or self.slice_only:
                final_result = result if len(result.shape) <= 3 else result[0]
            else:
                sidx = meta_dict["slice_idx"][0]
                final_result = np.zeros(tuple(spatial_shape), dtype=np.float32)
                final_result[sidx] = result
            d[key] = final_result
            meta = _meta_for(d, key, meta_key, self.meta_key_postfix)
            meta["slice_idx"] = slice_idx
            if "original_affine" in meta_dict:
                meta["affine"] = meta_dict["original_affine"]
        return d


class Fetch2DSliced(MapTransform):
    """Select the guidance's slice out of a 3D volume (reference:
    deepgrow/transforms.py:917)."""

    def __init__(self, keys, guidance: str = "guidance", axis: int = 0,
                 meta_keys=None, meta_key_postfix: str = DEFAULT_POST_FIX,
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        from ...utils.misc import ensure_tuple, ensure_tuple_rep

        self.guidance = guidance
        self.axis = axis
        self.meta_keys = (ensure_tuple_rep(None, len(self.keys)) if meta_keys is None
                          else ensure_tuple(meta_keys))
        self.meta_key_postfix = ensure_tuple_rep(meta_key_postfix, len(self.keys))

    def _apply(self, image, guidance):
        slice_idx = guidance[2]
        idx = tuple(slice_idx if i == self.axis else slice(0, s)
                    for i, s in enumerate(image.shape))
        return image[idx], idx

    def __call__(self, data):
        d = dict(data)
        guidance = d[self.guidance]
        if len(guidance) < 3:
            raise RuntimeError("Guidance does not contain slice_idx!")
        for key, meta_key, postfix in self.key_iterator(d, self.meta_keys, self.meta_key_postfix):
            img_slice, idx = self._apply(_arr(d[key]), guidance)
            d[key] = img_slice
            _meta_for(d, key, meta_key, postfix)["slice_idx"] = idx
        return d
