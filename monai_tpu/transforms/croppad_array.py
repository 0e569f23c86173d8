"""Crop & pad transforms (array API).

Parity targets: monai/transforms/croppad/array.py:81-1505 (Pad/SpatialPad/BorderPad/
DivisiblePad, Crop/SpatialCrop/CenterSpatialCrop/RandSpatialCrop(Samples)/CropForeground/
RandWeightedCrop/RandCropByPosNegLabel/RandCropByLabelClasses/ResizeWithPadOrCrop/
BoundingRect) and croppad/functional.py.

Crops and pads are integer translations in the lazy algebra — they always take the
no-interpolation fast path (pure slicing + np.pad), and fuse with any surrounding
affine ops when lazy.
"""
from __future__ import annotations

from itertools import chain
from math import ceil, floor
from typing import Any, Callable, Sequence

import numpy as np

from ..data.meta_image import MetaImage, get_track_meta
from ..utils.enums import Method, TraceKeys
from ..utils.misc import ensure_tuple, ensure_tuple_rep, fall_back_tuple, issequenceiterable
from .inverse import InvertibleTransform
from .lazy_executor import apply_pending
from .transform import LazyTransform, Randomizable, RandomizableTransform, Transform
from .traits import MultiSampleTrait
from .utils import (
    compute_divisible_spatial_size,
    correct_crop_centers,
    generate_label_classes_crop_centers,
    generate_pos_neg_label_crop_centers,
    generate_spatial_bounding_box,
    is_positive,
    map_binary_to_indices,
    map_classes_to_indices,
    weighted_patch_samples,
)

__all__ = [
    "PadListDataCollate",
    "Pad",
    "SpatialPad",
    "BorderPad",
    "DivisiblePad",
    "Crop",
    "SpatialCrop",
    "CenterSpatialCrop",
    "CenterScaleCrop",
    "RandSpatialCrop",
    "RandScaleCrop",
    "RandSpatialCropSamples",
    "CropForeground",
    "RandWeightedCrop",
    "RandCropByPosNegLabel",
    "RandCropByLabelClasses",
    "ResizeWithPadOrCrop",
    "BoundingRect",
]


class _CropPadBase(InvertibleTransform, LazyTransform):
    """Shared: translate matrix + new shape pushed as pending op."""

    def __init__(self, lazy: bool = False):
        LazyTransform.__init__(self, lazy=lazy)

    def _op(self, img: Any, offset: Sequence[int], out_size: Sequence[int], padding_mode: str = "zeros",
            cval: float = 0.0, lazy: bool | None = None, extra_info: dict | None = None):
        """data_new[x] = data_old[x + offset]; out_size given.  Crop → offset>=0;
        pad → negative offsets."""
        lazy_ = self.lazy if lazy is None else lazy
        sr = len(out_size)
        M = np.eye(sr + 1, dtype=np.float64)
        M[:sr, sr] = np.asarray(offset, dtype=np.float64)
        if not isinstance(img, MetaImage) or not get_track_meta():
            from .lazy_utils import apply_affine_to_data

            data = img.data if isinstance(img, MetaImage) else img
            out = apply_affine_to_data(data, M, out_size, mode=0, padding_mode=padding_mode, cval=cval)
            return MetaImage(out) if isinstance(img, MetaImage) else out
        img = img.new_like(img.data)  # never mutate the caller's image
        self.push_transform(img, affine=M, sp_size=out_size, mode="nearest", padding_mode=padding_mode,
                            cval=cval, lazy=True, orig_size=img.peek_pending_shape(),
                            extra_info=extra_info or {})
        if lazy_:
            return img
        out, _ = apply_pending(img)
        return out


class Pad(_CropPadBase):
    """Pad by (before, after) per dim (reference: croppad/array.py:81)."""

    def __init__(self, to_pad: Sequence[tuple[int, int]] | None = None, mode: str = "constant",
                 lazy: bool = False, **kwargs):
        super().__init__(lazy=lazy)
        self.to_pad = to_pad
        self.mode = mode
        self.kwargs = kwargs

    def compute_pad_width(self, spatial_shape: Sequence[int]) -> list[tuple[int, int]]:
        return list(self.to_pad) if self.to_pad is not None else [(0, 0)] * len(spatial_shape)

    def __call__(self, img: Any, to_pad=None, mode=None, lazy: bool | None = None, **kwargs):
        img_m = MetaImage.ensure_meta(img) if isinstance(img, MetaImage) or get_track_meta() else img
        spatial_shape = img_m.peek_pending_shape() if isinstance(img_m, MetaImage) else img.shape[1:]
        to_pad_ = self.compute_pad_width(spatial_shape) if to_pad is None else list(to_pad)
        # drop channel-dim pad spec if present (len == ndim)
        if len(to_pad_) == len(spatial_shape) + 1:
            to_pad_ = to_pad_[1:]
        mode_ = mode or self.mode
        kwargs_ = dict(self.kwargs)
        kwargs_.update(kwargs)
        cval = kwargs_.get("constant_values", kwargs_.get("value", 0.0))
        offset = [-int(p[0]) for p in to_pad_]
        out_size = [int(s + p[0] + p[1]) for s, p in zip(spatial_shape, to_pad_)]
        return self._op(img_m if isinstance(img_m, MetaImage) else img, offset, out_size,
                        padding_mode=str(mode_), cval=cval, lazy=lazy,
                        extra_info={"padded": [list(p) for p in to_pad_]})


class SpatialPad(Pad):
    """Pad to a target spatial size (reference: croppad/array.py:186)."""

    def __init__(self, spatial_size: Sequence[int] | int, method: str = Method.SYMMETRIC,
                 mode: str = "constant", lazy: bool = False, **kwargs):
        self.spatial_size = spatial_size
        self.method = Method(method)
        super().__init__(mode=mode, lazy=lazy, **kwargs)

    def compute_pad_width(self, spatial_shape: Sequence[int]) -> list[tuple[int, int]]:
        spatial_size = fall_back_tuple(self.spatial_size, spatial_shape)
        if self.method == Method.SYMMETRIC:
            pad_width = []
            for i, sp_i in enumerate(spatial_size):
                width = max(sp_i - spatial_shape[i], 0)
                pad_width.append((int(width // 2), int(width - (width // 2))))
        else:
            pad_width = [(0, int(max(sp_i - spatial_shape[i], 0))) for i, sp_i in enumerate(spatial_size)]
        return pad_width


class BorderPad(Pad):
    """Pad by a border width spec (reference: croppad/array.py:263)."""

    def __init__(self, spatial_border: Sequence[int] | int, mode: str = "constant",
                 lazy: bool = False, **kwargs):
        self.spatial_border = spatial_border
        super().__init__(mode=mode, lazy=lazy, **kwargs)

    def compute_pad_width(self, spatial_shape: Sequence[int]) -> list[tuple[int, int]]:
        spatial_border = ensure_tuple(self.spatial_border)
        if not all(isinstance(b, int) for b in spatial_border):
            raise ValueError(f"self.spatial_border must contain only ints, got {spatial_border}.")
        spatial_border = tuple(max(0, b) for b in spatial_border)
        if len(spatial_border) == 1:
            data_pad_width = [(int(spatial_border[0]), int(spatial_border[0])) for _ in spatial_shape]
        elif len(spatial_border) == len(spatial_shape):
            data_pad_width = [(int(sp), int(sp)) for sp in spatial_border]
        elif len(spatial_border) == len(spatial_shape) * 2:
            data_pad_width = [(int(spatial_border[2 * i]), int(spatial_border[2 * i + 1]))
                              for i in range(len(spatial_shape))]
        else:
            raise ValueError(
                f"Unsupported spatial_border length: {len(spatial_border)}, available options are "
                f"[1, len(spatial_shape)={len(spatial_shape)}, 2*len(spatial_shape)={2*len(spatial_shape)}]."
            )
        return data_pad_width


class DivisiblePad(Pad):
    """Pad so each dim is divisible by k (reference: croppad/array.py:324)."""

    def __init__(self, k: Sequence[int] | int, mode: str = "constant", method: str = Method.SYMMETRIC,
                 lazy: bool = False, **kwargs):
        self.k = k
        self.method = Method(method)
        super().__init__(mode=mode, lazy=lazy, **kwargs)

    def compute_pad_width(self, spatial_shape: Sequence[int]) -> list[tuple[int, int]]:
        new_size = compute_divisible_spatial_size(spatial_shape, k=self.k)
        spatial_pad = SpatialPad(spatial_size=new_size, method=self.method)
        return spatial_pad.compute_pad_width(spatial_shape)


class Crop(_CropPadBase):
    """Crop by a list of slices (reference: croppad/array.py:381)."""

    @staticmethod
    def compute_slices(roi_center=None, roi_size=None, roi_start=None, roi_end=None,
                       roi_slices=None) -> tuple[slice, ...]:
        if roi_slices:
            if not all(s.step is None or s.step == 1 for s in roi_slices):
                raise ValueError(f"only slice steps of 1/None are currently supported, got {roi_slices}.")
            return ensure_tuple(roi_slices)
        if roi_center is not None and roi_size is not None:
            roi_center = np.asarray(roi_center, dtype=np.int64)
            roi_size = np.asarray(ensure_tuple_rep(roi_size, len(roi_center)))
            _zeros = np.zeros_like(roi_center)
            half = np.maximum(np.floor_divide(roi_size, 2), _zeros)
            roi_start = np.maximum(roi_center - half, _zeros)
            roi_end = np.maximum(roi_start + roi_size, roi_start)
        else:
            if roi_start is None or roi_end is None:
                raise ValueError("please specify either roi_center, roi_size or roi_start, roi_end.")
            roi_start = np.maximum(np.asarray(roi_start, dtype=np.int64), 0)
            roi_end = np.maximum(np.asarray(roi_end, dtype=np.int64), roi_start)
        return tuple(slice(int(s), int(e)) for s, e in zip(np.atleast_1d(roi_start), np.atleast_1d(roi_end)))

    def __call__(self, img: Any, slices: tuple[slice, ...] = None, lazy: bool | None = None):  # type: ignore
        img_m = MetaImage.ensure_meta(img) if isinstance(img, MetaImage) or get_track_meta() else img
        spatial_shape = img_m.peek_pending_shape() if isinstance(img_m, MetaImage) else img.shape[1:]
        sr = len(spatial_shape)
        slices_ = list(slices if slices is not None else [])
        if len(slices_) < sr:
            slices_ += [slice(None)] * (sr - len(slices_))
        offset, out_size = [], []
        for d, s in enumerate(slices_[:sr]):
            start = 0 if s.start is None else (s.start if s.start >= 0 else s.start + spatial_shape[d])
            stop = spatial_shape[d] if s.stop is None else (s.stop if s.stop >= 0 else s.stop + spatial_shape[d])
            # python-slicing semantics: a slice never extends past the array
            # (a too-large ROI crops nothing in that dim, reference croppad/array.py:374)
            start = min(max(start, 0), spatial_shape[d])
            stop = min(max(stop, start), spatial_shape[d])
            offset.append(int(start))
            out_size.append(int(stop - start))
        return self._op(img_m if isinstance(img_m, MetaImage) else img, offset, out_size, lazy=lazy)


class SpatialCrop(Crop):
    """Crop by center+size or start/end (reference: croppad/array.py:447)."""

    def __init__(self, roi_center=None, roi_size=None, roi_start=None, roi_end=None, roi_slices=None,
                 lazy: bool = False):
        super().__init__(lazy=lazy)
        self.slices = self.compute_slices(roi_center, roi_size, roi_start, roi_end, roi_slices)

    def __call__(self, img: Any, lazy: bool | None = None):
        return super().__call__(img=img, slices=ensure_tuple(self.slices), lazy=lazy)


class CenterSpatialCrop(Crop):
    """Center crop (reference: croppad/array.py:508)."""

    def __init__(self, roi_size: Sequence[int] | int, lazy: bool = False):
        super().__init__(lazy=lazy)
        self.roi_size = roi_size

    def compute_slices_for(self, spatial_size: Sequence[int]):  # helper
        roi_size = fall_back_tuple(self.roi_size, spatial_size)
        roi_center = [i // 2 for i in spatial_size]
        return self.compute_slices(roi_center=roi_center, roi_size=roi_size)

    def __call__(self, img: Any, lazy: bool | None = None):
        spatial_shape = img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:]
        return super().__call__(img=img, slices=self.compute_slices_for(spatial_shape), lazy=lazy)


class CenterScaleCrop(CenterSpatialCrop):
    """Center crop by scale of image size (reference: croppad/array.py:547)."""

    def __init__(self, roi_scale: Sequence[float] | float, lazy: bool = False):
        super().__init__(roi_size=-1, lazy=lazy)
        self.roi_scale = roi_scale

    def __call__(self, img: Any, lazy: bool | None = None):
        img_size = (img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:])
        ndim = len(img_size)
        self.roi_size = [ceil(r * s) for r, s in zip(ensure_tuple_rep(self.roi_scale, ndim), img_size)]
        return super().__call__(img=img, lazy=lazy)


class RandSpatialCrop(Randomizable, Crop):
    """Random crop of fixed or random size (reference: croppad/array.py:574)."""

    def __init__(self, roi_size: Sequence[int] | int, max_roi_size=None, random_center: bool = True,
                 random_size: bool = False, lazy: bool = False):
        Crop.__init__(self, lazy=lazy)
        self.roi_size = roi_size
        self.max_roi_size = max_roi_size
        self.random_center = random_center
        self.random_size = random_size
        self._size: Sequence[int] | None = None
        self._slices: tuple[slice, ...] | None = None

    def randomize(self, img_size: Sequence[int]) -> None:
        self._size = fall_back_tuple(self.roi_size, img_size)
        if self.random_size:
            max_size = img_size if self.max_roi_size is None else fall_back_tuple(self.max_roi_size, img_size)
            if any(i > j for i, j in zip(self._size, max_size)):
                raise ValueError(f"min ROI size: {self._size} is larger than max ROI size: {max_size}.")
            self._size = tuple(self.R.randint(low=self._size[i], high=max_size[i] + 1) for i in range(len(img_size)))
        if self.random_center:
            valid_size = [i - s for i, s in zip(img_size, self._size)]
            starts = [self.R.randint(0, v + 1) for v in valid_size]
            self._slices = tuple(slice(st, st + sz) for st, sz in zip(starts, self._size))

    def __call__(self, img: Any, randomize: bool = True, lazy: bool | None = None):
        img_size = img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:]
        if randomize:
            self.randomize(img_size)
        if self._size is None:
            raise RuntimeError("self._size not specified.")
        if self.random_center:
            return super().__call__(img=img, slices=self._slices, lazy=lazy)
        cropper = CenterSpatialCrop(self._size)
        cropper.lazy = self.lazy if lazy is None else lazy
        return cropper(img)


class RandScaleCrop(RandSpatialCrop):
    """Random crop sized by scale of image (reference: croppad/array.py:634)."""

    def __init__(self, roi_scale: Sequence[float] | float, max_roi_scale=None, random_center: bool = True,
                 random_size: bool = False, lazy: bool = False):
        super().__init__(roi_size=-1, max_roi_size=None, random_center=random_center,
                         random_size=random_size, lazy=lazy)
        self.roi_scale = roi_scale
        self.max_roi_scale = max_roi_scale

    def get_max_roi_size(self, img_size):
        ndim = len(img_size)
        self.roi_size = [ceil(r * s) for r, s in zip(ensure_tuple_rep(self.roi_scale, ndim), img_size)]
        if self.max_roi_scale is not None:
            self.max_roi_size = [ceil(r * s) for r, s in zip(ensure_tuple_rep(self.max_roi_scale, ndim), img_size)]
        else:
            self.max_roi_size = None

    def randomize(self, img_size: Sequence[int]) -> None:
        self.get_max_roi_size(img_size)
        super().randomize(img_size)

    def __call__(self, img: Any, randomize: bool = True, lazy: bool | None = None):
        self.get_max_roi_size(img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:])
        return super().__call__(img=img, randomize=randomize, lazy=lazy)


class RandSpatialCropSamples(Randomizable, Transform, MultiSampleTrait):
    """N random crops from one image (reference: croppad/array.py:684)."""

    def __init__(self, roi_size, num_samples: int, max_roi_size=None, random_center: bool = True,
                 random_size: bool = False, lazy: bool = False):
        if num_samples < 1:
            raise ValueError(f"num_samples must be positive, got {num_samples}.")
        self.num_samples = num_samples
        self.cropper = RandSpatialCrop(roi_size, max_roi_size, random_center, random_size, lazy)

    @property
    def lazy(self):
        return self.cropper.lazy

    @lazy.setter
    def lazy(self, val):
        self.cropper.lazy = val

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.cropper.set_random_state(state=self.R)
        return self

    def randomize(self, data=None) -> None:
        pass

    def inverse(self, data):
        """Each sample carries the inner cropper's applied-op record; delegate."""
        return self.cropper.inverse(data)

    def __call__(self, img: Any, lazy: bool | None = None) -> list:
        ret = []
        for i in range(self.num_samples):
            cropped = self.cropper(img, lazy=lazy)
            if isinstance(cropped, MetaImage):
                cropped.meta["patch_index"] = i
            ret.append(cropped)
        return ret


class CropForeground(Crop):
    """Crop to the foreground bounding box (reference: croppad/array.py:744)."""

    def __init__(self, select_fn: Callable = is_positive, channel_indices=None, margin: Sequence[int] | int = 0,
                 allow_smaller: bool = True, return_coords: bool = False, k_divisible: Sequence[int] | int = 1,
                 mode: str = "constant", lazy: bool = False, **pad_kwargs):
        super().__init__(lazy=lazy)
        self.select_fn = select_fn
        self.channel_indices = ensure_tuple(channel_indices) if channel_indices is not None else None
        self.margin = margin
        self.allow_smaller = allow_smaller
        self.return_coords = return_coords
        self.k_divisible = k_divisible
        self.padder = Pad(mode=mode, lazy=lazy, **pad_kwargs)

    @property
    def requires_current_data(self):
        return True

    def compute_bounding_box(self, img: Any):
        box_start, box_end = generate_spatial_bounding_box(
            img, self.select_fn, self.channel_indices, self.margin, self.allow_smaller
        )
        box_start_ = np.asarray(box_start, dtype=np.int16)
        box_end_ = np.asarray(box_end, dtype=np.int16)
        orig_spatial_size = box_end_ - box_start_
        spatial_size = np.asarray(compute_divisible_spatial_size(orig_spatial_size.tolist(), k=self.k_divisible))
        box_start_ = box_start_ - np.floor_divide(np.asarray(spatial_size) - orig_spatial_size, 2)
        box_end_ = box_start_ + spatial_size
        return box_start_, box_end_

    def crop_pad(self, img: Any, box_start: np.ndarray, box_end: np.ndarray, mode=None,
                 lazy: bool | None = None, **pad_kwargs):
        lazy_ = self.lazy if lazy is None else lazy
        slices = self.compute_slices(roi_start=np.maximum(box_start, 0), roi_end=np.maximum(box_end, 0))
        cropped = super().__call__(img=img, slices=slices, lazy=lazy_)
        spatial_shape = img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:]
        pad_to_start = np.maximum(-box_start, 0)
        pad_to_end = np.maximum(box_end - np.asarray(spatial_shape), 0)
        pad_width = list(zip(pad_to_start.tolist(), pad_to_end.tolist()))
        pad_kw = dict(self.padder.kwargs)
        pad_kw.update(pad_kwargs)
        ret = self.padder(cropped, to_pad=pad_width, mode=mode, lazy=lazy_, **pad_kw)
        return ret

    def __call__(self, img: Any, mode=None, lazy: bool | None = None, **pad_kwargs):
        box_start, box_end = self.compute_bounding_box(img)
        cropped = self.crop_pad(img, box_start, box_end, mode, lazy=lazy, **pad_kwargs)
        if self.return_coords:
            return cropped, box_start, box_end
        return cropped

    def inverse(self, img):
        # two recorded ops: pad then crop
        img = self.padder.inverse(img)
        return Crop.inverse(self, img)


class RandWeightedCrop(Randomizable, Transform, MultiSampleTrait):
    """Crops with centers sampled ∝ weight map (reference: croppad/array.py:858)."""

    def __init__(self, spatial_size: Sequence[int] | int, num_samples: int = 1, weight_map=None,
                 lazy: bool = False):
        self.spatial_size = ensure_tuple(spatial_size)
        self.num_samples = int(num_samples)
        self.weight_map = weight_map
        self.centers: list = []
        self._lazy = lazy

    @property
    def lazy(self):
        return self._lazy

    @lazy.setter
    def lazy(self, val):
        self._lazy = val

    def randomize(self, weight_map) -> None:
        self.centers = weighted_patch_samples(
            spatial_size=self.spatial_size,
            w=weight_map.data[0] if isinstance(weight_map, MetaImage) else weight_map[0],
            n_samples=self.num_samples, r_state=self.R)

    def __call__(self, img: Any, weight_map=None, randomize: bool = True, lazy: bool | None = None) -> list:
        if weight_map is None:
            weight_map = self.weight_map
        if weight_map is None:
            raise ValueError("weight map must be provided for weighted patch sampling.")
        img_shape = img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:]
        w_shape = weight_map.shape[1:]
        if tuple(img_shape) != tuple(w_shape):
            raise ValueError(f"image and weight map spatial shape mismatch: {img_shape} vs {w_shape}.")
        if randomize:
            self.randomize(weight_map)
        _spatial_size = fall_back_tuple(self.spatial_size, img_shape)
        lazy_ = self._lazy if lazy is None else lazy
        results = []
        for i, center in enumerate(self.centers):
            cropper = SpatialCrop(roi_center=center, roi_size=_spatial_size)
            cropper.lazy = lazy_
            cropped = cropper(img)
            if isinstance(cropped, MetaImage):
                cropped.meta["patch_index"] = i
            results.append(cropped)
        return results


class RandCropByPosNegLabel(Randomizable, Transform, MultiSampleTrait):
    """Balanced fg/bg random crops (reference: croppad/array.py:942)."""

    def __init__(self, spatial_size: Sequence[int] | int, label=None, pos: float = 1.0, neg: float = 1.0,
                 num_samples: int = 1, image=None, image_threshold: float = 0.0, fg_indices=None,
                 bg_indices=None, allow_smaller: bool = False, lazy: bool = False):
        self.spatial_size = spatial_size
        self.label = label
        if pos < 0 or neg < 0:
            raise ValueError(f"pos and neg must be nonnegative, got pos={pos} neg={neg}.")
        if pos + neg == 0:
            raise ValueError("Incompatible values: pos=0 and neg=0.")
        self.pos_ratio = pos / (pos + neg)
        self.num_samples = num_samples
        self.image = image
        self.image_threshold = image_threshold
        self.centers: list | None = None
        self.fg_indices = fg_indices
        self.bg_indices = bg_indices
        self.allow_smaller = allow_smaller
        self._lazy = lazy

    @property
    def lazy(self):
        return self._lazy

    @lazy.setter
    def lazy(self, val):
        self._lazy = val

    def randomize(self, label, fg_indices=None, bg_indices=None, image=None) -> None:
        spatial_size = label.shape[1:]
        if fg_indices is None or bg_indices is None:
            fg_indices_, bg_indices_ = map_binary_to_indices(label, image, self.image_threshold)
        else:
            fg_indices_, bg_indices_ = fg_indices, bg_indices
        self.centers = generate_pos_neg_label_crop_centers(
            self.spatial_size, self.num_samples, self.pos_ratio, spatial_size,
            fg_indices_, bg_indices_, self.R, self.allow_smaller)

    def __call__(self, img: Any, label=None, image=None, fg_indices=None, bg_indices=None,
                 randomize: bool = True, lazy: bool | None = None) -> list:
        if label is None:
            label = self.label
        if label is None:
            raise ValueError("label must be provided.")
        if image is None:
            image = self.image
        if fg_indices is None:
            fg_indices = self.fg_indices
        if bg_indices is None:
            bg_indices = self.bg_indices
        if randomize:
            self.randomize(label, fg_indices, bg_indices, image)
        results = []
        if self.centers is not None:
            img_shape = img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:]
            roi_size = fall_back_tuple(self.spatial_size, default=img_shape)
            lazy_ = self._lazy if lazy is None else lazy
            for i, center in enumerate(self.centers):
                cropper = SpatialCrop(roi_center=center, roi_size=roi_size)
                cropper.lazy = lazy_
                cropped = cropper(img)
                if isinstance(cropped, MetaImage):
                    cropped.meta["patch_index"] = i
                results.append(cropped)
        return results


class RandCropByLabelClasses(Randomizable, Transform, MultiSampleTrait):
    """Crops with per-class center sampling (reference: croppad/array.py:1074)."""

    def __init__(self, spatial_size: Sequence[int] | int, ratios: list | None = None, label=None,
                 num_classes: int | None = None, num_samples: int = 1, image=None,
                 image_threshold: float = 0.0, indices=None, allow_smaller: bool = False,
                 warn: bool = True, max_samples_per_class: int | None = None, lazy: bool = False):
        self.spatial_size = spatial_size
        self.ratios = ratios
        self.label = label
        self.num_classes = num_classes
        self.num_samples = num_samples
        self.image = image
        self.image_threshold = image_threshold
        self.centers: list | None = None
        self.indices = indices
        self.allow_smaller = allow_smaller
        self.warn = warn
        self.max_samples_per_class = max_samples_per_class
        self._lazy = lazy

    @property
    def lazy(self):
        return self._lazy

    @lazy.setter
    def lazy(self, val):
        self._lazy = val

    def randomize(self, label, indices=None, image=None) -> None:
        indices_ = self.indices if indices is None else indices
        if indices_ is None:
            indices_ = map_classes_to_indices(label, self.num_classes, image, self.image_threshold,
                                              self.max_samples_per_class)
        self.centers = generate_label_classes_crop_centers(
            self.spatial_size, self.num_samples, label.shape[1:], indices_, self.ratios,
            self.R, self.allow_smaller, self.warn)

    def __call__(self, img: Any, label=None, image=None, indices=None, randomize: bool = True,
                 lazy: bool | None = None) -> list:
        if label is None:
            label = self.label
        if label is None:
            raise ValueError("label must be provided.")
        if image is None:
            image = self.image
        if randomize:
            self.randomize(label, indices, image)
        results = []
        if self.centers is not None:
            img_shape = img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:]
            roi_size = fall_back_tuple(self.spatial_size, default=img_shape)
            lazy_ = self._lazy if lazy is None else lazy
            for i, center in enumerate(self.centers):
                cropper = SpatialCrop(roi_center=center, roi_size=roi_size)
                cropper.lazy = lazy_
                cropped = cropper(img)
                if isinstance(cropped, MetaImage):
                    cropped.meta["patch_index"] = i
                results.append(cropped)
        return results


class ResizeWithPadOrCrop(InvertibleTransform, LazyTransform):
    """Pad or central-crop to target size (reference: croppad/array.py:1298)."""

    def __init__(self, spatial_size: Sequence[int] | int, method: str = Method.SYMMETRIC,
                 mode: str = "constant", lazy: bool = False, **pad_kwargs):
        LazyTransform.__init__(self, lazy=lazy)
        self.padder = SpatialPad(spatial_size=spatial_size, method=method, mode=mode, lazy=lazy, **pad_kwargs)
        self.cropper = CenterSpatialCrop(roi_size=spatial_size, lazy=lazy)

    @LazyTransform.lazy.setter  # type: ignore
    def lazy(self, val):
        self._lazy = val
        self.padder.lazy = val
        self.cropper.lazy = val

    def __call__(self, img: Any, mode=None, lazy: bool | None = None, **pad_kwargs):
        lazy_ = self.lazy if lazy is None else lazy
        return self.padder(self.cropper(img, lazy=lazy_), mode=mode, lazy=lazy_, **pad_kwargs)

    def inverse(self, img):
        img = self.padder.inverse(img)
        return self.cropper.inverse(img)


class BoundingRect(Transform):
    """Foreground bounding rectangle coordinates (reference: croppad/array.py:1404)."""

    def __init__(self, select_fn: Callable = is_positive):
        self.select_fn = select_fn

    def __call__(self, img: Any) -> np.ndarray:
        bbox = []
        data = img.data if isinstance(img, MetaImage) else img
        from ..utils.backend import to_numpy

        for channel in range(data.shape[0]):
            start_, end_ = generate_spatial_bounding_box(
                to_numpy(data)[channel:channel + 1], select_fn=self.select_fn)
            bbox.append([i for k in zip(start_, end_) for i in k])
        return np.stack(bbox, axis=0)


class PadListDataCollate(InvertibleTransform):
    """Collate a list of samples with differing spatial sizes by padding to the max
    per-dimension size (reference: croppad/batch.py:40 PadListDataCollate). The pad
    amounts are recorded so `inverse` can crop each decollated item back."""

    def __init__(self, method: str = "symmetric", mode: str = "constant", **kwargs):
        self.method = method
        self.mode = mode
        self.kwargs = kwargs

    def __call__(self, batch: Any):
        from ..data.utils import pad_list_data_collate

        return pad_list_data_collate(batch, method=self.method, mode=self.mode,
                                     **self.kwargs)

    @staticmethod
    def inverse(data: dict) -> dict:
        d = dict(data)
        for key, item in list(d.items()):
            if isinstance(item, MetaImage) and item.applied_operations:
                last = item.applied_operations[-1]
                if last.get(TraceKeys.CLASS_NAME) == "SpatialPad":
                    d[key] = SpatialPad(last[TraceKeys.ORIG_SIZE]).inverse(item)
        return d


def replace_element(to_replace, batch, idx, key_or_idx):
    """Replace one element of a collated batch entry, recreating tuples since
    they are immutable (reference: transforms/croppad/batch.py:32)."""
    if isinstance(batch[idx], tuple):
        batch_idx_list = list(batch[idx])
        batch_idx_list[key_or_idx] = to_replace
        batch[idx] = tuple(batch_idx_list)
    else:
        batch[idx][key_or_idx] = to_replace
    return batch
