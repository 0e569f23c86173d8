"""Utility transforms (array API).

Parity targets: monai/transforms/utility/array.py:116-1815 (EnsureChannelFirst, CastToType,
ToTensor→ToJax, Lambda, SplitDim, DataStats, LabelToMask, FgBgToIndices,
ConvertToMultiChannelBasedOnBratsClasses, AddExtremePointsChannel, MapLabelValue, ...).
"""
from __future__ import annotations

import logging
import sys
import time
from collections.abc import Callable, Hashable, Mapping, Sequence
from typing import Any

import numpy as np

from ..data.meta_image import MetaImage, get_track_meta
from ..utils.backend import is_jax, to_jax, to_numpy, xp
from ..utils.enums import MetaKeys, TraceKeys
from ..utils.misc import ensure_tuple, ensure_tuple_rep, issequenceiterable
from ..utils.type_conversion import convert_to_dst_type
from .inverse import InvertibleTransform
from .traits import RandomizableTrait
from .transform import Randomizable, RandomizableTransform, Transform
from .utils import (
    extreme_points_to_image,
    get_extreme_points,
    map_binary_to_indices,
    map_classes_to_indices,
)

__all__ = [
    "Identity",
    "AsChannelLast",
    "EnsureChannelFirst",
    "RepeatChannel",
    "RemoveRepeatedChannel",
    "SplitDim",
    "CastToType",
    "ToJax",
    "ToNumpy",
    "EnsureType",
    "Transpose",
    "SqueezeDim",
    "DataStats",
    "SimulateDelay",
    "Lambda",
    "RandLambda",
    "LabelToMask",
    "FgBgToIndices",
    "ClassesToIndices",
    "ConvertToMultiChannelBasedOnBratsClasses",
    "AddExtremePointsChannel",
    "MapLabelValue",
    "IntensityStats",
    "AddCoordinateChannels",
    "ToDevice",
    "ApplyTransformToPoints",
    "ImageFilter",
    "RandImageFilter",
    "TorchVision",
    "TorchIO",
    "CuCIM",
    "RandIdentity",
    "ToPIL",
    "ToCupy",
    "ConvertBoxToPoints",
    "ConvertPointsToBoxes",
    "RandTorchVision",
    "RandTorchIO",
    "RandCuCIM",
]


class Identity(Transform):
    """Identity (reference: utility/array.py:116)."""

    def __call__(self, img: Any):
        return img


class AsChannelLast(Transform):
    """Move channel dim to the end (reference: utility/array.py:157)."""

    def __init__(self, channel_dim: int = 0):
        self.channel_dim = channel_dim

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        out = xp(data).moveaxis(data, self.channel_dim, -1)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class EnsureChannelFirst(Transform):
    """Adjust/add the channel dimension using metadata (reference: utility/array.py:184)."""

    def __init__(self, strict_check: bool = True, channel_dim: None | str | int = None):
        self.strict_check = strict_check
        self.input_channel_dim = channel_dim

    def __call__(self, img: Any, meta_dict: Mapping | None = None):
        if isinstance(img, MetaImage):
            meta_dict = img.meta
        channel_dim = (meta_dict or {}).get(MetaKeys.ORIGINAL_CHANNEL_DIM, None) \
            if self.input_channel_dim is None else self.input_channel_dim
        if channel_dim is None:
            msg = "Unknown original_channel_dim in the MetaImage meta dict or `meta_dict` or `channel_dim`."
            if self.strict_check:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg)
            return img
        data = img.data if isinstance(img, MetaImage) else img
        if channel_dim == "no_channel":
            out = data[None]
        else:
            out = xp(data).moveaxis(data, int(channel_dim), 0)
        if isinstance(img, MetaImage):
            res = img.new_like(out)
            res.meta[MetaKeys.ORIGINAL_CHANNEL_DIM] = channel_dim
            return res
        return out


class RepeatChannel(Transform):
    """Repeat channel dim N times (reference: utility/array.py:240)."""

    def __init__(self, repeats: int):
        if repeats <= 0:
            raise ValueError(f"repeats count must be greater than 0, got {repeats}.")
        self.repeats = repeats

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        out = xp(data).repeat(data, self.repeats, axis=0)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class RemoveRepeatedChannel(Transform):
    """Inverse of RepeatChannel (reference: utility/array.py:266)."""

    def __init__(self, repeats: int):
        if repeats <= 0:
            raise ValueError(f"repeats count must be greater than 0, got {repeats}.")
        self.repeats = repeats

    def __call__(self, img: Any):
        if img.shape[0] < 2:
            raise ValueError(f"Image must have more than one channel, got {img.shape[0]} channels.")
        data = img.data if isinstance(img, MetaImage) else img
        out = data[:: self.repeats]
        return img.new_like(out) if isinstance(img, MetaImage) else out


class SplitDim(Transform):
    """Split one dim into a list of arrays (reference: utility/array.py:295)."""

    def __init__(self, dim: int = -1, keepdim: bool = True, update_meta: bool = True):
        self.dim = dim
        self.keepdim = keepdim
        self.update_meta = update_meta

    def __call__(self, img: Any) -> list:
        n_out = img.shape[self.dim]
        if n_out <= 1:
            raise RuntimeError(f"Input image is singleton along dimension to be split, got shape {img.shape}.")
        data = img.data if isinstance(img, MetaImage) else img
        ns = xp(data)
        outs = []
        for i in range(n_out):
            idx = [slice(None)] * data.ndim
            idx[self.dim] = slice(i, i + 1) if self.keepdim else i
            sub = data[tuple(idx)]
            outs.append(img.new_like(sub) if isinstance(img, MetaImage) else sub)
        return outs


class CastToType(Transform):
    """Cast dtype (reference: utility/array.py:342)."""

    def __init__(self, dtype=np.float32):
        self.dtype = dtype

    def __call__(self, img: Any, dtype=None):
        d = self.dtype if dtype is None else dtype
        data = img.data if isinstance(img, MetaImage) else img
        out = data.astype(d)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class ToJax(Transform):
    """Move data to a jax device array (the reference's ToTensor analog,
    utility/array.py:372)."""

    def __init__(self, dtype=None, device=None, track_meta: bool | None = None):
        self.dtype = dtype
        self.device = device
        self.track_meta = track_meta

    def __call__(self, img: Any):
        if isinstance(img, MetaImage):
            out = to_jax(img.data, dtype=self.dtype)
            if self.track_meta is False:
                return out
            return img.new_like(out)
        return to_jax(img, dtype=self.dtype)


ToTensor = ToJax  # familiarity alias


class ToNumpy(Transform):
    """Move data to host numpy (reference: utility/array.py:455)."""

    def __init__(self, dtype=None, wrap_sequence: bool = True):
        self.dtype = dtype
        self.wrap_sequence = wrap_sequence

    def __call__(self, img: Any):
        if isinstance(img, MetaImage):
            return img.new_like(to_numpy(img.data, dtype=self.dtype))
        return to_numpy(img, dtype=self.dtype)


class EnsureType(Transform):
    """Ensure array kind: 'jax' or 'numpy' (reference: utility/array.py:409 EnsureType)."""

    def __init__(self, data_type: str = "jax", dtype=None, device=None, wrap_sequence: bool = True,
                 track_meta: bool | None = None):
        if data_type not in ("jax", "numpy", "tensor"):
            raise ValueError(f"data_type must be 'jax' or 'numpy', got {data_type}")
        self.data_type = "jax" if data_type in ("jax", "tensor") else "numpy"
        self.dtype = dtype
        self.device = device
        self.wrap_sequence = wrap_sequence
        self.track_meta = track_meta

    def __call__(self, data: Any):
        if isinstance(data, dict):
            return {k: self(v) for k, v in data.items()}
        if isinstance(data, (list, tuple)):
            return type(data)(self(v) for v in data)
        if isinstance(data, MetaImage):
            new = to_jax(data.data, self.dtype) if self.data_type == "jax" else to_numpy(data.data, self.dtype)
            if self.track_meta is False:
                return new
            return data.new_like(new)
        if isinstance(data, (np.ndarray, float, int, bool)) or is_jax(data):
            return to_jax(data, self.dtype) if self.data_type == "jax" else to_numpy(data, self.dtype)
        return data


class Transpose(Transform):
    """Permute dims (reference: utility/array.py:511)."""

    def __init__(self, indices: Sequence[int] | None):
        self.indices = None if indices is None else tuple(indices)

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        out = xp(data).transpose(data, self.indices)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class SqueezeDim(Transform):
    """Squeeze a dim (reference: utility/array.py:532)."""

    def __init__(self, dim: int | None = 0, update_meta: bool = True):
        if dim is not None and not isinstance(dim, int):
            raise TypeError(f"dim must be None or a int but is {type(dim).__name__}.")
        self.dim = dim

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        ns = xp(data)
        if self.dim is None:
            out = ns.squeeze(data)
        else:
            if data.shape[self.dim] != 1:
                out = data
            else:
                out = ns.squeeze(data, axis=self.dim)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class DataStats(Transform):
    """Log data statistics for debugging (reference: utility/array.py:581)."""

    def __init__(self, prefix: str = "Data", data_type: bool = True, data_shape: bool = True,
                 value_range: bool = True, data_value: bool = False, meta_info: bool = False,
                 additional_info: Callable | None = None, name: str = "DataStats"):
        if not isinstance(prefix, str):
            raise ValueError(f"prefix must be a string, got {type(prefix)}.")
        self.prefix = prefix
        self.data_type = data_type
        self.data_shape = data_shape
        self.value_range = value_range
        self.data_value = data_value
        self.meta_info = meta_info
        self.additional_info = additional_info
        self._logger_name = name
        _logger = logging.getLogger(self._logger_name)
        _logger.setLevel(logging.INFO)
        if not _logger.handlers:
            console = logging.StreamHandler(sys.stdout)
            console.setLevel(logging.INFO)
            _logger.addHandler(console)

    def __call__(self, img: Any, prefix=None, data_type=None, data_shape=None, value_range=None,
                 data_value=None, meta_info=None, additional_info=None):
        lines = [f"{prefix or self.prefix} statistics:"]
        data = img.data if isinstance(img, MetaImage) else img
        if self.data_type if data_type is None else data_type:
            lines.append(f"Type: {type(data)} {getattr(data, 'dtype', None)}")
        if self.data_shape if data_shape is None else data_shape:
            lines.append(f"Shape: {getattr(data, 'shape', None)}")
        if self.value_range if value_range is None else value_range:
            if hasattr(data, "dtype") and np.issubdtype(np.dtype(str(data.dtype)), np.number):
                lines.append(f"Value range: ({np.min(to_numpy(data))}, {np.max(to_numpy(data))})")
            else:
                lines.append("Value range: (not a numeric array)")
        if self.data_value if data_value is None else data_value:
            lines.append(f"Value: {data}")
        if (self.meta_info if meta_info is None else meta_info) and isinstance(img, MetaImage):
            lines.append(f"Meta info: {img.meta}")
        additional_info = self.additional_info if additional_info is None else additional_info
        if additional_info is not None:
            lines.append(f"Additional info: {additional_info(img)}")
        logging.getLogger(self._logger_name).info("\n".join(lines) + "\n")
        return img


class SimulateDelay(Transform):
    """Inject latency for testing (reference: utility/array.py:748)."""

    def __init__(self, delay_time: float = 0.0):
        self.delay_time = delay_time

    def __call__(self, img: Any, delay_time=None):
        time.sleep(self.delay_time if delay_time is None else delay_time)
        return img


class Lambda(InvertibleTransform):
    """Wrap a callable (reference: utility/array.py:781)."""

    def __init__(self, func: Callable | None = None, inv_func: Callable = None, track_meta: bool = True):
        if func is not None and not callable(func):
            raise TypeError(f"func must be None or callable but is {type(func).__name__}.")
        self.func = func
        self.inv_func = inv_func
        self.track_meta = track_meta

    def __call__(self, img: Any, func: Callable | None = None):
        fn = func if func is not None else self.func
        if not callable(fn):
            raise ValueError("Incompatible values: func=None and self.func=None.")
        return fn(img)

    def inverse(self, data: Any):
        if callable(self.inv_func):
            return self.inv_func(data)
        return data


class RandLambda(Randomizable, Lambda):
    """Lambda with probability gate (reference: utility/array.py:833)."""

    def __init__(self, func: Callable | None = None, prob: float = 1.0, inv_func: Callable = None,
                 track_meta: bool = True):
        Lambda.__init__(self, func=func, inv_func=inv_func, track_meta=track_meta)
        self.prob = min(max(prob, 0.0), 1.0)
        self._do_transform = True

    def randomize(self, data: Any) -> None:
        self._do_transform = self.R.rand() < self.prob

    def __call__(self, img: Any, func: Callable | None = None):
        self.randomize(img)
        return super().__call__(img, func) if self._do_transform else img

    def inverse(self, data: Any):
        return super().inverse(data) if self._do_transform else data


class LabelToMask(Transform):
    """Select labels into a binary mask (reference: utility/array.py:880)."""

    def __init__(self, select_labels: Sequence[int] | int, merge_channels: bool = False):
        self.select_labels = ensure_tuple(select_labels)
        self.merge_channels = merge_channels

    def __call__(self, img: Any, select_labels=None, merge_channels=None):
        select_labels = ensure_tuple(select_labels) if select_labels is not None else self.select_labels
        merge_channels = self.merge_channels if merge_channels is None else merge_channels
        data = img.data if isinstance(img, MetaImage) else img
        ns = xp(data)
        if data.shape[0] > 1:
            out = data[np.asarray(list(select_labels))]  # jax rejects bare-list fancy indexing
        else:
            out = ns.isin(data, ns.asarray(list(select_labels)) if ns is not np else np.asarray(list(select_labels)))
        if merge_channels:
            out = ns.any(out, axis=0, keepdims=True)
        out = out.astype(data.dtype) if out.dtype == bool else out
        return img.new_like(out) if isinstance(img, MetaImage) else out


class FgBgToIndices(Transform):
    """Precompute fg/bg indices (reference: utility/array.py:939)."""

    def __init__(self, image_threshold: float = 0.0, output_shape: Sequence[int] | None = None):
        self.image_threshold = image_threshold
        self.output_shape = output_shape

    def __call__(self, label: Any, image: Any = None, output_shape=None):
        if output_shape is None:
            output_shape = self.output_shape
        fg_indices, bg_indices = map_binary_to_indices(label, image, self.image_threshold)
        if output_shape is not None:
            fg_indices = np.stack([np.unravel_index(i, output_shape) for i in fg_indices])
            bg_indices = np.stack([np.unravel_index(i, output_shape) for i in bg_indices])
        return fg_indices, bg_indices


class ClassesToIndices(Transform):
    """Per-class indices (reference: utility/array.py:987)."""

    def __init__(self, num_classes: int | None = None, image_threshold: float = 0.0,
                 output_shape=None, max_samples_per_class: int | None = None):
        self.num_classes = num_classes
        self.image_threshold = image_threshold
        self.output_shape = output_shape
        self.max_samples_per_class = max_samples_per_class

    def __call__(self, label: Any, image: Any = None, output_shape=None):
        if output_shape is None:
            output_shape = self.output_shape
        indices = map_classes_to_indices(label, self.num_classes, image, self.image_threshold,
                                         self.max_samples_per_class)
        if output_shape is not None:
            indices = [np.stack([np.unravel_index(i, output_shape) for i in array]) for array in indices]
        return indices


class ConvertToMultiChannelBasedOnBratsClasses(Transform):
    """BraTS label → TC/WT/ET channels (reference: utility/array.py:1045).

    label 1 is the necrotic/non-enhancing tumor core, 2 the peritumoral edema,
    4 (or 3) the GD-enhancing tumor.
    """

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        if data.ndim == 4 and data.shape[0] == 1:
            data = data[0] if not isinstance(data, np.ndarray) else np.squeeze(data, axis=0)
        ns = xp(data)
        tc = (data == 1) | (data == 4) | (data == 3)
        wt = (data == 1) | (data == 4) | (data == 3) | (data == 2)
        et = (data == 4) | (data == 3)
        out = ns.stack([tc, wt, et], axis=0).astype(np.float32 if ns is np else data.dtype)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class AddExtremePointsChannel(Randomizable, Transform):
    """Append gaussian heatmap of extreme points (reference: utility/array.py:1097)."""

    def __init__(self, background: int = 0, pert: float = 0.0):
        self._background = background
        self._pert = pert
        self._points: list = []

    def randomize(self, label: Any) -> None:
        self._points = get_extreme_points(label, rand_state=self.R, background=self._background,
                                          pert=self._pert)

    def __call__(self, img: Any, label: Any = None, sigma=3.0, rescale_min: float = -1.0,
                 rescale_max: float = 1.0):
        if label is None:
            raise ValueError("This transform requires a label array!")
        label_data = label.data if isinstance(label, MetaImage) else label
        if label_data.shape[0] != 1:
            raise ValueError(f"Only supports single channel labels, got {label_data.shape[0]} channels!")
        self.randomize(label_data[0])
        data = img.data if isinstance(img, MetaImage) else img
        points_image = extreme_points_to_image(self._points, label_data, sigma, rescale_min, rescale_max)
        pi, *_ = convert_to_dst_type(points_image, data)
        out = xp(data).concatenate([data, pi], axis=0)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class MapLabelValue(Transform):
    """Remap label values (reference: utility/array.py:1164)."""

    def __init__(self, orig_labels: Sequence, target_labels: Sequence, dtype=np.float32):
        if len(orig_labels) != len(target_labels):
            raise ValueError("orig_labels and target_labels must have the same length.")
        self.orig_labels = orig_labels
        self.target_labels = target_labels
        self.pair = tuple((o, t) for o, t in zip(self.orig_labels, self.target_labels) if o != t)
        self.dtype = dtype

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        data_np = to_numpy(data)
        out = np.asarray(data_np, dtype=self.dtype).copy()
        for o, t in self.pair:
            out[data_np == o] = t
        res, *_ = convert_to_dst_type(out, data, dtype=self.dtype)
        return img.new_like(res) if isinstance(img, MetaImage) else res


class IntensityStats(Transform):
    """Compute intensity statistics into meta dict (reference: utility/array.py:1217)."""

    def __init__(self, ops: Sequence[str | Callable], key_prefix: str, channel_wise: bool = False):
        self.ops = ensure_tuple(ops)
        self.key_prefix = key_prefix
        self.channel_wise = channel_wise

    def __call__(self, img: Any, meta_data: dict | None = None, mask: np.ndarray | None = None):
        img_np = to_numpy(img.data if isinstance(img, MetaImage) else img)
        meta_data = dict(meta_data) if meta_data is not None else (dict(img.meta) if isinstance(img, MetaImage) else {})
        if mask is not None:
            if mask.shape != img_np.shape:
                raise ValueError(f"If mask is not None, mask shape must match image, got {mask.shape} vs {img_np.shape}.")
            if mask.dtype != bool:
                raise TypeError(f"mask must be bool array, got type {mask.dtype}.")
            img_np = img_np[mask]

        supported_ops = {
            "mean": np.nanmean,
            "median": np.nanmedian,
            "max": np.nanmax,
            "min": np.nanmin,
            "std": np.nanstd,
        }

        def _compute(op, data):
            if self.channel_wise:
                return [float(op(c)) for c in data]
            return float(op(data))

        custom_index = 0
        for o in self.ops:
            if isinstance(o, str):
                if o not in supported_ops:
                    raise ValueError(f"unsupported op: {o}")
                meta_data[f"{self.key_prefix}_{o}"] = _compute(supported_ops[o], img_np)
            elif callable(o):
                meta_data[f"{self.key_prefix}_custom_{custom_index}"] = _compute(o, img_np)
                custom_index += 1
            else:
                raise ValueError("ops must be key string or callable function.")
        if isinstance(img, MetaImage):
            img.meta.update(meta_data)
        return img, meta_data


class AddCoordinateChannels(Transform):
    """Append normalized coordinate channels (reference: utility/array.py:1282)."""

    def __init__(self, spatial_dims: Sequence[int]):
        self.spatial_dims = spatial_dims

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        if max(self.spatial_dims) > data.ndim - 2 or min(self.spatial_dims) < 0:
            raise ValueError(f"spatial_dims must be within [0, {data.ndim - 2}], got {self.spatial_dims}")
        spatial_size = data.shape[1:]
        coords = np.stack(np.meshgrid(*[np.linspace(-0.5, 0.5, s) for s in spatial_size], indexing="ij"))
        coords = coords[list(self.spatial_dims)].astype(np.float32)
        c, *_ = convert_to_dst_type(coords, data)
        out = xp(data).concatenate([data, c], axis=0)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class ToDevice(Transform):
    """Move a jax array to a device (reference: utility/array.py:1377)."""

    def __init__(self, device: Any, **kwargs):
        self.device = device
        self.kwargs = kwargs

    def __call__(self, img: Any):
        import jax

        data = img.data if isinstance(img, MetaImage) else img
        out = jax.device_put(to_jax(data), self.device)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class ApplyTransformToPoints(InvertibleTransform):
    """Map point coordinates between world and image space with an affine
    (reference: utility/array.py:1815).

    Input shape (C, N, 2 or 3). ``invert_affine=True`` maps world -> image voxel
    coordinates (the typical case, using the image's affine); ``False`` maps the
    other way. If the point data itself carries an ``affine`` (a transform already
    applied to it), the delta is composed in automatically.
    """

    def __init__(self, dtype=None, affine: Any = None, invert_affine: bool = True,
                 affine_lps_to_ras: bool = False):
        self.dtype = dtype
        self.affine = affine
        self.invert_affine = invert_affine
        self.affine_lps_to_ras = affine_lps_to_ras

    def _final_affine(self, affine: np.ndarray, applied_affine: np.ndarray | None) -> np.ndarray:
        from ..data.affine_utils import orientation_ras_lps

        aff = np.asarray(to_numpy(affine), dtype=np.float64)
        if self.affine_lps_to_ras:
            aff = orientation_ras_lps(aff)
        if self.invert_affine:
            aff = np.linalg.inv(aff)
            if applied_affine is not None:
                aff = aff @ np.asarray(applied_affine, dtype=np.float64)
        return aff

    @staticmethod
    def _apply_points(pts: np.ndarray, aff: np.ndarray) -> np.ndarray:
        d = pts.shape[-1]
        # promote a 3x3 (2D) matrix or 2D points into the matrix's homogeneous dim
        m = aff.shape[0] - 1
        homo = np.concatenate([pts.astype(np.float64),
                               np.zeros(pts.shape[:-1] + (m - d,), dtype=np.float64),
                               np.ones(pts.shape[:-1] + (1,), dtype=np.float64)], axis=-1)
        out = homo @ aff.T
        return out[..., :d]

    def __call__(self, data: Any, affine: Any = None):
        pts = data.data if isinstance(data, MetaImage) else data
        pts_np = to_numpy(pts)
        if pts_np.ndim != 3 or pts_np.shape[-1] not in (2, 3):
            raise ValueError(f"data should be in shape (C, N, 2 or 3), got {pts_np.shape}.")
        aff = affine if affine is not None else self.affine
        applied_affine = data.affine if isinstance(data, MetaImage) else None
        if aff is None:
            aff = applied_affine
        if aff is None:
            raise ValueError("affine must be provided if data does not carry an affine matrix.")
        aff = np.asarray(to_numpy(aff), dtype=np.float64)
        if aff.shape not in ((3, 3), (4, 4)):
            raise ValueError(f"affine should be in shape (3, 3) or (4, 4), got {aff.shape}.")
        final = self._final_affine(aff, None if applied_affine is None else to_numpy(applied_affine))
        out_np = self._apply_points(pts_np, final)
        if self.dtype is not None:
            out_np = out_np.astype(self.dtype)
        else:
            out_np = out_np.astype(pts_np.dtype if np.issubdtype(pts_np.dtype, np.floating) else np.float64)
        if isinstance(data, MetaImage):
            out = data.new_like(out_np)
            out.affine = np.linalg.inv(_promote_affine_to_4x4(final))
            self.push_transform(out, extra_info={
                "invert_affine": self.invert_affine,
                "affine_lps_to_ras": self.affine_lps_to_ras,
                "image_affine": aff.tolist(),
            })
            return out
        return out_np

    def inverse(self, data: Any):
        xform = self.pop_transform(data)
        extra = xform[TraceKeys.EXTRA_INFO]
        inv = ApplyTransformToPoints(dtype=self.dtype,
                                     invert_affine=not extra["invert_affine"],
                                     affine_lps_to_ras=extra["affine_lps_to_ras"])
        inv.tracing = False
        return inv(data, affine=np.asarray(extra["image_affine"], dtype=np.float64))


def _promote_affine_to_4x4(aff: np.ndarray) -> np.ndarray:
    if aff.shape == (4, 4):
        return aff
    out = np.eye(4, dtype=np.float64)
    out[:2, :2] = aff[:2, :2]
    out[:2, 3] = aff[:2, 2]
    return out


class ImageFilter(Transform):
    """Apply a named or custom convolution filter to (C, *spatial) data
    (reference: utility/array.py:1517 ImageFilter).

    Supported named filters: mean, laplace, elliptical, sharpen, median, gauss, sobel.
    """

    supported_filters = ("mean", "laplace", "elliptical", "sobel", "sharpen", "median",
                         "gauss")

    def __init__(self, filter, filter_size: int | None = None, **kwargs):
        self._check_inputs(filter, filter_size)
        self.filter = filter
        self.filter_size = filter_size
        self.kwargs = kwargs

    def _check_inputs(self, filt, filter_size):
        if isinstance(filt, str):
            if filt not in self.supported_filters:
                raise NotImplementedError(f"Unsupported filter: {filt}; use one of "
                                          f"{self.supported_filters}.")
            if filt != "gauss" and (filter_size is None or filter_size % 2 == 0):
                if filt in ("mean", "laplace", "elliptical", "sharpen", "median") and (
                        filter_size is None or filter_size % 2 == 0):
                    raise ValueError("filter_size must be an uneven integer.")
        elif isinstance(filt, np.ndarray) or hasattr(filt, "shape"):
            arr = np.asarray(filt)
            if arr.ndim not in (1, 2, 3):
                raise ValueError("custom filter must be 1/2/3-D.")
            if any(s % 2 == 0 for s in arr.shape):
                raise ValueError("custom filter must have odd shape in every dimension.")

    def _named_kernel(self, name: str, sd: int) -> np.ndarray:
        size = self.filter_size or 3
        if name == "mean":
            return np.ones((size,) * sd, np.float32)
        if name == "laplace":
            k = -np.ones((size,) * sd, np.float32)
            center = (size // 2,) * sd
            k[center] = size ** sd - 1
            return k
        if name == "elliptical":
            grid = np.stack(np.meshgrid(*[np.linspace(-1, 1, size)] * sd, indexing="ij"))
            return ((grid ** 2).sum(0) <= 1.0).astype(np.float32)
        if name == "sharpen":
            k = -np.ones((size,) * sd, np.float32)
            center = (size // 2,) * sd
            k[center] = size ** sd
            return k
        raise NotImplementedError(name)

    def __call__(self, img: Any, meta_dict: dict | None = None, applied_operations=None):
        data = img.data if isinstance(img, MetaImage) else img
        arr = to_jax(np.asarray(to_numpy(data), dtype=np.float32))
        sd = arr.ndim - 1
        if isinstance(self.filter, str):
            name = self.filter
            if name == "gauss":
                from ..ops.gaussian import gaussian_filter

                out = gaussian_filter(arr, sigma=self.kwargs.get("sigma", 1.0))
            elif name == "median":
                from ..networks.layers.simplelayers import MedianFilter

                out = MedianFilter(radius=(self.filter_size or 3) // 2,
                                   spatial_dims=sd)(arr[None])[0]
            elif name == "sobel":
                from ..transforms.post_array import SobelGradients

                out = SobelGradients(kernel_size=self.filter_size or 3, **self.kwargs)(arr)
            else:
                from ..networks.layers.simplelayers import apply_filter

                out = apply_filter(arr[None], to_jax(self._named_kernel(name, sd)))[0]
        elif callable(self.filter) and not hasattr(self.filter, "shape"):
            out = self.filter(arr)
        else:
            from ..networks.layers.simplelayers import apply_filter

            out = apply_filter(arr[None], to_jax(np.asarray(self.filter, np.float32)))[0]
        return img.new_like(out) if isinstance(img, MetaImage) else out


class RandImageFilter(RandomizableTransform):
    """Randomly apply ImageFilter with probability ``prob``
    (reference: utility/array.py RandImageFilter)."""

    def __init__(self, filter, filter_size: int | None = None, prob: float = 0.1, **kwargs):
        RandomizableTransform.__init__(self, prob)
        self.filter = ImageFilter(filter, filter_size, **kwargs)

    def __call__(self, img: Any, meta_dict: dict | None = None, randomize: bool = True):
        if randomize:
            self.randomize(None)
        if self._do_transform:
            return self.filter(img)
        return img


class TorchVision(Transform):
    """Adapter for torchvision transforms on jax/numpy data (reference:
    utility/array.py:1131). Requires the optional torchvision package (not bundled);
    data is round-tripped through torch CPU tensors."""

    def __init__(self, name: str, *args, **kwargs):
        from ..utils.module import optional_import

        tv, has = optional_import("torchvision.transforms")
        if not has:
            raise ImportError("TorchVision transform adapter requires 'torchvision' "
                              "(not installed).")
        self.trans = getattr(tv, name)(*args, **kwargs)

    def __call__(self, img: Any):
        import torch

        data = img.data if isinstance(img, MetaImage) else img
        out = self.trans(torch.as_tensor(to_numpy(data))).numpy()
        return img.new_like(out) if isinstance(img, MetaImage) else out


class TorchIO(Transform):
    """Adapter for torchio transforms (reference: utility/array.py:1199). Requires the
    optional torchio package (not bundled)."""

    def __init__(self, name: str, *args, **kwargs):
        from ..utils.module import optional_import

        tio, has = optional_import("torchio")
        if not has:
            raise ImportError("TorchIO transform adapter requires 'torchio' (not installed).")
        self.trans = getattr(tio, name)(*args, **kwargs)

    def __call__(self, img: Any):
        import torch

        data = img.data if isinstance(img, MetaImage) else img
        out = self.trans(torch.as_tensor(to_numpy(data)))
        out = out.numpy() if hasattr(out, "numpy") else np.asarray(out)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class CuCIM(Transform):
    """Adapter for cucim operations (reference: utility/array.py:1427). Requires the
    optional cucim package — GPU-only upstream; not applicable on TPU and not bundled."""

    def __init__(self, name: str, *args, **kwargs):
        from ..utils.module import optional_import

        _, has = optional_import("cucim")
        if not has:
            raise ImportError("CuCIM transform adapter requires 'cucim' (not installed; "
                              "cucim is CUDA-only and has no TPU backend).")
        self.name = name
        self.args = args
        self.kwargs = kwargs

    def __call__(self, data):
        from cucim.core.operations.expose.transform import (  # type: ignore
            color_jitter,  # noqa: F401
        )

        import cucim.core.operations.expose.transform as t

        return getattr(t, self.name)(data, *self.args, **self.kwargs)


RandTorchVision = TorchVision  # the reference marks these as randomizable pass-throughs
RandTorchIO = TorchIO
RandCuCIM = CuCIM


class RandIdentity(RandomizableTrait):
    """No-op that composes as a randomizable transform (caching boundary marker)
    (reference: utility/array.py:132)."""

    def __call__(self, data: Any) -> Any:
        return data


class ToPIL(Transform):
    """Convert a 2D array (C, H, W) or (H, W) to a PIL image (reference:
    utility/array.py ToPIL)."""

    def __call__(self, img: Any):
        from PIL import Image

        data = to_numpy(img.data if isinstance(img, MetaImage) else img)
        if data.ndim == 3:
            data = np.moveaxis(data, 0, -1)
            if data.shape[-1] == 1:
                data = data[..., 0]
        if data.dtype != np.uint8:
            lo, hi = data.min(), data.max()
            data = ((data - lo) / (hi - lo + 1e-12) * 255).astype(np.uint8)
        return Image.fromarray(data)


class ToCupy(Transform):
    """Convert to a cupy array (reference: utility/array.py ToCupy). cupy is CUDA-only
    and not available on TPU hosts; gated."""

    def __init__(self, dtype=None, wrap_sequence: bool = True):
        from ..utils.module import optional_import

        self._cp, has = optional_import("cupy")
        if not has:
            raise ImportError("ToCupy requires 'cupy' (CUDA-only; not available here).")
        self.dtype = dtype

    def __call__(self, img: Any):
        data = to_numpy(img.data if isinstance(img, MetaImage) else img)
        return self._cp.asarray(data, dtype=self.dtype)


class ConvertBoxToPoints(Transform):
    """Standard-mode boxes (N, 2*sd) -> corner points (N, 2^sd, sd)
    (reference: spatial/array.py:3552)."""

    def __init__(self, mode=None):
        self.mode = mode

    def __call__(self, data: Any):
        from ..data.box_utils import convert_box_to_standard_mode

        boxes = to_numpy(convert_box_to_standard_mode(data, mode=self.mode))
        sd = boxes.shape[-1] // 2
        corners = []
        for mask in range(2 ** sd):
            pick = [(boxes[:, d + sd] if (mask >> d) & 1 else boxes[:, d]) for d in range(sd)]
            corners.append(np.stack(pick, axis=-1))
        return np.stack(corners, axis=1)  # (N, 2^sd, sd)


class ConvertPointsToBoxes(Transform):
    """Corner points (N, 2^sd, sd) -> standard-mode boxes (N, 2*sd)
    (reference: spatial/array.py:3583)."""

    def __call__(self, data: Any):
        pts = to_numpy(data)
        return np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=1)
