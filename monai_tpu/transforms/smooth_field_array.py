"""Smooth-field transforms (reference: monai/transforms/smooth_field/array.py:35-342)."""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..data.meta_image import MetaImage
from ..ops.resample import affine_resample
from ..data.affine_utils import scale_affine
from ..utils.backend import to_numpy
from ..utils.misc import ensure_tuple, ensure_tuple_rep, fall_back_tuple
from ..utils.type_conversion import convert_to_dst_type
from .transform import Randomizable, RandomizableTransform

__all__ = ["SmoothField", "RandSmoothFieldAdjustContrast", "RandSmoothFieldAdjustIntensity",
           "RandSmoothDeform"]


class SmoothField(Randomizable):
    """Random low-res field, interpolated smoothly to full size
    (reference: smooth_field/array.py:35)."""

    def __init__(self, rand_size: Sequence[int], pad: int = 0, pad_val: float = 0,
                 low: float = -1.0, high: float = 1.0, channels: int = 1,
                 mode: str = "area", align_corners: bool | None = None):
        self.rand_size = tuple(rand_size)
        self.pad = pad
        self.low = low
        self.high = high
        self.channels = channels
        self.mode = mode
        self.align_corners = align_corners
        if low >= high:
            raise ValueError("`low` value must be less than `high` value.")
        self.total_rand_size = tuple(rs + self.pad * 2 for rs in self.rand_size)
        self.field = np.full((self.channels,) + self.total_rand_size, pad_val, dtype=np.float64)
        self.crand_size = (self.channels,) + self.rand_size
        pad_slice = slice(None) if self.pad == 0 else slice(self.pad, -self.pad)
        self.rand_slices = (slice(None),) + (pad_slice,) * len(self.rand_size)

    def randomize(self, data: Any = None) -> None:
        vals = self.R.uniform(self.low, self.high, self.crand_size)
        self.field[self.rand_slices] = vals

    def set_spatial_size(self, spatial_size: Sequence[int] | None) -> None:
        self.spatial_size = tuple(spatial_size) if spatial_size is not None else None

    @staticmethod
    def _area_resize_axis(arr: np.ndarray, axis: int, out_size: int) -> np.ndarray:
        """torch interpolate mode='area' (adaptive average pooling) along one axis."""
        in_size = arr.shape[axis]
        arr_m = np.moveaxis(arr, axis, 0)
        out = np.empty((out_size,) + arr_m.shape[1:], dtype=arr_m.dtype)
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -((-(i + 1) * in_size) // out_size)  # ceil((i+1)*in/out)
            out[i] = arr_m[start:end].mean(axis=0)
        return np.moveaxis(out, 0, axis)

    @staticmethod
    def _linear_resize_axis(arr: np.ndarray, axis: int, out_size: int,
                            align_corners: bool | None) -> np.ndarray:
        in_size = arr.shape[axis]
        if align_corners:
            src = np.arange(out_size) * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        f = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        c = np.clip(f + 1, 0, in_size - 1)
        t = np.clip(src - f, 0.0, 1.0)
        arr_m = np.moveaxis(arr, axis, -1)
        shape = (1,) * (arr_m.ndim - 1) + (out_size,)
        out = arr_m[..., f] * (1 - t).reshape(shape) + arr_m[..., c] * t.reshape(shape)
        return np.moveaxis(out, -1, axis)

    def __call__(self, spatial_size: Sequence[int]) -> np.ndarray:
        """Interpolate the coarse field up to ``spatial_size`` with torch-interpolate
        semantics (mode 'area' = adaptive average pooling, the reference default),
        then min-max rescale back to the coarse field's value range
        (reference smooth_field/array.py:35 SmoothField.__call__)."""
        field = self.field.copy()
        out_sizes = tuple(int(s) for s in spatial_size)
        if tuple(field.shape[1:]) != out_sizes:
            mode = str(self.mode)
            resized = field
            for ax, osz in enumerate(out_sizes):
                if mode == "area":
                    resized = self._area_resize_axis(resized, ax + 1, osz)
                else:  # linear / bilinear / trilinear / nearest
                    if mode == "nearest":
                        in_size = resized.shape[ax + 1]
                        idx = np.floor(np.arange(osz) * (in_size / osz)).astype(np.int64)
                        resized = np.take(resized, np.clip(idx, 0, in_size - 1), axis=ax + 1)
                    else:
                        resized = self._linear_resize_axis(resized, ax + 1, osz, self.align_corners)
            mina, maxa = resized.min(), resized.max()
            minv, maxv = field.min(), field.max()
            norm = (resized - mina) / max(maxa - mina, 1e-20)
            field = norm * (maxv - minv) + minv
        return np.asarray(field, dtype=np.float32)


class RandSmoothFieldAdjustContrast(RandomizableTransform):
    """γ-field contrast adjustment (reference: smooth_field/array.py:—)."""

    def __init__(self, spatial_size: Sequence[int], rand_size: Sequence[int], pad: int = 0,
                 mode="area", align_corners=None, prob: float = 0.1, gamma=(0.5, 4.5)):
        super().__init__(prob)
        if isinstance(gamma, (int, float)):
            self.gamma = (0.5, gamma)
        else:
            if len(gamma) != 2:
                raise ValueError("Argument `gamma` should be a number or pair of numbers.")
            self.gamma = (min(gamma), max(gamma))
        self.spatial_size = tuple(spatial_size)
        self.sfield = SmoothField(rand_size, pad, 0, self.gamma[0], self.gamma[1], 1,
                                  mode=mode, align_corners=align_corners)

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.sfield.set_random_state(seed, state)
        return self

    def randomize(self, data=None) -> None:
        super().randomize(None)
        if self._do_transform:
            self.sfield.randomize()

    def __call__(self, img: Any, randomize: bool = True):
        if randomize:
            self.randomize()
        if not self._do_transform:
            return img
        arr = to_numpy(img.data if isinstance(img, MetaImage) else img).astype(np.float32)
        img_min, img_max = arr.min(), arr.max()
        img_rng = img_max - img_min
        field = self.sfield(arr.shape[1:])
        out = (arr - img_min) / max(img_rng, 1e-10)
        out = out ** field
        out = (out * img_rng) + img_min
        res, *_ = convert_to_dst_type(out, img.data if isinstance(img, MetaImage) else img)
        return img.new_like(res) if isinstance(img, MetaImage) else res


class RandSmoothFieldAdjustIntensity(RandomizableTransform):
    """Multiplicative intensity field (reference: smooth_field/array.py:—)."""

    def __init__(self, spatial_size: Sequence[int], rand_size: Sequence[int], pad: int = 0,
                 mode="area", align_corners=None, prob: float = 0.1, gamma=(0.1, 1.0)):
        super().__init__(prob)
        if isinstance(gamma, (int, float)):
            self.gamma = (0.5, gamma)
        else:
            self.gamma = (min(gamma), max(gamma))
        self.sfield = SmoothField(rand_size, pad, 0, self.gamma[0], self.gamma[1], 1,
                                  mode=mode, align_corners=align_corners)

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.sfield.set_random_state(seed, state)
        return self

    def randomize(self, data=None) -> None:
        super().randomize(None)
        if self._do_transform:
            self.sfield.randomize()

    def __call__(self, img: Any, randomize: bool = True):
        if randomize:
            self.randomize()
        if not self._do_transform:
            return img
        arr = to_numpy(img.data if isinstance(img, MetaImage) else img).astype(np.float32)
        field = self.sfield(arr.shape[1:])
        out = arr * field
        res, *_ = convert_to_dst_type(out, img.data if isinstance(img, MetaImage) else img)
        return img.new_like(res) if isinstance(img, MetaImage) else res


class RandSmoothDeform(RandomizableTransform):
    """Smooth random deformation field (reference: smooth_field/array.py:—)."""

    def __init__(self, spatial_size: Sequence[int], rand_size: Sequence[int], pad: int = 0,
                 field_mode="area", align_corners=None, prob: float = 0.1,
                 def_range: float | Sequence[float] = 1.0, grid_dtype=np.float32, grid_mode="linear",
                 grid_padding_mode: str = "border", grid_align_corners: bool = False):
        super().__init__(prob)
        self.def_range = (-def_range, def_range) if isinstance(def_range, (int, float)) else \
            (min(def_range), max(def_range))
        self.spatial_size = tuple(spatial_size)
        self.sfield = SmoothField(rand_size, pad, 0, self.def_range[0], self.def_range[1],
                                  len(self.spatial_size))
        self.grid_mode = grid_mode
        self.grid_padding_mode = grid_padding_mode

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.sfield.set_random_state(seed, state)
        return self

    def randomize(self, data=None) -> None:
        super().randomize(None)
        if self._do_transform:
            self.sfield.randomize()

    def __call__(self, img: Any, randomize: bool = True, device=None):
        from ..ops.resample import grid_pull

        if randomize:
            self.randomize()
        if not self._do_transform:
            return img
        arr = to_numpy(img.data if isinstance(img, MetaImage) else img)
        spatial = arr.shape[1:]
        field = self.sfield(spatial)  # (D, *spatial) in relative units
        d = len(spatial)
        disp = np.moveaxis(field, 0, -1) * np.asarray(spatial) / 2.0
        base = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float32) for s in spatial],
                                    indexing="ij"), axis=-1)
        grid = base + disp.astype(np.float32)
        mode = 1 if self.grid_mode in ("linear", "bilinear", "trilinear", 1) else 0
        pm = {"zeros": "zeros", "border": "border", "reflection": "reflection"}.get(
            str(self.grid_padding_mode), "border")
        out = grid_pull(arr, grid, interpolation=mode, bound=pm)
        res, *_ = convert_to_dst_type(out, arr)
        return img.new_like(res) if isinstance(img, MetaImage) else res
