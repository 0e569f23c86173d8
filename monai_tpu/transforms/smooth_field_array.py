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

    def __init__(self, rand_size: Sequence[int], pad: int = 0, low: float = -1.0, high: float = 1.0,
                 channels: int = 1):
        self.rand_size = tuple(rand_size)
        self.pad = pad
        self.low = low
        self.high = high
        self.channels = channels
        if low >= high:
            raise ValueError("`low` value must be less than `high` value.")
        self.total_rand_size = tuple(rs + self.pad * 2 for rs in self.rand_size)
        self.field = np.ones((self.channels,) + self.total_rand_size, dtype=np.float32)
        self.crand_size = (self.channels,) + self.rand_size
        pad_slice = slice(None) if self.pad == 0 else slice(self.pad, -self.pad)
        self.rand_slices = (slice(None),) + (pad_slice,) * len(self.rand_size)

    def randomize(self, data: Any = None) -> None:
        vals = self.R.uniform(self.low, self.high, self.crand_size).astype(np.float32)
        self.field[self.rand_slices] = vals

    def set_spatial_size(self, spatial_size: Sequence[int] | None) -> None:
        self.spatial_size = tuple(spatial_size) if spatial_size is not None else None

    def __call__(self, spatial_size: Sequence[int]) -> np.ndarray:
        """Interpolate the coarse field up to ``spatial_size`` (tricubic-ish via linear)."""
        M = scale_affine(self.total_rand_size, spatial_size, centered=True)
        return np.asarray(affine_resample(self.field, M, spatial_size, mode=1, padding_mode="border"))


class RandSmoothFieldAdjustContrast(RandomizableTransform):
    """γ-field contrast adjustment (reference: smooth_field/array.py:—)."""

    def __init__(self, spatial_size: Sequence[int], rand_size: Sequence[int], pad: int = 0,
                 mode="linear", align_corners=None, prob: float = 0.1, gamma=(0.5, 4.5)):
        super().__init__(prob)
        if isinstance(gamma, (int, float)):
            self.gamma = (0.5, gamma)
        else:
            if len(gamma) != 2:
                raise ValueError("Argument `gamma` should be a number or pair of numbers.")
            self.gamma = (min(gamma), max(gamma))
        self.spatial_size = tuple(spatial_size)
        self.sfield = SmoothField(rand_size, pad, self.gamma[0], self.gamma[1], 1)

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
                 mode="linear", align_corners=None, prob: float = 0.1, gamma=(0.1, 1.0)):
        super().__init__(prob)
        if isinstance(gamma, (int, float)):
            self.gamma = (0.5, gamma)
        else:
            self.gamma = (min(gamma), max(gamma))
        self.sfield = SmoothField(rand_size, pad, self.gamma[0], self.gamma[1], 1)

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
                 field_mode="linear", align_corners=None, prob: float = 0.1,
                 def_range: float | Sequence[float] = 1.0, grid_dtype=np.float32, grid_mode="linear",
                 grid_padding_mode: str = "border", grid_align_corners: bool = False):
        super().__init__(prob)
        self.def_range = (-def_range, def_range) if isinstance(def_range, (int, float)) else \
            (min(def_range), max(def_range))
        self.spatial_size = tuple(spatial_size)
        self.sfield = SmoothField(rand_size, pad, self.def_range[0], self.def_range[1],
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
