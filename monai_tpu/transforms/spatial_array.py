"""Spatial transforms (array API).

Parity targets: monai/transforms/spatial/array.py (SpatialResample:122, ResampleToMatch:256,
Spacing:338, Orientation:549, Flip/Resize/Rotate/Zoom/Rotate90 + Rand variants,
AffineGrid:1662, Affine:2120, RandAffine:2317, Rand2DElastic:2579/Rand3DElastic:2745,
GridDistortion:2914) and spatial/functional.py:68-666.

TPU-first architecture: every transform only *describes* its action as a homogeneous
float64 matrix pushed onto the image's pending stack.  Execution happens at flush time:
chains of ops fuse into ONE gather-interpolate (or a pure slicing/flip fast path for
integer chains) — see :mod:`monai_tpu.transforms.lazy_executor`.
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..data.affine_utils import (
    affine_to_spacing,
    axcodes2ornt,
    compute_shape_offset,
    inv_ornt_aff,
    io_orientation,
    ornt_transform,
    scale_affine,
    to_affine_nd,
    zoom_affine,
)
from ..data.meta_image import MetaImage, get_track_meta
from ..ops.resample import grid_pull
from ..utils.backend import is_jax, to_jax, to_numpy
from ..utils.enums import GridSampleMode, GridSamplePadMode, TraceKeys
from ..utils.misc import ensure_tuple, ensure_tuple_rep, ensure_tuple_size, fall_back_tuple, issequenceiterable
from .inverse import InvertibleTransform
from .lazy_executor import apply_pending
from .transform import LazyTransform, Randomizable, RandomizableTransform, Transform
from .traits import MultiSampleTrait
from .utils import create_rotate, create_scale, create_shear, create_translate, map_spatial_axes, resolves_modes

__all__ = [
    "RandDeformGrid",
    "Resample",
    "SpatialResample",
    "ResampleToMatch",
    "Spacing",
    "Orientation",
    "Flip",
    "RandFlip",
    "RandAxisFlip",
    "Rotate90",
    "RandRotate90",
    "Resize",
    "Rotate",
    "RandRotate",
    "Zoom",
    "RandZoom",
    "AffineGrid",
    "RandAffineGrid",
    "Affine",
    "RandAffine",
    "Rand2DElastic",
    "Rand3DElastic",
    "GridDistortion",
    "RandGridDistortion",
    "RandSimulateLowResolution",
]



def _shallow_copy(img):
    """Non-mutating MetaImage wrapper for skip/no-op paths."""
    return img.new_like(img.data) if isinstance(img, MetaImage) else MetaImage.ensure_meta(img)

class _SpatialLazyTransform(InvertibleTransform, LazyTransform):
    """Shared machinery: push a pending affine op; flush unless lazy."""

    def __init__(self, lazy: bool = False):
        LazyTransform.__init__(self, lazy=lazy)

    def _op(self, img: Any, matrix: np.ndarray, sp_size: Sequence[int], mode=None, padding_mode=None,
            align_corners=None, dtype=None, lazy: bool | None = None, extra_info: dict | None = None,
            new_affine: np.ndarray | None = None, data_matrix: np.ndarray | None = None):
        """``data_matrix``: optional pull map for the EAGER data path when it must
        differ from the tracked ``matrix`` (e.g. torch-interpolate legacy-nearest
        floor indexing in Resize/Zoom); ignored in lazy mode, where the composed
        pending chain uses ``matrix`` (same trade-off as the reference's lazy path)."""
        lazy_ = self.lazy if lazy is None else lazy
        m, pm = resolves_modes(mode, padding_mode)
        if not isinstance(img, MetaImage) or not get_track_meta():
            # bare-array path: apply immediately, no tracing
            from .lazy_utils import apply_affine_to_data

            data = img.data if isinstance(img, MetaImage) else img
            out = apply_affine_to_data(data, data_matrix if data_matrix is not None else matrix,
                                       sp_size, mode=m, padding_mode=pm,
                                       align_corners=bool(align_corners))
            return MetaImage(out) if isinstance(img, MetaImage) else out
        had_pending = bool(img.pending_operations)
        img = img.new_like(img.data)  # never mutate the caller's image
        self.push_transform(img, affine=matrix, sp_size=sp_size, mode=m, padding_mode=pm,
                            align_corners=align_corners, dtype=dtype, lazy=True,
                            orig_size=img.peek_pending_shape(), extra_info=extra_info or {})
        if new_affine is not None:
            # transforms like Spacing know the exact target affine; pre-check consistency is implicit
            pass
        if lazy_:
            return img
        if data_matrix is not None and not had_pending:
            from .lazy_executor import promote_pending_with_data
            from .lazy_utils import apply_affine_to_data

            dat = apply_affine_to_data(img.data, data_matrix, sp_size, mode=m, padding_mode=pm,
                                       align_corners=bool(align_corners))
            return promote_pending_with_data(img, dat)
        out, _ = apply_pending(img)
        return out


class SpatialResample(_SpatialLazyTransform):
    """Resample into a target affine / spatial size (reference: spatial/array.py:122)."""

    def __init__(self, mode=GridSampleMode.BILINEAR, padding_mode=GridSamplePadMode.BORDER,
                 align_corners: bool = False, dtype=np.float64, lazy: bool = False):
        super().__init__(lazy=lazy)
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.dtype = dtype

    def __call__(self, img: Any, dst_affine=None, spatial_size=None, mode=None, padding_mode=None,
                 align_corners=None, dtype=None, lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        src_affine = img.peek_pending_affine()
        spatial_rank = min(len(img.peek_pending_shape()), 3)
        if dst_affine is None:
            dst_affine = to_affine_nd(spatial_rank, src_affine)
        dst_affine = to_affine_nd(spatial_rank, np.asarray(dst_affine, dtype=np.float64))
        in_spatial_size = np.asarray(img.peek_pending_shape()[:spatial_rank])
        if spatial_size is None or (issequenceiterable(spatial_size) and tuple(spatial_size) == (-1,)):
            spatial_size, _ = compute_shape_offset(in_spatial_size, to_affine_nd(spatial_rank, src_affine), dst_affine)
        spatial_size = tuple(int(s) for s in np.asarray(fall_back_tuple(spatial_size, in_spatial_size)))
        src = to_affine_nd(spatial_rank, src_affine)
        try:
            M = np.linalg.solve(src, dst_affine)
        except np.linalg.LinAlgError as e:
            raise ValueError(f"src affine is not invertible: {src}") from e
        full_rank = len(img.peek_pending_shape())
        M = to_affine_nd(full_rank, M)
        full_size = tuple(spatial_size) + tuple(img.peek_pending_shape()[spatial_rank:])
        return self._op(img, M, full_size, mode=mode or self.mode,
                        padding_mode=padding_mode or self.padding_mode,
                        align_corners=self.align_corners if align_corners is None else align_corners,
                        dtype=dtype or self.dtype, lazy=lazy,
                        extra_info={"dst_affine": np.asarray(dst_affine).tolist()})


class ResampleToMatch(SpatialResample):
    """Resample onto another image's grid (reference: spatial/array.py:256)."""

    def __call__(self, img: Any, img_dst: Any, mode=None, padding_mode=None, align_corners=None,
                 dtype=None, lazy: bool | None = None):
        if img_dst is None:
            raise RuntimeError("`img_dst` is missing.")
        img_dst = MetaImage.ensure_meta(img_dst)
        dst_affine = img_dst.peek_pending_affine()
        spatial_size = img_dst.peek_pending_shape()
        out = super().__call__(img, dst_affine=dst_affine, spatial_size=spatial_size, mode=mode,
                               padding_mode=padding_mode, align_corners=align_corners, dtype=dtype,
                               lazy=lazy)
        if isinstance(out, MetaImage):
            from ..utils.enums import MetaKeys

            out.meta[MetaKeys.FILENAME_OR_OBJ] = img_dst.meta.get(MetaKeys.FILENAME_OR_OBJ,
                                                                  out.meta.get(MetaKeys.FILENAME_OR_OBJ))
        return out


class Spacing(_SpatialLazyTransform):
    """Resample to a new voxel spacing (reference: spatial/array.py:338)."""

    def __init__(self, pixdim, diagonal: bool = False, mode=GridSampleMode.BILINEAR,
                 padding_mode=GridSamplePadMode.BORDER, align_corners: bool = False, dtype=np.float64,
                 scale_extent: bool = False, recompute_affine: bool = False,
                 min_pixdim=None, max_pixdim=None, lazy: bool = False):
        super().__init__(lazy=lazy)
        self.pixdim = np.array(ensure_tuple(pixdim), dtype=np.float64)
        self.min_pixdim = np.array(ensure_tuple(min_pixdim), dtype=np.float64) if min_pixdim is not None else None
        self.max_pixdim = np.array(ensure_tuple(max_pixdim), dtype=np.float64) if max_pixdim is not None else None
        self.diagonal = diagonal
        self.scale_extent = scale_extent
        self.recompute_affine = recompute_affine
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.dtype = dtype
        for mn, mx in zip(self.min_pixdim if self.min_pixdim is not None else [],
                          self.max_pixdim if self.max_pixdim is not None else []):
            if mn > mx:
                raise ValueError(f"min_pixdim {self.min_pixdim} must be <= max_pixdim {self.max_pixdim}")

    def __call__(self, img: Any, mode=None, padding_mode=None, align_corners=None, dtype=None,
                 scale_extent=None, output_spatial_shape=None, lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        original_spatial_shape = img.peek_pending_shape()
        sr = len(original_spatial_shape)
        if sr <= 0:
            raise ValueError(f"data has no spatial dimensions, shape {img.shape}")
        affine_ = to_affine_nd(sr, img.peek_pending_affine())
        out_d = self.pixdim[:sr].copy()
        if out_d.size < sr:
            out_d = np.append(out_d, [out_d[-1]] * (sr - out_d.size))
        orig_d = affine_to_spacing(affine_, sr)
        for idx in range(sr):
            target = out_d[idx]
            mn = self.min_pixdim[idx] if self.min_pixdim is not None else target
            mx = self.max_pixdim[idx] if self.max_pixdim is not None else target
            if mn > mx:
                raise ValueError(f"min_pixdim is larger than max_pixdim at dim {idx}: min {mn} max {mx}.")
            if mn <= orig_d[idx] <= mx:
                target = orig_d[idx]
            out_d[idx] = target if target > 0 else orig_d[idx]
        new_affine = zoom_affine(affine_, out_d, diagonal=self.diagonal)
        scale_extent_ = self.scale_extent if scale_extent is None else scale_extent
        output_shape, offset = compute_shape_offset(original_spatial_shape, affine_, new_affine, scale_extent_)
        new_affine[:sr, -1] = offset[:sr]
        if output_spatial_shape is not None:
            output_shape = np.asarray(ensure_tuple(output_spatial_shape)[:sr])
        M = np.linalg.solve(affine_, new_affine)
        return self._op(img, M, tuple(int(s) for s in output_shape), mode=mode or self.mode,
                        padding_mode=padding_mode or self.padding_mode,
                        align_corners=self.align_corners if align_corners is None else align_corners,
                        dtype=dtype or self.dtype, lazy=lazy,
                        extra_info={"pixdim": out_d.tolist()})


class Orientation(_SpatialLazyTransform):
    """Reorient to axis codes like 'RAS' (reference: spatial/array.py:549).

    A pure integer permutation/flip — always the no-interpolation fast path.
    """

    def __init__(self, axcodes: str | None = None, as_closest_canonical: bool = False,
                 labels=(("L", "R"), ("P", "A"), ("I", "S")), lazy: bool = False):
        super().__init__(lazy=lazy)
        if axcodes is None and not as_closest_canonical:
            raise ValueError("Incompatible values: axcodes=None and as_closest_canonical=False.")
        if axcodes is not None and as_closest_canonical:
            import warnings

            warnings.warn("using as_closest_canonical=True, axcodes ignored.")
        self.axcodes = axcodes
        self.as_closest_canonical = as_closest_canonical
        self.labels = labels

    def __call__(self, img: Any, lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        spatial_shape = img.peek_pending_shape()
        sr = len(spatial_shape)
        if sr not in (2, 3):
            raise ValueError(f"Orientation expects 2D/3D data, got spatial rank {sr}")
        affine_ = to_affine_nd(sr, img.peek_pending_affine())
        src = io_orientation(affine_)
        if self.as_closest_canonical:
            spatial_ornt = src
        else:
            if self.axcodes is None:
                raise ValueError("axcodes must not be None")
            axcodes = self.axcodes[:sr]
            dst = axcodes2ornt(axcodes, labels=self.labels)
            if len(dst) < sr:
                raise ValueError(f"axcodes must match data shape, got axcodes={len(dst)}D, data={sr}D")
            spatial_ornt = ornt_transform(src, dst)
        M = inv_ornt_aff(spatial_ornt, spatial_shape)
        new_shape = [spatial_shape[int(i)] for i in spatial_ornt[:, 0].tolist()]
        # output axis d pulls from input axis ornt[...]: inv_ornt_aff encodes it; out shape permutes
        out_shape = [0] * sr
        for in_ax, (out_ax, _flip) in enumerate(spatial_ornt):
            out_shape[int(out_ax)] = int(spatial_shape[in_ax])
        return self._op(img, M, tuple(out_shape), mode="nearest", padding_mode="zeros", lazy=lazy,
                        extra_info={"original_affine": affine_.tolist()})


class Flip(_SpatialLazyTransform):
    """Flip along spatial axes (reference: spatial/array.py:873). Integer fast path."""

    def __init__(self, spatial_axis: Sequence[int] | int | None = None, lazy: bool = False):
        super().__init__(lazy=lazy)
        self.spatial_axis = spatial_axis

    def _matrix(self, spatial_shape) -> np.ndarray:
        sr = len(spatial_shape)
        axes = map_spatial_axes(sr + 1, self.spatial_axis)  # returns 1-based (channel-first)
        M = np.eye(sr + 1, dtype=np.float64)
        for ax in axes:
            d = ax - 1
            M[d, d] = -1.0
            M[d, sr] = float(spatial_shape[d] - 1)
        return M

    def __call__(self, img: Any, lazy: bool | None = None):
        img_meta = isinstance(img, MetaImage)
        spatial_shape = img.peek_pending_shape() if img_meta else img.shape[1:]
        M = self._matrix(spatial_shape)
        return self._op(img, M, tuple(spatial_shape), mode="nearest", padding_mode="zeros", lazy=lazy)


class RandFlip(RandomizableTransform, InvertibleTransform, LazyTransform):
    """Random flip (reference: spatial/array.py:1019)."""

    def __init__(self, prob: float = 0.1, spatial_axis=None, lazy: bool = False):
        RandomizableTransform.__init__(self, prob)
        LazyTransform.__init__(self, lazy=lazy)
        self.flipper = Flip(spatial_axis=spatial_axis, lazy=lazy)

    @LazyTransform.lazy.setter  # type: ignore
    def lazy(self, val: bool):
        self._lazy = val
        self.flipper.lazy = val

    def __call__(self, img: Any, randomize: bool = True, lazy: bool | None = None):
        if randomize:
            self.randomize(None)
        lazy_ = self.lazy if lazy is None else lazy
        if not self._do_transform:
            out = _shallow_copy(img)
            self.push_transform(out, extra_info={"skipped": True}, lazy=False)
            return out
        out = self.flipper(img, lazy=lazy_)
        self.push_transform(out, replace=True, lazy=lazy_)
        return out

    def inverse(self, data):
        t = self.get_most_recent_transform(data, pop=True)
        if t.get(TraceKeys.EXTRA_INFO, {}).get("skipped"):
            return data
        data.push_applied_operation(t)
        return InvertibleTransform.inverse(self, data)


class RandAxisFlip(RandomizableTransform, InvertibleTransform, LazyTransform):
    """Flip along one random axis (reference: spatial/array.py:1076)."""

    def __init__(self, prob: float = 0.1, lazy: bool = False):
        RandomizableTransform.__init__(self, prob)
        LazyTransform.__init__(self, lazy=lazy)
        self._axis: int | None = None

    def randomize(self, data: Any) -> None:
        super().randomize(None)
        if self._do_transform:
            self._axis = self.R.randint(data.ndim - 1)

    def __call__(self, img: Any, randomize: bool = True, lazy: bool | None = None):
        if randomize:
            self.randomize(img.data if isinstance(img, MetaImage) else img)
        if not self._do_transform:
            out = _shallow_copy(img)
            self.push_transform(out, extra_info={"skipped": True}, lazy=False)
            return out
        lazy_ = self.lazy if lazy is None else lazy
        flipper = Flip(spatial_axis=self._axis)
        flipper.lazy = lazy_
        out = flipper(img)
        self.push_transform(out, replace=True, lazy=lazy_)
        return out

    def inverse(self, data):
        t = self.get_most_recent_transform(data, pop=True)
        if t.get(TraceKeys.EXTRA_INFO, {}).get("skipped"):
            return data
        data.push_applied_operation(t)
        return InvertibleTransform.inverse(self, data)


class Rotate90(_SpatialLazyTransform):
    """Rotate by 90° k times in a plane (reference: spatial/array.py:1105). Integer fast path."""

    def __init__(self, k: int = 1, spatial_axes: tuple[int, int] = (0, 1), lazy: bool = False):
        super().__init__(lazy=lazy)
        self.k = (4 + (k % 4)) % 4
        spatial_axes_ = ensure_tuple(spatial_axes)
        if len(spatial_axes_) != 2:
            raise ValueError(f"spatial_axes must be 2 numbers to define the plane, got {spatial_axes_}.")
        self.spatial_axes = spatial_axes_

    def __call__(self, img: Any, lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        spatial_shape = list(img.peek_pending_shape())
        sr = len(spatial_shape)
        a, b = (ax % sr for ax in self.spatial_axes)
        shape = list(spatial_shape)
        M_total = np.eye(sr + 1, dtype=np.float64)
        for _ in range(self.k):
            # one rot90 in plane (a, b): out[x_a, x_b] = in[x_b, n_b - 1 - x_a]
            M = np.eye(sr + 1, dtype=np.float64)
            M[a, a] = 0.0
            M[b, b] = 0.0
            M[a, b] = 1.0
            M[b, a] = -1.0
            M[b, sr] = float(shape[b] - 1)
            M_total = M_total @ M
            shape[a], shape[b] = shape[b], shape[a]
        return self._op(img, M_total, tuple(shape), mode="nearest", padding_mode="zeros", lazy=lazy,
                        extra_info={"k": self.k, "axes": [a, b]})


class RandRotate90(RandomizableTransform, InvertibleTransform, LazyTransform):
    """Random multiple-of-90° rotation (reference: spatial/array.py:1154)."""

    def __init__(self, prob: float = 0.1, max_k: int = 3, spatial_axes: tuple[int, int] = (0, 1),
                 lazy: bool = False):
        RandomizableTransform.__init__(self, prob)
        LazyTransform.__init__(self, lazy=lazy)
        self.max_k = max_k
        self.spatial_axes = spatial_axes
        self._rand_k = 0

    def randomize(self, data: Any = None) -> None:
        super().randomize(None)
        if self._do_transform:
            self._rand_k = self.R.randint(self.max_k) + 1

    def __call__(self, img: Any, randomize: bool = True, lazy: bool | None = None):
        if randomize:
            self.randomize()
        if not self._do_transform:
            out = _shallow_copy(img)
            self.push_transform(out, extra_info={"skipped": True}, lazy=False)
            return out
        lazy_ = self.lazy if lazy is None else lazy
        xform = Rotate90(self._rand_k, self.spatial_axes)
        xform.lazy = lazy_
        out = xform(img)
        self.push_transform(out, replace=True, lazy=lazy_)
        return out

    def inverse(self, data):
        t = self.get_most_recent_transform(data, pop=True)
        if t.get(TraceKeys.EXTRA_INFO, {}).get("skipped"):
            return data
        data.push_applied_operation(t)
        return InvertibleTransform.inverse(self, data)


class Resize(_SpatialLazyTransform):
    """Resize to a spatial size (reference: spatial/array.py:1208)."""

    def __init__(self, spatial_size: Sequence[int] | int, size_mode: str = "all",
                 mode="bilinear", align_corners: bool = False, anti_aliasing: bool = False,
                 anti_aliasing_sigma=None, dtype=np.float32, lazy: bool = False):
        super().__init__(lazy=lazy)
        self.size_mode = size_mode
        self.spatial_size = spatial_size
        self.mode = mode
        self.align_corners = align_corners
        self.anti_aliasing = anti_aliasing
        self.anti_aliasing_sigma = anti_aliasing_sigma
        self.dtype = dtype

    def __call__(self, img: Any, mode=None, align_corners=None, anti_aliasing=None,
                 anti_aliasing_sigma=None, dtype=None, lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        in_shape = img.peek_pending_shape()
        sr = len(in_shape)
        anti_aliasing = self.anti_aliasing if anti_aliasing is None else anti_aliasing
        aa_sigma = self.anti_aliasing_sigma if anti_aliasing_sigma is None else anti_aliasing_sigma
        if self.size_mode == "all":
            out_size = fall_back_tuple(ensure_tuple_rep(self.spatial_size, sr) if not issequenceiterable(self.spatial_size) else ensure_tuple(self.spatial_size), in_shape)
        else:  # "longest"
            if not isinstance(self.spatial_size, int):
                raise ValueError(f"spatial_size must be an int number if size_mode is 'longest', got {self.spatial_size}.")
            scale = self.spatial_size / max(in_shape)
            out_size = tuple(int(round(s * scale)) for s in in_shape)
        out_size = tuple(int(s) for s in out_size)
        ac = self.align_corners if align_corners is None else align_corners
        if ac:
            M = np.eye(sr + 1, dtype=np.float64)
            for d in range(sr):
                M[d, d] = (in_shape[d] - 1.0) / max(out_size[d] - 1.0, 1.0)
        else:
            M = scale_affine(in_shape, out_size, centered=True)
        if anti_aliasing and any(o < i for o, i in zip(out_size, in_shape)):
            from ..ops.gaussian import gaussian_filter

            factors = np.divide(in_shape, out_size)
            if aa_sigma is None:
                aa_sigma = list(np.maximum(0.0, (factors - 1) / 2.0))
            else:
                aa_sigma = list(ensure_tuple_rep(aa_sigma, sr))
                for axis in range(sr):
                    aa_sigma[axis] = aa_sigma[axis] * int(factors[axis] > 1)
            if any(s > 0 for s in aa_sigma):
                sm = gaussian_filter(img.data, aa_sigma)
                img = img.new_like(sm)
        m_res = mode or self.mode
        data_M = None
        if str(m_res) == "nearest":
            # torch interpolate legacy nearest: index = floor(y * in/out)
            # (half-pixel "nearest-exact" is what the tracked M would give)
            data_M = np.eye(sr + 1, dtype=np.float64)
            for d in range(sr):
                data_M[d, d] = in_shape[d] / out_size[d]
                data_M[d, sr] = -0.5 + 1e-4  # floor(y*s) via round; eps dodges half-even ties
        return self._op(img, M, out_size, mode=m_res, padding_mode="border",
                        align_corners=ac, dtype=dtype or self.dtype, lazy=lazy,
                        data_matrix=data_M)


class Rotate(_SpatialLazyTransform):
    """Rotate by given angle(s) about the image center (reference: spatial/array.py:1322)."""

    def __init__(self, angle: Sequence[float] | float, keep_size: bool = True, mode="bilinear",
                 padding_mode=GridSamplePadMode.BORDER, align_corners: bool = False,
                 dtype=np.float32, lazy: bool = False):
        super().__init__(lazy=lazy)
        self.angle = angle
        self.keep_size = keep_size
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.dtype = dtype

    def __call__(self, img: Any, mode=None, padding_mode=None, align_corners=None, dtype=None,
                 lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        in_shape = img.peek_pending_shape()
        sr = len(in_shape)
        if sr not in (2, 3):
            raise ValueError(f"Rotate supports 2D/3D, got {sr}D")
        angle = ensure_tuple_rep(self.angle, 1 if sr == 2 else 3)
        rot = create_rotate(sr, angle)
        if self.keep_size:
            out_size = tuple(in_shape)
        else:
            corners = np.asarray(np.meshgrid(*[(0, dim) for dim in in_shape], indexing="ij")).reshape((sr, -1))
            corners = rot[:-1, :-1] @ corners
            out_size = tuple(np.asarray(np.ptp(corners, axis=1) + 0.5, dtype=int))
        # pull map out->in is R itself (reference spatial/functional.py:744:
        # transform = shift @ create_rotate @ shift_1); image content rotates by -theta
        # in index space, +theta in the tracked world affine
        c_in = create_translate(sr, [(s - 1) / 2.0 for s in in_shape])
        c_out = create_translate(sr, [-(s - 1) / 2.0 for s in out_size])
        M = c_in @ rot @ c_out
        return self._op(img, M, out_size, mode=mode or self.mode,
                        padding_mode=padding_mode or self.padding_mode,
                        align_corners=self.align_corners if align_corners is None else align_corners,
                        dtype=dtype or self.dtype, lazy=lazy, extra_info={"angle": list(ensure_tuple(angle))})


class RandRotate(RandomizableTransform, InvertibleTransform, LazyTransform):
    """Random rotation (reference: spatial/array.py:1826)."""

    def __init__(self, range_x=0.0, range_y=0.0, range_z=0.0, prob: float = 0.1, keep_size: bool = True,
                 mode="bilinear", padding_mode=GridSamplePadMode.BORDER, align_corners: bool = False,
                 dtype=np.float32, lazy: bool = False):
        RandomizableTransform.__init__(self, prob)
        LazyTransform.__init__(self, lazy=lazy)
        self.range_x = ensure_tuple(range_x)
        if len(self.range_x) == 1:
            self.range_x = tuple(sorted([-self.range_x[0], self.range_x[0]]))
        self.range_y = ensure_tuple(range_y)
        if len(self.range_y) == 1:
            self.range_y = tuple(sorted([-self.range_y[0], self.range_y[0]]))
        self.range_z = ensure_tuple(range_z)
        if len(self.range_z) == 1:
            self.range_z = tuple(sorted([-self.range_z[0], self.range_z[0]]))
        self.keep_size = keep_size
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.dtype = dtype
        self.x = self.y = self.z = 0.0

    def randomize(self, data: Any = None) -> None:
        super().randomize(None)
        if self._do_transform:
            self.x = self.R.uniform(low=self.range_x[0], high=self.range_x[1])
            self.y = self.R.uniform(low=self.range_y[0], high=self.range_y[1])
            self.z = self.R.uniform(low=self.range_z[0], high=self.range_z[1])

    def __call__(self, img: Any, mode=None, padding_mode=None, align_corners=None, dtype=None,
                 randomize: bool = True, lazy: bool | None = None):
        if randomize:
            self.randomize()
        if not self._do_transform:
            out = _shallow_copy(img)
            self.push_transform(out, extra_info={"skipped": True}, lazy=False)
            return out
        ndim = len(img.peek_pending_shape() if isinstance(img, MetaImage) else img.shape[1:])
        rotator = Rotate(
            angle=self.x if ndim == 2 else (self.x, self.y, self.z),
            keep_size=self.keep_size,
            mode=mode or self.mode,
            padding_mode=padding_mode or self.padding_mode,
            align_corners=self.align_corners if align_corners is None else align_corners,
            dtype=dtype or self.dtype,
        )
        lazy_ = self.lazy if lazy is None else lazy
        rotator.lazy = lazy_
        out = rotator(img)
        self.push_transform(out, replace=True, lazy=lazy_)
        return out

    def inverse(self, data):
        t = self.get_most_recent_transform(data, pop=True)
        if t.get(TraceKeys.EXTRA_INFO, {}).get("skipped"):
            return data
        data.push_applied_operation(t)
        return InvertibleTransform.inverse(self, data)


class Zoom(_SpatialLazyTransform):
    """Zoom by factor, keeping size by default (reference: spatial/array.py:1440)."""

    def __init__(self, zoom: Sequence[float] | float, mode="bilinear",
                 padding_mode="edge", align_corners: bool = False, keep_size: bool = True,
                 dtype=np.float32, lazy: bool = False, **kwargs):
        super().__init__(lazy=lazy)
        self.zoom = zoom
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.keep_size = keep_size
        self.dtype = dtype
        self.kwargs = kwargs

    def __call__(self, img: Any, mode=None, padding_mode=None, align_corners=None, dtype=None,
                 lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        in_shape = img.peek_pending_shape()
        sr = len(in_shape)
        z = ensure_tuple_rep(self.zoom, sr)
        # reference semantics (spatial/functional.py:632 zoom): interpolate to
        # floor(in*z) with half-pixel grid, then symmetric pad / center crop back
        # when keep_size — composed here into ONE pull affine
        zoomed = tuple(int(np.floor(float(s) * zi)) for s, zi in zip(in_shape, z))
        ac = self.align_corners if align_corners is None else align_corners
        M = np.eye(sr + 1, dtype=np.float64)
        for d in range(sr):
            if ac:
                s_d = (in_shape[d] - 1.0) / max(zoomed[d] - 1.0, 1.0)
                off = 0.0
            else:
                s_d = in_shape[d] / zoomed[d]
                off = (s_d - 1.0) / 2.0
            if self.keep_size and zoomed[d] < in_shape[d]:
                t_d = -((in_shape[d] - zoomed[d]) // 2)  # symmetric pad left width
            elif self.keep_size and zoomed[d] > in_shape[d]:
                t_d = (zoomed[d] // 2) - (in_shape[d] // 2)  # center-crop start
            else:
                t_d = 0
            M[d, d] = s_d
            M[d, sr] = s_d * t_d + off
        out_size = tuple(in_shape) if self.keep_size else zoomed
        lazy_ = self.lazy if lazy is None else lazy
        pm_ = padding_mode or self.padding_mode
        # eager keep_size path: resample to the zoomed size then pad/crop the ARRAY,
        # exactly like the reference's interpolate + ResizeWithPadOrCrop — a single
        # composed resample differs in the padded boundary band. Lazy mode keeps the
        # composed one-resample op (same trade-off as the reference's lazy zoom).
        if (not lazy_ and self.keep_size and zoomed != tuple(in_shape)
                and not (isinstance(img, MetaImage) and img.pending_operations)):
            from .lazy_utils import apply_affine_to_data

            m_, _ = resolves_modes(mode or self.mode, pm_)
            Mz = np.eye(sr + 1, dtype=np.float64)
            for d in range(sr):
                if str(mode or self.mode) == "nearest":
                    Mz[d, d] = in_shape[d] / zoomed[d]
                    Mz[d, sr] = -0.5 + 1e-4  # torch legacy nearest: floor(y*s); eps dodges half-even ties
                elif ac:
                    Mz[d, d] = (in_shape[d] - 1.0) / max(zoomed[d] - 1.0, 1.0)
                else:
                    Mz[d, d] = in_shape[d] / zoomed[d]
                    Mz[d, sr] = (Mz[d, d] - 1.0) / 2.0
            dat = apply_affine_to_data(img.data if isinstance(img, MetaImage) else img,
                                       Mz, zoomed, mode=m_, padding_mode="border",
                                       align_corners=bool(ac))
            slices, pads, need_pad = [slice(None)], [(0, 0)], False
            for d in range(sr):
                if zoomed[d] > in_shape[d]:
                    start = (zoomed[d] // 2) - (in_shape[d] // 2)
                    slices.append(slice(start, start + in_shape[d]))
                    pads.append((0, 0))
                else:
                    w = in_shape[d] - zoomed[d]
                    slices.append(slice(None))
                    pads.append((w // 2, w - w // 2))
                    need_pad = need_pad or w > 0
            dat = dat[tuple(slices)]
            if need_pad:
                np_mode = {"zeros": "constant", "constant": "constant", "border": "edge",
                           "edge": "edge", "replicate": "edge", "reflection": "reflect",
                           "reflect": "reflect", "circular": "wrap", "wrap": "wrap",
                           "symmetric": "symmetric"}.get(str(pm_), "edge")
                mod = np if isinstance(dat, np.ndarray) else __import__("jax.numpy", fromlist=["pad"])
                dat = mod.pad(dat, pads, mode=np_mode)
            if not isinstance(img, MetaImage) or not get_track_meta():
                return MetaImage(dat) if isinstance(img, MetaImage) else dat
            tracked = img.new_like(img.data)
            m2_, pm2_ = resolves_modes(mode or self.mode, pm_)
            self.push_transform(tracked, affine=M, sp_size=out_size, mode=m2_, padding_mode=pm2_,
                                align_corners=ac, dtype=dtype or self.dtype, lazy=True,
                                orig_size=in_shape, extra_info={"zoom": list(z)})
            from .lazy_executor import promote_pending_with_data

            return promote_pending_with_data(tracked, dat)
        data_M = None
        if str(mode or self.mode) == "nearest":
            data_M = np.eye(sr + 1, dtype=np.float64)
            for d in range(sr):
                data_M[d, d] = in_shape[d] / zoomed[d]
                data_M[d, sr] = -0.5 + 1e-4  # floor(y*s) via round; eps dodges half-even ties  # torch legacy nearest
        return self._op(img, M, out_size, mode=mode or self.mode,
                        padding_mode=pm_,
                        align_corners=ac,
                        dtype=dtype or self.dtype, lazy=lazy, extra_info={"zoom": list(z)},
                        data_matrix=data_M)


class RandZoom(RandomizableTransform, InvertibleTransform, LazyTransform):
    """Random zoom (reference: spatial/array.py:1943)."""

    def __init__(self, prob: float = 0.1, min_zoom=0.9, max_zoom=1.1, mode="bilinear",
                 padding_mode="edge", align_corners: bool = False, keep_size: bool = True,
                 dtype=np.float32, lazy: bool = False, **kwargs):
        RandomizableTransform.__init__(self, prob)
        LazyTransform.__init__(self, lazy=lazy)
        self.min_zoom = ensure_tuple(min_zoom)
        self.max_zoom = ensure_tuple(max_zoom)
        if len(self.min_zoom) != len(self.max_zoom):
            raise ValueError(f"min_zoom and max_zoom must have same length, got {min_zoom} and {max_zoom}.")
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.keep_size = keep_size
        self.dtype = dtype
        self.kwargs = kwargs
        self._zoom: Sequence[float] = (1.0,)

    def randomize(self, img: Any) -> None:
        super().randomize(None)
        if not self._do_transform:
            return
        self._zoom = [self.R.uniform(l, h) for l, h in zip(self.min_zoom, self.max_zoom)]
        ndim = len(img.shape) - 1
        if len(self._zoom) == 1:
            self._zoom = ensure_tuple_rep(self._zoom[0], ndim)
        elif len(self._zoom) == 2 and ndim > 2:
            self._zoom = ensure_tuple_rep(self._zoom[0], ndim - 1) + ensure_tuple(self._zoom[-1])

    def __call__(self, img: Any, mode=None, padding_mode=None, align_corners=None, dtype=None,
                 randomize: bool = True, lazy: bool | None = None):
        if randomize:
            self.randomize(img)
        if not self._do_transform:
            out = _shallow_copy(img)
            self.push_transform(out, extra_info={"skipped": True}, lazy=False)
            return out
        zoomer = Zoom(self._zoom, mode=mode or self.mode, padding_mode=padding_mode or self.padding_mode,
                      align_corners=self.align_corners if align_corners is None else align_corners,
                      keep_size=self.keep_size, dtype=dtype or self.dtype, **self.kwargs)
        lazy_ = self.lazy if lazy is None else lazy
        zoomer.lazy = lazy_
        out = zoomer(img)
        self.push_transform(out, replace=True, lazy=lazy_)
        return out

    def inverse(self, data):
        t = self.get_most_recent_transform(data, pop=True)
        if t.get(TraceKeys.EXTRA_INFO, {}).get("skipped"):
            return data
        data.push_applied_operation(t)
        return InvertibleTransform.inverse(self, data)


class AffineGrid(LazyTransform):
    """Build the affine matrix from rotate/shear/translate/scale params
    (reference: spatial/array.py:1662).  In this framework the 'grid' is virtual — we
    return the matrix; densification happens in the fused resample."""

    def __init__(self, rotate_params=None, shear_params=None, translate_params=None, scale_params=None,
                 dtype=np.float32, align_corners: bool = False, affine=None, lazy: bool = False):
        LazyTransform.__init__(self, lazy=lazy)
        self.rotate_params = rotate_params
        self.shear_params = shear_params
        self.translate_params = translate_params
        self.scale_params = scale_params
        self.dtype = dtype
        self.align_corners = align_corners
        self.affine = affine

    def __call__(self, spatial_size=None, grid=None, lazy: bool | None = None):
        sr = len(spatial_size) if spatial_size is not None else 3
        if self.affine is not None:
            return None, np.asarray(self.affine, dtype=np.float64)
        affine = np.eye(sr + 1, dtype=np.float64)
        if self.rotate_params:
            affine = affine @ create_rotate(sr, self.rotate_params)
        if self.shear_params:
            affine = affine @ create_shear(sr, self.shear_params)
        if self.translate_params:
            affine = affine @ create_translate(sr, self.translate_params)
        if self.scale_params:
            affine = affine @ create_scale(sr, self.scale_params)
        return None, affine


class RandAffineGrid(Randomizable, LazyTransform):
    """Randomized affine parameters (reference: spatial/array.py:1801)."""

    def __init__(self, rotate_range=None, shear_range=None, translate_range=None, scale_range=None,
                 dtype=np.float32, lazy: bool = False):
        LazyTransform.__init__(self, lazy=lazy)
        self.rotate_range = ensure_tuple(rotate_range)
        self.shear_range = ensure_tuple(shear_range)
        self.translate_range = ensure_tuple(translate_range)
        self.scale_range = ensure_tuple(scale_range)
        self.rotate_params: list[float] | None = None
        self.shear_params: list[float] | None = None
        self.translate_params: list[float] | None = None
        self.scale_params: list[float] | None = None
        self.dtype = dtype

    def _get_rand_param(self, param_range, add_scalar: float = 0.0):
        out_param = []
        for f in param_range:
            if issequenceiterable(f):
                if len(f) != 2:
                    raise ValueError(f"If giving range as [min,max], should have 2 elements per dim, got {f}.")
                out_param.append(self.R.uniform(f[0], f[1]) + add_scalar)
            elif f is not None:
                out_param.append(self.R.uniform(-f, f) + add_scalar)
        return out_param

    def randomize(self, data: Any = None) -> None:
        self.rotate_params = self._get_rand_param(self.rotate_range)
        self.shear_params = self._get_rand_param(self.shear_range)
        self.translate_params = self._get_rand_param(self.translate_range)
        self.scale_params = self._get_rand_param(self.scale_range, 1.0)

    def __call__(self, spatial_size=None, grid=None, randomize: bool = True, lazy: bool | None = None):
        if randomize:
            self.randomize()
        affine_grid = AffineGrid(rotate_params=self.rotate_params, shear_params=self.shear_params,
                                 translate_params=self.translate_params, scale_params=self.scale_params,
                                 dtype=self.dtype)
        return affine_grid(spatial_size, grid)

    def get_transformation_matrix(self):
        return self._matrix if hasattr(self, "_matrix") else None


class Affine(_SpatialLazyTransform):
    """Affine transform about the image center (reference: spatial/array.py:2120)."""

    def __init__(self, rotate_params=None, shear_params=None, translate_params=None, scale_params=None,
                 affine=None, spatial_size=None, mode="bilinear", padding_mode="reflection",
                 normalized: bool = False, dtype=np.float32, align_corners: bool = False,
                 image_only: bool = False, lazy: bool = False):
        super().__init__(lazy=lazy)
        self.affine_grid = AffineGrid(rotate_params, shear_params, translate_params, scale_params,
                                      dtype=dtype, affine=affine)
        self.image_only = image_only
        self.spatial_size = spatial_size
        self.mode = mode
        self.padding_mode = padding_mode
        self.dtype = dtype
        self.align_corners = align_corners

    @staticmethod
    def centered_matrix(P: np.ndarray, in_shape, out_shape) -> np.ndarray:
        """Embed a centered-voxel-space matrix P into index space:
        in_idx = c_in + P @ (out_idx - c_out)."""
        sr = len(in_shape)
        c_in = create_translate(sr, [(s - 1) / 2.0 for s in in_shape])
        c_out = create_translate(sr, [-(s - 1) / 2.0 for s in out_shape])
        return c_in @ P @ c_out

    def __call__(self, img: Any, spatial_size=None, mode=None, padding_mode=None, lazy: bool | None = None):
        img = MetaImage.ensure_meta(img)
        in_shape = img.peek_pending_shape()
        sp_size = tuple(int(s) for s in fall_back_tuple(spatial_size or self.spatial_size, in_shape))
        _, P = self.affine_grid(spatial_size=sp_size)
        M = self.centered_matrix(P, in_shape, sp_size)
        out = self._op(img, M, sp_size, mode=mode or self.mode,
                       padding_mode=padding_mode or self.padding_mode,
                       align_corners=self.align_corners, dtype=self.dtype, lazy=lazy,
                       extra_info={"affine": P.tolist()})
        return out if self.image_only else (out, P)


class RandAffine(RandomizableTransform, InvertibleTransform, LazyTransform):
    """Random affine (reference: spatial/array.py:2317)."""

    def __init__(self, prob: float = 0.1, rotate_range=None, shear_range=None, translate_range=None,
                 scale_range=None, spatial_size=None, mode="bilinear", padding_mode="reflection",
                 cache_grid: bool = False, dtype=np.float32, lazy: bool = False):
        RandomizableTransform.__init__(self, prob)
        LazyTransform.__init__(self, lazy=lazy)
        self.rand_affine_grid = RandAffineGrid(rotate_range, shear_range, translate_range, scale_range,
                                               dtype=dtype)
        self.spatial_size = spatial_size
        self.mode = mode
        self.padding_mode = padding_mode
        self.dtype = dtype

    def set_random_state(self, seed=None, state=None):
        self.rand_affine_grid.set_random_state(seed, state)
        super().set_random_state(seed, state)
        return self

    def randomize(self, data: Any = None) -> None:
        super().randomize(None)
        if self._do_transform:
            self.rand_affine_grid.randomize()

    def __call__(self, img: Any, spatial_size=None, mode=None, padding_mode=None,
                 randomize: bool = True, lazy: bool | None = None):
        if randomize:
            self.randomize()
        img = MetaImage.ensure_meta(img)
        in_shape = img.peek_pending_shape()
        sp_size = tuple(int(s) for s in fall_back_tuple(spatial_size or self.spatial_size, in_shape))
        do_resampling = self._do_transform or (sp_size != ensure_tuple(in_shape))
        if not do_resampling:
            img = _shallow_copy(img)
            self.push_transform(img, extra_info={"skipped": True}, lazy=False)
            return img
        if self._do_transform:
            # the reference randomizes a SECOND time inside RandAffineGrid.__call__
            # (spatial/array.py:2453 passes randomize=randomize) — mirror it so
            # seeded runs consume the identical RNG stream
            _, P = self.rand_affine_grid(spatial_size=sp_size, randomize=randomize)
        else:
            P = np.eye(len(in_shape) + 1, dtype=np.float64)
        M = Affine.centered_matrix(P, in_shape, sp_size)
        # shared op path, recorded under this transform's own class name
        out = _SpatialLazyTransform._op(self, img, M, sp_size, mode=mode or self.mode,
                                        padding_mode=padding_mode or self.padding_mode,
                                        dtype=self.dtype, lazy=self.lazy if lazy is None else lazy,
                                        extra_info={"affine": P.tolist()})
        return out

    def inverse(self, data):
        t = self.get_most_recent_transform(data, pop=True)
        if t.get(TraceKeys.EXTRA_INFO, {}).get("skipped"):
            return data
        data.push_applied_operation(t)
        return InvertibleTransform.inverse(self, data)


def _dense_displacement_resample(img: Any, grid: Any, mode, padding_mode):
    """Resample with a dense voxel-coordinate grid (elastic/distortion path)."""
    m, pm = resolves_modes(mode, padding_mode)
    data = img.data if isinstance(img, MetaImage) else img
    if is_jax(data) and not is_jax(grid):
        import jax.numpy as jnp

        grid = jnp.asarray(grid)
    out = grid_pull(data, grid, interpolation=m, bound=pm)
    if isinstance(img, MetaImage):
        return img.new_like(out)
    return out


class GridDistortion(Transform):
    """Distort the sampling grid per cell (reference: spatial/array.py:2914). Not lazy."""

    def __init__(self, num_cells: int | Sequence[int], distort_steps: Sequence[Sequence[float]],
                 mode="bilinear", padding_mode="border"):
        self.num_cells = num_cells
        self.distort_steps = distort_steps
        self.mode = mode
        self.padding_mode = padding_mode

    def __call__(self, img: Any, distort_steps=None, mode=None, padding_mode=None):
        distort_steps = self.distort_steps if distort_steps is None else distort_steps
        spatial_shape = img.shape[1:]
        sr = len(spatial_shape)
        num_cells = ensure_tuple_rep(self.num_cells, sr)
        if any(len(d) != n + 1 for d, n in zip(distort_steps, num_cells)):
            raise ValueError("num_cells and distort_steps should be of same length.")
        # build warped 1-D coordinate maps then meshgrid
        coords_1d = []
        for dim_idx, n_cells in enumerate(num_cells):
            dim_size = spatial_shape[dim_idx]
            cell_size = dim_size // n_cells
            coords = np.zeros(dim_size, dtype=np.float64)
            prev = 0.0
            for idx in range(n_cells + 1):
                start = int(idx * cell_size)
                end = start + cell_size
                if end > dim_size:
                    end = dim_size
                    cur = dim_size
                else:
                    cur = prev + cell_size * distort_steps[dim_idx][idx]
                # endpoint-inclusive, like torch.linspace (reference spatial/array.py:3262)
                coords[start:end] = np.linspace(prev, cur, end - start)
                prev = cur
            coords_1d.append(coords)
        mesh = np.stack(np.meshgrid(*coords_1d, indexing="ij"), axis=-1)
        out = _dense_displacement_resample(img, mesh, mode or self.mode, padding_mode or self.padding_mode)
        return out


class RandGridDistortion(RandomizableTransform):
    """Random grid distortion (reference: spatial/array.py:3000)."""

    def __init__(self, num_cells: int | Sequence[int] = 5, prob: float = 0.1, distort_limit=(-0.03, 0.03),
                 mode="bilinear", padding_mode="border"):
        RandomizableTransform.__init__(self, prob)
        self.num_cells = num_cells
        if isinstance(distort_limit, (int, float)):
            self.distort_limit = (min(-distort_limit, distort_limit), max(-distort_limit, distort_limit))
        else:
            self.distort_limit = (min(distort_limit), max(distort_limit))
        self.distort_steps: Sequence[Sequence[float]] = ((1.0,),)
        self.mode = mode
        self.padding_mode = padding_mode

    def randomize(self, spatial_shape: Sequence[int]) -> None:
        super().randomize(None)
        if not self._do_transform:
            return
        self.distort_steps = tuple(
            tuple(1.0 + self.R.uniform(low=self.distort_limit[0], high=self.distort_limit[1],
                                       size=n_cells + 1))
            for n_cells in ensure_tuple_rep(self.num_cells, len(spatial_shape))
        )

    def __call__(self, img: Any, mode=None, padding_mode=None, randomize: bool = True):
        if randomize:
            self.randomize(img.shape[1:])
        if not self._do_transform:
            return img
        return GridDistortion(self.num_cells, self.distort_steps, mode or self.mode,
                              padding_mode or self.padding_mode)(img)


def _cubic_resize_axis(arr: np.ndarray, axis: int, out_size: int, A: float = -0.75) -> np.ndarray:
    """torch-interpolate-exact bicubic resize along one axis (align_corners=False,
    cubic-convolution kernel A=-0.75, border-clamped taps)."""
    in_size = arr.shape[axis]
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
    f = np.floor(src).astype(np.int64)
    t = src - f
    idx = [np.clip(f - 1 + k, 0, in_size - 1) for k in range(4)]
    w = [A * (1 + t) ** 3 - 5 * A * (1 + t) ** 2 + 8 * A * (1 + t) - 4 * A,
         (A + 2) * t ** 3 - (A + 3) * t ** 2 + 1,
         (A + 2) * (1 - t) ** 3 - (A + 3) * (1 - t) ** 2 + 1,
         A * (2 - t) ** 3 - 5 * A * (2 - t) ** 2 + 8 * A * (2 - t) - 4 * A]
    arr_m = np.moveaxis(arr, axis, -1)
    shape = (1,) * (arr_m.ndim - 1) + (out_size,)
    out = sum(arr_m[..., i] * wk.reshape(shape) for i, wk in zip(idx, w))
    return np.moveaxis(out, -1, axis)


def _torch_bicubic_upsample(grid: np.ndarray, scale_factors: Sequence[float]) -> np.ndarray:
    """torch.nn.functional.interpolate(mode='bicubic', align_corners=False,
    recompute_scale_factor=True) on a channel-first numpy array."""
    out_sizes = [int(np.floor(s * f)) for s, f in zip(grid.shape[1:], scale_factors)]
    out = grid.astype(np.float64)
    for ax, osz in enumerate(out_sizes):
        out = _cubic_resize_axis(out, axis=ax + 1, out_size=osz)
    return out


def _center_crop_np(arr: np.ndarray, roi: Sequence[int]) -> np.ndarray:
    """CenterSpatialCrop on a channel-first numpy array (reference croppad/array.py:513)."""
    slices = [slice(None)]
    for cur, target in zip(arr.shape[1:], roi):
        start = max(cur // 2 - target // 2, 0)
        slices.append(slice(start, start + target))
    return arr[tuple(slices)]


def _resample_centered_grid(img, grid: np.ndarray, mode, padding_mode):
    """Resample with a CENTERED homogeneous grid (reference Resample semantics:
    sample position = grid[d] + (img_dim_d - 1)/2)."""
    data = img.data if isinstance(img, MetaImage) else img
    sr = grid.shape[0] - 1 if grid.shape[0] > len(data.shape) - 1 else grid.shape[0]
    spatial = data.shape[1:]
    abs_grid = np.moveaxis(np.asarray(grid[:len(spatial)], dtype=np.float64), 0, -1)
    abs_grid = abs_grid + (np.asarray(spatial, dtype=np.float64) - 1.0) / 2.0
    return _dense_displacement_resample(img, abs_grid.astype(np.float32), mode, padding_mode)


class Rand2DElastic(RandomizableTransform):
    """Random 2-D elastic deformation: random offsets on a coarse control grid,
    bicubic-upsampled to a dense warp, composed with a random affine
    (reference: spatial/array.py:2579)."""

    def __init__(self, spacing, magnitude_range: tuple[float, float], prob: float = 0.1,
                 rotate_range=None, shear_range=None, translate_range=None, scale_range=None,
                 spatial_size=None, mode="bilinear", padding_mode="reflection"):
        RandomizableTransform.__init__(self, prob)
        self.deform_grid = RandDeformGrid(spacing=spacing, magnitude_range=magnitude_range)
        self.rand_affine_grid = RandAffineGrid(rotate_range, shear_range, translate_range, scale_range)
        self.spatial_size = spatial_size
        self.mode = mode
        self.padding_mode = padding_mode

    def set_random_state(self, seed=None, state=None):
        self.deform_grid.set_random_state(seed, state)
        self.rand_affine_grid.set_random_state(seed, state)
        super().set_random_state(seed, state)
        return self

    def randomize(self, spatial_size) -> None:
        super().randomize(None)
        if not self._do_transform:
            return
        self.deform_grid.randomize(spatial_size)
        self.rand_affine_grid.randomize()

    def __call__(self, img: Any, spatial_size=None, mode=None, padding_mode=None, randomize: bool = True):
        img_m = MetaImage.ensure_meta(img)
        sp_size = tuple(int(s) for s in fall_back_tuple(
            spatial_size if spatial_size is not None else self.spatial_size, img_m.peek_pending_shape()))
        if randomize:
            self.randomize(spatial_size=sp_size)
        if self._do_transform:
            # the reference re-randomizes the deform offsets on the CONTROL grid shape
            # inside RandDeformGrid.__call__ and the affine params inside
            # RandAffineGrid.__call__ — keep both for RNG-stream parity
            grid = self.deform_grid(spatial_size=sp_size)
            if randomize:
                self.rand_affine_grid.randomize()
            _, P = self.rand_affine_grid(spatial_size=sp_size, randomize=False)
            flat = P.astype(np.float64) @ grid.reshape(grid.shape[0], -1)
            grid = flat.reshape(grid.shape)
            grid = _torch_bicubic_upsample(grid, list(ensure_tuple(self.deform_grid.spacing)))
            grid = _center_crop_np(grid, sp_size)
        else:
            from .utils import create_grid

            grid = create_grid(spatial_size=sp_size)
        return _resample_centered_grid(img_m, grid, mode or self.mode,
                                       padding_mode or self.padding_mode)


class Rand3DElastic(RandomizableTransform):
    """Random 3-D elastic deformation: dense uniform offsets, gaussian-smoothed,
    composed with a random affine (reference: spatial/array.py:2745)."""

    def __init__(self, sigma_range: tuple[float, float], magnitude_range: tuple[float, float],
                 prob: float = 0.1, rotate_range=None, shear_range=None, translate_range=None,
                 scale_range=None, spatial_size=None, mode="bilinear", padding_mode="reflection"):
        RandomizableTransform.__init__(self, prob)
        self.sigma_range = sigma_range
        self.magnitude_range = magnitude_range
        self.rand_affine_grid = RandAffineGrid(rotate_range, shear_range, translate_range, scale_range)
        self.spatial_size = spatial_size
        self.mode = mode
        self.padding_mode = padding_mode
        self.sigma = 1.0
        self.magnitude = 1.0
        self.rand_offset: np.ndarray | None = None

    def set_random_state(self, seed=None, state=None):
        self.rand_affine_grid.set_random_state(seed, state)
        super().set_random_state(seed, state)
        return self

    def randomize(self, grid_size) -> None:
        super().randomize(None)
        if not self._do_transform:
            return
        self.rand_offset = self.R.uniform(-1.0, 1.0, [3] + list(grid_size)).astype(np.float32)
        self.magnitude = self.R.uniform(self.magnitude_range[0], self.magnitude_range[1])
        self.sigma = self.R.uniform(self.sigma_range[0], self.sigma_range[1])
        self.rand_affine_grid.randomize()

    def __call__(self, img: Any, spatial_size=None, mode=None, padding_mode=None, randomize: bool = True):
        img_m = MetaImage.ensure_meta(img)
        sp_size = tuple(int(s) for s in fall_back_tuple(
            spatial_size if spatial_size is not None else self.spatial_size, img_m.peek_pending_shape()))
        if randomize:
            self.randomize(grid_size=sp_size)
        from .utils import create_grid

        grid = np.asarray(create_grid(spatial_size=sp_size), dtype=np.float64)
        if self._do_transform:
            from ..ops.gaussian import gaussian_filter

            if self.rand_offset is None:
                raise RuntimeError("rand_offset is not initialized.")
            smooth = np.asarray(gaussian_filter(self.rand_offset, self.sigma, truncated=3.0))
            grid[:3] += smooth * self.magnitude
            if randomize:
                # reference re-randomizes the affine inside RandAffineGrid.__call__
                self.rand_affine_grid.randomize()
            _, P = self.rand_affine_grid(spatial_size=sp_size, randomize=False)
            flat = P.astype(np.float64) @ grid.reshape(grid.shape[0], -1)
            grid = flat.reshape(grid.shape)
        return _resample_centered_grid(img_m, grid, mode or self.mode,
                                       padding_mode or self.padding_mode)


class RandSimulateLowResolution(RandomizableTransform):
    """Downsample then upsample back (reference: spatial/array.py:3460)."""

    def __init__(self, prob: float = 0.1, downsample_mode="nearest", upsample_mode="trilinear",
                 zoom_range=(0.5, 1.0), align_corners=False):
        RandomizableTransform.__init__(self, prob)
        self.downsample_mode = downsample_mode
        self.upsample_mode = upsample_mode
        self.zoom_range = zoom_range
        self.align_corners = align_corners
        self.zoom_factor = 1.0

    def randomize(self, data=None) -> None:
        super().randomize(None)
        if self._do_transform:
            self.zoom_factor = self.R.uniform(self.zoom_range[0], self.zoom_range[1])

    def __call__(self, img: Any, randomize: bool = True):
        if randomize:
            self.randomize()
        if not self._do_transform:
            return img
        img = MetaImage.ensure_meta(img)
        in_shape = img.peek_pending_shape()
        small = tuple(max(int(round(s * self.zoom_factor)), 1) for s in in_shape)
        down = Resize(small, mode=self.downsample_mode)
        up = Resize(tuple(in_shape), mode="bilinear", align_corners=self.align_corners)
        out = up(down(img))
        # treat as intensity op: drop the two applied spatial ops to keep inverse simple
        if isinstance(out, MetaImage):
            out.pop_applied_operation()
            out.pop_applied_operation()
        return out


class RandDeformGrid(Randomizable, Transform):
    """Random control-grid deformation field (reference: spatial/array.py:1918)."""

    def __init__(self, spacing, magnitude_range: tuple[float, float], device=None):
        self.spacing = spacing
        self.magnitude = magnitude_range
        self.rand_mag = 1.0
        self.random_offset: np.ndarray | None = None

    def randomize(self, grid_size) -> None:
        self.random_offset = self.R.normal(
            size=([len(grid_size)] + list(grid_size))).astype(np.float32)
        self.rand_mag = self.R.uniform(self.magnitude[0], self.magnitude[1])

    def __call__(self, spatial_size):
        from .utils import create_control_grid

        spacing = fall_back_tuple(self.spacing, (1.0,) * len(spatial_size))
        control_grid = create_control_grid(spatial_size, spacing)
        self.randomize(control_grid.shape[1:])
        control_grid = np.asarray(control_grid, dtype=np.float32)
        control_grid[: len(spatial_size)] += self.rand_mag * self.random_offset
        return control_grid


class Resample(Transform):
    """Resample an image at the positions of a dense (homogeneous, centered) coordinate
    grid (reference: spatial/array.py:1962). The grid convention matches
    ``create_grid``/``AffineGrid``: coordinates are offsets from the volume center."""

    def __init__(self, mode: str = "bilinear", padding_mode: str = "border",
                 norm_coords: bool = True, device=None, align_corners: bool = False,
                 dtype=np.float64):
        self.mode = mode
        self.padding_mode = padding_mode
        self.align_corners = align_corners
        self.dtype = dtype

    def __call__(self, img: Any, grid: Any = None, mode: str | None = None,
                 padding_mode: str | None = None, dtype=None, align_corners=None):
        if grid is None:
            raise ValueError("Unknown grid.")
        import jax.numpy as jnp

        from ..ops.resample import grid_pull, resolve_mode

        data = img.data if isinstance(img, MetaImage) else img
        arr = to_jax(data).astype(jnp.float32)
        grid_j = to_jax(grid).astype(jnp.float32)
        spatial = arr.shape[1:]
        sd = len(spatial)
        # centered homogeneous grid -> absolute voxel coordinates, channel-last
        center = jnp.asarray([(s - 1) / 2.0 for s in spatial], jnp.float32)
        coords = grid_j[:sd] + center.reshape((sd,) + (1,) * sd)
        coords = jnp.moveaxis(coords, 0, -1)
        interp = resolve_mode(mode or self.mode)
        bound = padding_mode or self.padding_mode
        out = grid_pull(arr, coords, interpolation=interp, bound=bound,
                        align_corners=self.align_corners if align_corners is None
                        else align_corners)
        return img.new_like(out) if isinstance(img, MetaImage) else out
