"""Lazy-resampling primitives: pending-op algebra and the resample dispatch.

Parity targets: monai/transforms/lazy/utils.py (combine_transforms:68,
requires_interp:112, resample:148 with its integer fast path :196-224).

Convention: a pending op is a dict with keys from :class:`~monai_tpu.utils.enums.LazyAttr`:
``lazy_affine``  — (D+1, D+1) float64 matrix M with data_new[x] = data_old[M @ x]
                   (output-voxel → input-voxel map); image affine updates as A @ M.
``lazy_shape``   — output spatial shape.
``lazy_interpolation_mode`` / ``lazy_padding_mode`` / ``lazy_align_corners`` /
``lazy_dtype``   — resample kwargs.

Composition of op1-then-op2 is matrix product M1 @ M2 (data2[x] = data1[M2 x] =
data0[M1 M2 x]).
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..ops.resample import affine_resample
from ..utils.backend import is_jax
from ..utils.enums import LazyAttr

__all__ = ["DisplacementField", "pending_op", "combine_transforms", "kwargs_from_pending", "is_compatible_apply_kwargs",
           "requires_interp", "apply_affine_to_data", "affine_from_pending", "resample"]


def pending_op(matrix: np.ndarray, shape: Sequence[int], mode: Any = None, padding_mode: Any = None,
               align_corners: bool | None = None, dtype: Any = None, extra: dict | None = None) -> dict:
    """Build a pending-operation record."""
    op = {
        LazyAttr.AFFINE: np.asarray(matrix, dtype=np.float64),
        LazyAttr.SHAPE: tuple(int(s) for s in shape),
    }
    if mode is not None:
        op[LazyAttr.INTERP_MODE] = mode
    if padding_mode is not None:
        op[LazyAttr.PADDING_MODE] = padding_mode
    if align_corners is not None:
        op[LazyAttr.ALIGN_CORNERS] = align_corners
    if dtype is not None:
        op[LazyAttr.DTYPE] = dtype
    if extra:
        op.update(extra)
    return op


def affine_from_pending(pending_item: Any) -> np.ndarray:
    if isinstance(pending_item, (np.ndarray,)):
        return np.asarray(pending_item, dtype=np.float64)
    if isinstance(pending_item, dict):
        return np.asarray(pending_item[LazyAttr.AFFINE], dtype=np.float64)
    return np.asarray(pending_item, dtype=np.float64)


def kwargs_from_pending(pending_item: dict) -> dict:
    """Extract resample kwargs from a pending op (reference: lazy/utils.py:97)."""
    if not isinstance(pending_item, dict):
        return {}
    ret = {}
    for k in (LazyAttr.INTERP_MODE, LazyAttr.PADDING_MODE, LazyAttr.ALIGN_CORNERS, LazyAttr.DTYPE, "lazy_cval"):
        if k in pending_item:
            ret[k] = pending_item[k]
    if LazyAttr.SHAPE in pending_item:
        ret[LazyAttr.SHAPE] = pending_item[LazyAttr.SHAPE]
    return ret


def is_compatible_apply_kwargs(kwargs_1: dict, kwargs_2: dict) -> bool:
    """Whether two pending ops can be fused into one resample
    (reference: lazy/utils.py:108).  Shape keys always differ and are excluded;
    interpolation/padding must match (or be absent)."""
    for k in (LazyAttr.INTERP_MODE, LazyAttr.PADDING_MODE, LazyAttr.ALIGN_CORNERS, LazyAttr.DTYPE):
        v1, v2 = kwargs_1.get(k), kwargs_2.get(k)
        if v1 is not None and v2 is not None and v1 != v2:
            return False
    return True


def combine_transforms(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Compose two pending affines (apply ``left`` first): M = L @ R."""
    return affine_from_pending(left) @ affine_from_pending(right)


def requires_interp(matrix: np.ndarray, atol: float = 1e-5):
    """If ``matrix`` is a signed integer permutation + integer translation, return the
    (in_axis, sign, offset) description per output axis; else None
    (reference: lazy/utils.py:112 — fast path for flip/permute/crop/pad)."""
    m = np.asarray(matrix, dtype=np.float64)
    d = m.shape[0] - 1
    # bottom row must be [0...0 1]
    if not np.allclose(m[d, :d], 0, atol=atol) or not np.isclose(m[d, d], 1, atol=atol):
        return None
    t = m[:d, d]
    if not np.allclose(t, np.round(t), atol=atol):
        return None
    L = m[:d, :d]
    desc = []
    used_in = set()
    for out_ax in range(d):
        col = L[:, out_ax]
        nz = np.where(np.abs(col) > atol)[0]
        if len(nz) != 1:
            return None
        in_ax = int(nz[0])
        if in_ax in used_in:
            return None
        used_in.add(in_ax)
        s = col[in_ax]
        if not (np.isclose(abs(s), 1, atol=atol)):
            return None
        desc.append((in_ax, int(np.sign(s)), 0.0))
    # per-output-axis offset: input coordinate for axis i is L[i,:] x + t[i]
    out = []
    for out_ax, (in_ax, sign, _) in enumerate(desc):
        out.append((in_ax, sign, float(np.round(t[in_ax]))))
    return out


def apply_affine_to_data(data: Any, matrix: np.ndarray, out_shape: Sequence[int],
                         mode: Any = 1, padding_mode: str = "zeros", align_corners: bool = False,
                         cval: float = 0.0):
    """Apply an output→input voxel affine to channel-first data.

    Three execution tiers, fastest applicable wins:
    1. integer signed-permutation → pure slicing/flip/pad (no FLOPs);
    2. diagonal (axis-aligned scale+translate: Spacing/Resize/Zoom) → separable per-axis
       matmuls on the MXU (ops/separable.py);
    3. general affine → fused gather-interpolate (ops/resample.py).
    """
    desc = requires_interp(matrix)
    if desc is not None:
        return _apply_integer_affine(data, desc, tuple(int(s) for s in out_shape), padding_mode, cval)
    pm = padding_mode if padding_mode in ("zeros", "border", "reflection") else "zeros"
    from ..ops.resample import resolve_mode
    from ..ops.separable import is_separable, separable_affine_resample

    m = np.asarray(matrix, dtype=np.float64)
    if m.shape[0] - 1 == len(out_shape) and is_separable(m):
        return separable_affine_resample(data, m, out_shape, order=resolve_mode(mode), bound=pm,
                                         align_corners=align_corners)
    order = resolve_mode(mode)
    if isinstance(data, np.ndarray) and data.dtype == np.float32 and order in (0, 1):
        # host pipeline: multithreaded C++ kernel (csrc/resample_cpu.cpp), ~30x numpy
        from ..ops.native import native_affine_resample

        out = native_affine_resample(data, m, out_shape, order=order, bound=pm)
        if out is not None:
            return out
    return affine_resample(data, matrix, out_shape, mode=mode, padding_mode=pm, align_corners=align_corners)


def _apply_integer_affine(data: Any, desc, out_shape: tuple, padding_mode: str, cval: float):
    """Exact signed-permutation path: data_new[x]_axis-wise = data_old[sign*x + off].

    ``desc[out_ax] = (in_ax, sign, in_offset_for_in_ax)`` — note offsets are indexed by
    input axis in the affine's translation column; after permutation the input coord for
    in_ax is sign * x_out + off.
    """
    ns_is_jax = is_jax(data)
    import jax.numpy as jnp
    ns = jnp if ns_is_jax else np
    d = len(desc)
    # 1) permute input spatial axes so axis order matches output axes
    perm = [0] + [desc[out_ax][0] + 1 for out_ax in range(d)]  # +1 for channel dim
    x = ns.transpose(data, perm)
    pads = []
    slicer = [slice(None)]
    needs_pad = False
    for out_ax in range(d):
        in_ax, sign, off = desc[out_ax]
        n_in = x.shape[out_ax + 1]
        n_out = int(out_shape[out_ax])
        # input index u = sign * x + off for x in [0, n_out)
        if sign > 0:
            u0, u1 = int(off), int(off) + n_out  # [u0, u1)
        else:
            # u = -x + off → x=0 → off; x=n_out-1 → off-n_out+1 ; flip afterwards
            u0, u1 = int(off) - n_out + 1, int(off) + 1
        lo_pad = max(0, -u0)
        hi_pad = max(0, u1 - n_in)
        s0 = max(0, u0)
        s1 = min(n_in, u1)
        if s1 < s0:
            s0 = s1 = 0
            lo_pad = n_out
            hi_pad = 0
        pads.append((lo_pad, hi_pad))
        slicer.append(slice(s0, s1))
        if lo_pad or hi_pad:
            needs_pad = True
    x = x[tuple(slicer)]
    if needs_pad:
        np_mode = {"zeros": "constant", "border": "edge", "reflection": "reflect",
                   "constant": "constant", "edge": "edge", "reflect": "reflect",
                   "replicate": "edge", "wrap": "wrap", "symmetric": "symmetric",
                   "mean": "mean", "median": "median", "minimum": "minimum", "maximum": "maximum",
                   "linear_ramp": "linear_ramp", "empty": "constant"}.get(str(padding_mode), "constant")
        pad_width = [(0, 0)] + pads
        if np_mode == "constant":
            x = ns.pad(x, pad_width, mode="constant", constant_values=cval)
        else:
            x = ns.pad(x, pad_width, mode=np_mode)
    # 3) flip negative-sign axes
    flip_axes = [out_ax + 1 for out_ax in range(d) if desc[out_ax][1] < 0]
    if flip_axes:
        x = ns.flip(x, axis=tuple(flip_axes))
    return x


def resample(data: Any, matrix: np.ndarray, kwargs: dict | None = None):
    """Resample ``data`` by pending-op ``matrix`` + kwargs (reference: lazy/utils.py:148)."""
    kwargs = kwargs or {}
    out_shape = kwargs.get(LazyAttr.SHAPE, data.shape[1:])
    mode = kwargs.get(LazyAttr.INTERP_MODE, 1)
    padding_mode = kwargs.get(LazyAttr.PADDING_MODE, "zeros")
    align_corners = bool(kwargs.get(LazyAttr.ALIGN_CORNERS) or False)
    cval = kwargs.get("lazy_cval", 0.0)
    mode = 1 if mode is None else mode
    padding_mode = "zeros" if padding_mode is None else padding_mode
    out = apply_affine_to_data(data, matrix, out_shape, mode=mode, padding_mode=padding_mode,
                               align_corners=align_corners, cval=cval if cval is not None else 0.0)
    dtype = kwargs.get(LazyAttr.DTYPE)
    if dtype is not None and out.dtype != dtype:
        out = out.astype(dtype)
    return out


class DisplacementField:
    """Marker wrapper for a dense displacement field in the lazy pipeline
    (reference: lazy/utils.py:48). Affine pending ops are (D+1, D+1) matrices; anything
    spatially-shaped is treated as a DDF."""

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data

    @staticmethod
    def is_ddf_shaped(data) -> bool:
        if isinstance(data, DisplacementField):
            return True
        if not hasattr(data, "shape") or len(getattr(data, "shape", ())) < 3:
            return False
        shape = tuple(data.shape)
        return not (len(shape) == 2 and shape[0] == shape[1] and shape[0] in (3, 4))
