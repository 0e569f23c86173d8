"""Transform helper functions.

Parity targets: monai/transforms/utils.py (create_grid/rotate/shear/scale/translate
:758-1030, generate_spatial_bounding_box:1069, map_spatial_axes:too, crop samplers
:637,:695, get_extreme_points:1563), and small pieces of
utils_pytorch_numpy_unification.py.

All affine helpers return (D+1, D+1) float64 homogeneous matrices in voxel space.
"""
from __future__ import annotations

import itertools
import random
from typing import Any, Callable, Sequence

import numpy as np

from ..utils.backend import is_jax, to_jax, to_numpy, xp
from ..utils.misc import ensure_tuple, ensure_tuple_rep, ensure_tuple_size, fall_back_tuple

__all__ = [
    "rand_choice",
    "img_bounds",
    "is_empty",
    "is_positive",
    "zero_margins",
    "create_grid",
    "create_control_grid",
    "create_rotate",
    "create_shear",
    "create_scale",
    "create_translate",
    "generate_spatial_bounding_box",
    "map_spatial_axes",
    "generate_pos_neg_label_crop_centers",
    "generate_label_classes_crop_centers",
    "correct_crop_centers",
    "map_binary_to_indices",
    "map_classes_to_indices",
    "get_extreme_points",
    "extreme_points_to_image",
    "compute_divisible_spatial_size",
    "convert_pad_mode",
    "weighted_patch_samples",
    "check_non_lazy_pending_ops",
    "resolves_modes",
    "scale_affine",
    "get_largest_connected_component_mask",
    "convert_points_to_disc",
    "sample_points_from_label",
    "keep_merge_components_with_points",
    "Fourier",
    "remove_small_objects",
    "fill_holes",
    "distance_transform_edt",
]

from ..data.affine_utils import scale_affine  # noqa: F401 (re-export)


def rand_choice(prob: float = 0.5) -> bool:
    return bool(random.random() <= prob)


def is_positive(img):
    return img > 0


def img_bounds(img: np.ndarray):
    ax0 = np.any(img, axis=0)
    ax1 = np.any(img, axis=1)
    return np.concatenate((np.where(ax1)[0][[0, -1]], np.where(ax0)[0][[0, -1]]))


def is_empty(img) -> bool:
    return not (np.max(to_numpy(img)) > 0)


def zero_margins(img: np.ndarray, margin: int) -> bool:
    if np.any(img[:, :, :margin]) or np.any(img[:, :, -margin:]):
        return False
    return not (np.any(img[:, :margin, :]) or np.any(img[:, -margin:, :]))


# ---------------------------------------------------------------------------
# Affine constructors (voxel space, float64; reference: transforms/utils.py:758-1030)
# ---------------------------------------------------------------------------

def create_grid(spatial_size: Sequence[int], spacing: Sequence[float] | None = None,
                homogeneous: bool = True, dtype=np.float64):
    """Dense centered coordinate grid of shape (D[+1], *spatial_size)."""
    spacing = spacing or tuple(1.0 for _ in spatial_size)
    ranges = [np.linspace(-(d - 1.0) / 2.0 * s, (d - 1.0) / 2.0 * s, int(d)) for d, s in zip(spatial_size, spacing)]
    coords = np.asarray(np.meshgrid(*ranges, indexing="ij"), dtype=dtype)
    if not homogeneous:
        return coords
    return np.concatenate([coords, np.ones_like(coords[:1])])


def create_control_grid(spatial_shape: Sequence[int], spacing: Sequence[float],
                        homogeneous: bool = True, dtype=np.float64):
    """Control grid with two extra points beyond each boundary (for spline/elastic)."""
    grid_shape = []
    for d, s in zip(spatial_shape, spacing):
        d = int(d)
        if d % 2 == 0:
            grid_shape.append(np.ceil((d - 1.0) / (2.0 * s) + 0.5) * 2.0 + 2.0)
        else:
            grid_shape.append(np.ceil((d - 1.0) / (2.0 * s)) * 2.0 + 3.0)
    return create_grid(spatial_size=grid_shape, spacing=spacing, homogeneous=homogeneous, dtype=dtype)


def _assert_dim(sr: int):
    if sr not in (2, 3):
        raise ValueError(f"spatial rank must be 2 or 3, got {sr}")


def create_rotate(spatial_dims: int, radians: Sequence[float] | float) -> np.ndarray:
    """Rotation matrix; 2D: one angle; 3D: angles about axes 0,1,2 applied in order
    (reference: transforms/utils.py:839)."""
    _assert_dim(spatial_dims)
    radians = ensure_tuple(radians)
    if spatial_dims == 2:
        if len(radians) < 1:
            raise ValueError("radians must be non empty")
        sin_, cos_ = np.sin(radians[0]), np.cos(radians[0])
        return np.array([[cos_, -sin_, 0.0], [sin_, cos_, 0.0], [0.0, 0.0, 1.0]], dtype=np.float64)
    affine = None
    if len(radians) >= 1:
        sin_, cos_ = np.sin(radians[0]), np.cos(radians[0])
        affine = np.array(
            [[1.0, 0.0, 0.0, 0.0], [0.0, cos_, -sin_, 0.0], [0.0, sin_, cos_, 0.0], [0.0, 0.0, 0.0, 1.0]]
        )
    if len(radians) >= 2:
        sin_, cos_ = np.sin(radians[1]), np.cos(radians[1])
        mat = np.array(
            [[cos_, 0.0, sin_, 0.0], [0.0, 1.0, 0.0, 0.0], [-sin_, 0.0, cos_, 0.0], [0.0, 0.0, 0.0, 1.0]]
        )
        affine = mat if affine is None else affine @ mat
    if len(radians) >= 3:
        sin_, cos_ = np.sin(radians[2]), np.cos(radians[2])
        mat = np.array(
            [[cos_, -sin_, 0.0, 0.0], [sin_, cos_, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        )
        affine = mat if affine is None else affine @ mat
    if affine is None:
        raise ValueError("radians must be non empty")
    return affine.astype(np.float64)


def create_shear(spatial_dims: int, coefs: Sequence[float] | float) -> np.ndarray:
    """Shear matrix (reference: transforms/utils.py:906)."""
    _assert_dim(spatial_dims)
    if spatial_dims == 2:
        coefs = ensure_tuple_size(coefs, dim=2, pad_val=0.0)
        return np.array([[1, coefs[0], 0.0], [coefs[1], 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=np.float64)
    coefs = ensure_tuple_size(coefs, dim=6, pad_val=0.0)
    return np.array(
        [
            [1.0, coefs[0], coefs[1], 0.0],
            [coefs[2], 1.0, coefs[3], 0.0],
            [coefs[4], coefs[5], 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float64,
    )


def create_scale(spatial_dims: int, scaling_factor: Sequence[float] | float) -> np.ndarray:
    """Scaling matrix (reference: transforms/utils.py:941)."""
    scaling_factor = ensure_tuple_size(scaling_factor, dim=spatial_dims, pad_val=1.0)
    return np.diag(list(scaling_factor[:spatial_dims]) + [1.0]).astype(np.float64)


def create_translate(spatial_dims: int, shift: Sequence[float] | float) -> np.ndarray:
    """Translation matrix (reference: transforms/utils.py:963)."""
    shift = ensure_tuple(shift)
    affine = np.eye(spatial_dims + 1, dtype=np.float64)
    for i, a in enumerate(shift[:spatial_dims]):
        affine[i, spatial_dims] = a
    return affine


# ---------------------------------------------------------------------------
# Bounding boxes / crop centers / index maps
# ---------------------------------------------------------------------------

def generate_spatial_bounding_box(img: Any, select_fn: Callable = is_positive,
                                  channel_indices=None, margin: Sequence[int] | int = 0,
                                  allow_smaller: bool = True) -> tuple[list[int], list[int]]:
    """Foreground bounding box [start, end) per spatial dim
    (reference: transforms/utils.py:1069)."""
    check_non_lazy_pending_ops(img, name="generate_spatial_bounding_box")
    spatial_size = img.shape[1:]
    margin = ensure_tuple_rep(margin, len(spatial_size))
    for m in margin:
        if m < 0:
            raise ValueError(f"margin value should not be negative, got {margin}.")
    arr = img.data if hasattr(img, "data") and not isinstance(img, np.ndarray) else img
    data = select_fn(arr[channel_indices] if channel_indices is not None else arr)
    data = to_numpy(data.data if hasattr(data, "data") and not isinstance(data, np.ndarray) else data)
    data = np.any(data, axis=0)
    ndim = data.ndim
    box_start, box_end = [], []
    for di in range(ndim):
        ax = tuple(d for d in range(ndim) if d != di)
        dt = data.any(axis=ax) if ax else data
        if not np.any(dt):
            box_start.append(0)
            box_end.append(0)
            continue
        arg_max = np.where(dt)[0]
        min_d = arg_max[0] - margin[di]
        max_d = arg_max[-1] + margin[di] + 1
        if allow_smaller:
            min_d = max(min_d, 0)
            max_d = min(max_d, spatial_size[di])
        box_start.append(int(min_d))
        box_end.append(int(max_d))
    return box_start, box_end


def map_spatial_axes(img_ndim: int, spatial_axes=None, channel_first: bool = True) -> list[int]:
    """Map spatial axis indices to array axes accounting for channel dim
    (reference: transforms/utils.py:1033)."""
    if spatial_axes is None:
        return list(range(1, img_ndim) if channel_first else range(img_ndim - 1))
    spatial_axes_ = []
    for a in ensure_tuple(spatial_axes):
        if channel_first:
            spatial_axes_.append(a % img_ndim if a < 0 else a + 1)
        else:
            spatial_axes_.append((a - 1) % (img_ndim - 1) if a < 0 else a)
    return spatial_axes_


def correct_crop_centers(centers: list, spatial_size: Sequence[int] | int, label_spatial_shape: Sequence[int],
                         allow_smaller: bool = False) -> list[int]:
    """Shift centers so crops stay within the image (reference: transforms/utils.py:637)."""
    spatial_size = fall_back_tuple(spatial_size, default=label_spatial_shape)
    if any(np.subtract(label_spatial_shape, spatial_size) < 0):
        if not allow_smaller:
            raise ValueError(
                f"The size of the proposed random crop ROI {spatial_size} is larger than the image size "
                f"{label_spatial_shape}."
            )
        spatial_size = tuple(min(l, s) for l, s in zip(label_spatial_shape, spatial_size))
    valid_start = np.floor_divide(spatial_size, 2)
    valid_end = np.subtract(np.add(label_spatial_shape, 1), np.ceil(np.divide(spatial_size, 2)).astype(int))
    for i, valid_s in enumerate(valid_start):
        if valid_s == valid_end[i]:
            valid_end[i] += 1
    valid_centers = []
    for c, v_s, v_e in zip(centers, valid_start, valid_end):
        center_i = min(max(int(c), int(v_s)), int(v_e) - 1)
        valid_centers.append(center_i)
    return valid_centers


def generate_pos_neg_label_crop_centers(spatial_size, num_samples: int, pos_ratio: float,
                                        label_spatial_shape: Sequence[int], fg_indices, bg_indices,
                                        rand_state: np.random.RandomState | None = None,
                                        allow_smaller: bool = False) -> list[list[int]]:
    """Random crop centers balancing foreground/background
    (reference: transforms/utils.py:695)."""
    if rand_state is None:
        rand_state = np.random.random.__self__  # type: ignore
    centers = []
    fg_indices = np.asarray(fg_indices) if not isinstance(fg_indices, np.ndarray) else fg_indices
    bg_indices = np.asarray(bg_indices) if not isinstance(bg_indices, np.ndarray) else bg_indices
    if len(fg_indices) == 0 and len(bg_indices) == 0:
        raise ValueError("No sampling location available.")
    if len(fg_indices) == 0 or len(bg_indices) == 0:
        pos_ratio = 0 if len(fg_indices) == 0 else 1
    for _ in range(num_samples):
        indices_to_use = fg_indices if rand_state.rand() < pos_ratio else bg_indices
        random_int = rand_state.randint(len(indices_to_use))
        idx = indices_to_use[random_int]
        center = np.unravel_index(idx, label_spatial_shape)
        centers.append(correct_crop_centers(list(center), spatial_size, label_spatial_shape, allow_smaller))
    return centers


def generate_label_classes_crop_centers(spatial_size, num_samples: int, label_spatial_shape: Sequence[int],
                                        indices: Sequence, ratios: Sequence[float] | None = None,
                                        rand_state: np.random.RandomState | None = None,
                                        allow_smaller: bool = False,
                                        warn: bool = True) -> list[list[int]]:
    """Crop centers sampled per class ratio (reference: transforms/utils.py:-)."""
    if rand_state is None:
        rand_state = np.random.random.__self__  # type: ignore
    if num_samples < 1:
        raise ValueError(f"num_samples must be positive, got {num_samples}.")
    ratios_ = [1] * len(indices) if ratios is None else list(ratios)
    if len(ratios_) != len(indices):
        raise ValueError(f"random crop ratios must match the number of indices of classes, got {len(ratios_)} and {len(indices)}.")
    if any(i < 0 for i in ratios_):
        raise ValueError(f"ratios should not contain negative number, got {ratios_}.")
    for i, array in enumerate(indices):
        if len(array) == 0:
            if ratios_[i] != 0 and warn:
                import warnings

                warnings.warn(f"no available indices of class {i} to crop, setting the crop ratio of this class to zero.")
            ratios_[i] = 0
    centers = []
    classes = rand_state.choice(len(ratios_), size=num_samples, p=np.asarray(ratios_) / np.sum(ratios_))
    for i in classes:
        indices_to_use = np.asarray(indices[i])
        random_int = rand_state.randint(len(indices_to_use))
        center = np.unravel_index(indices_to_use[random_int], label_spatial_shape)
        centers.append(correct_crop_centers(list(center), spatial_size, label_spatial_shape, allow_smaller))
    return centers


def map_binary_to_indices(label: Any, image: Any = None, image_threshold: float = 0.0):
    """Fg/bg flat indices for sampling (reference: transforms/utils.py:468)."""
    label_np = to_numpy(label.data if hasattr(label, "data") and not isinstance(label, np.ndarray) else label)
    label_flat = np.any(label_np, axis=0).ravel()
    fg_indices = np.nonzero(label_flat)[0]
    if image is not None:
        img_np = to_numpy(image.data if hasattr(image, "data") and not isinstance(image, np.ndarray) else image)
        img_flat = np.any(img_np > image_threshold, axis=0).ravel()
        img_flat = img_flat & ~label_flat
        bg_indices = np.nonzero(img_flat)[0]
    else:
        bg_indices = np.nonzero(~label_flat)[0]
    return fg_indices, bg_indices


def map_classes_to_indices(label: Any, num_classes: int | None = None, image: Any = None,
                           image_threshold: float = 0.0, max_samples_per_class: int | None = None):
    """Per-class flat indices (reference: transforms/utils.py:528)."""
    img_flat = None
    if image is not None:
        img_np = to_numpy(image.data if hasattr(image, "data") and not isinstance(image, np.ndarray) else image)
        img_flat = np.any(img_np > image_threshold, axis=0).ravel()
    label_np = to_numpy(label.data if hasattr(label, "data") and not isinstance(label, np.ndarray) else label)
    indices = []
    if num_classes is not None:
        channels = [(label_np[0] == c) for c in range(num_classes)]
    else:
        channels = [label_np[c].astype(bool) for c in range(label_np.shape[0])]
    for channel in channels:
        label_flat = channel.ravel()
        if img_flat is not None:
            label_flat = label_flat & img_flat
        cls_indices = np.nonzero(label_flat)[0]
        if max_samples_per_class and len(cls_indices) > max_samples_per_class:
            cls_indices = cls_indices[:max_samples_per_class]
        indices.append(cls_indices)
    return indices


def weighted_patch_samples(spatial_size, w: Any, n_samples: int = 1,
                           r_state: np.random.RandomState | None = None) -> list:
    """Sample patch centers with probability proportional to weight map
    (reference: transforms/utils.py:392)."""
    if r_state is None:
        r_state = np.random.RandomState()
    img_size = np.asarray(w.shape, dtype=int)
    win_size = np.asarray(fall_back_tuple(spatial_size, img_size), dtype=int)
    s = tuple(slice(w // 2, m - w + w // 2 + 1) for w, m in zip(win_size, img_size))
    w = to_numpy(w.data if hasattr(w, "data") and not isinstance(w, np.ndarray) else w)
    v = w[s]
    v_flat = v.ravel().astype(np.float64)
    v_min = v_flat.min()
    if v_min < 0:
        v_flat = v_flat - v_min
    v_cum = np.cumsum(v_flat)
    if v_cum[-1] == 0:
        idx = r_state.randint(0, len(v_flat), size=n_samples)
    else:
        r = r_state.random(n_samples)
        idx = np.searchsorted(v_cum, r * v_cum[-1], side="right")
        idx = np.clip(idx, 0, len(v_flat) - 1)
    centers = [np.unravel_index(i, v.shape) for i in idx]
    return [[int(c) + int(w // 2) for c, w in zip(center, win_size)] for center in centers]


def get_extreme_points(img: Any, rand_state: np.random.RandomState | None = None, background: int = 0,
                       pert: float = 0.0) -> list[tuple[int, ...]]:
    """Extreme points of foreground (reference: transforms/utils.py:1563)."""
    if rand_state is None:
        rand_state = np.random.random.__self__  # type: ignore
    img_np = to_numpy(img.data if hasattr(img, "data") and not isinstance(img, np.ndarray) else img)
    indices = np.where(img_np != background)
    if np.size(indices[0]) == 0:
        raise ValueError("get_extreme_points: no foreground object in mask!")

    def _get_point(val, dim):
        # reference transforms/utils.py:1593: rand_state.choice over candidate
        # indices, positive 2*pert*rand() perturbation, int() truncation
        idx = np.where(indices[dim] == val)[0]
        idx = rand_state.choice(idx) if rand_state is not None else idx
        pt = []
        for j in range(img_np.ndim):
            val_ = int(indices[j][idx] + 2.0 * pert * (rand_state.rand() if rand_state is not None else 0.0))
            val_ = max(val_, 0)
            val_ = min(val_, img_np.shape[j] - 1)
            pt.append(val_)
        return tuple(pt)

    points = []
    for i in range(img_np.ndim):
        points.append(_get_point(indices[i].min(), i))
        points.append(_get_point(indices[i].max(), i))
    return points


def extreme_points_to_image(points: list, label: Any, sigma=0.0, rescale_min: float = -1.0,
                            rescale_max: float = 1.0):
    """Gaussian heatmap channel from extreme points (reference: transforms/utils.py:1616)."""
    from ..ops.gaussian import gaussian_filter

    label_np = to_numpy(label.data if hasattr(label, "data") and not isinstance(label, np.ndarray) else label)
    points_image = np.zeros(label_np.shape[1:], dtype=np.float32)
    for p in points:
        points_image[tuple(p)] = 1.0
    if np.any(np.asarray(sigma) > 0):
        points_image = np.asarray(gaussian_filter(points_image[None], sigma))[0]
    min_intensity, max_intensity = np.min(points_image), np.max(points_image)
    if max_intensity > min_intensity:
        points_image = (points_image - min_intensity) / (max_intensity - min_intensity)
    points_image = points_image * (rescale_max - rescale_min) + rescale_min
    return points_image[None]


def compute_divisible_spatial_size(spatial_shape: Sequence[int], k: Sequence[int] | int) -> tuple:
    """Smallest size >= shape divisible by k (reference: transforms/utils.py:1721)."""
    k = fall_back_tuple(k, (1,) * len(spatial_shape))
    return tuple(int(np.ceil(dim / k_d) * k_d) if k_d > 0 else int(dim) for dim, k_d in zip(spatial_shape, k))


def convert_pad_mode(dst: Any, mode: str | None):
    """Normalize a pad-mode string for the backend of ``dst``."""
    mapping = {"zeros": "constant", "border": "edge", "reflection": "reflect", "replicate": "edge",
               "circular": "wrap"}
    return mapping.get(str(mode), str(mode) if mode is not None else "constant")


def check_non_lazy_pending_ops(input_array: Any, name: str | None = None, raise_error: bool = False) -> None:
    """Warn/raise when data-dependent helpers see unevaluated pending ops
    (reference: transforms/utils.py:2113)."""
    from ..data.meta_image import MetaImage

    if isinstance(input_array, MetaImage) and input_array.pending_operations:
        msg = f"data-dependent helper {name or ''} called on an image with pending lazy operations"
        if raise_error:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg)


def resolves_modes(interp_mode, padding_mode):
    """Normalize (mode, padding_mode) pairs to kernel args."""
    from ..ops.resample import resolve_mode

    m = resolve_mode(interp_mode if interp_mode is not None else 1)
    pm = str(padding_mode) if padding_mode is not None else "zeros"
    if pm in ("constant",):
        pm = "zeros"
    if pm in ("edge", "replicate"):
        pm = "border"
    if pm in ("reflect", "mirror"):
        pm = "reflection"
    return m, pm


# ---------------------------------------------------------------------------
# Morphology-ish helpers used by post transforms & metrics (host-side scipy)
# ---------------------------------------------------------------------------

def get_largest_connected_component_mask(img: Any, connectivity: int | None = None,
                                         num_components: int = 1):
    """Largest connected component(s) mask (reference: transforms/utils.py:1822 using cucim/skimage;
    here scipy.ndimage.label on host — Pallas jump-flooding is a future optimization)."""
    from scipy import ndimage as ndi

    img_np = to_numpy(img.data if hasattr(img, "data") and not isinstance(img, np.ndarray) else img)
    out = np.zeros_like(img_np, dtype=bool)
    structure = None
    if connectivity is not None:
        structure = ndi.generate_binary_structure(img_np.ndim, connectivity)
    labeled, num = ndi.label(img_np.astype(bool), structure=structure)
    if num > 0:
        sizes = np.bincount(labeled.ravel())
        sizes[0] = 0
        keep = np.argsort(sizes)[::-1][:num_components]
        keep = keep[sizes[keep] > 0]
        out = np.isin(labeled, keep)
    from ..utils.type_conversion import convert_to_dst_type

    res, *_ = convert_to_dst_type(out.astype(img_np.dtype), img, dtype=img_np.dtype)
    return res


def remove_small_objects(img: Any, min_size: int = 64, connectivity: int = 1,
                         independent_channels: bool = True, by_measure: bool = False,
                         pixdim=None):
    """Remove components smaller than min_size (reference: post/array.py RemoveSmallObjects)."""
    from scipy import ndimage as ndi

    img_np = to_numpy(img.data if hasattr(img, "data") and not isinstance(img, np.ndarray) else img)
    if by_measure and pixdim is not None:
        vox = float(np.prod(pixdim))
        min_size = int(np.ceil(min_size / max(vox, 1e-12)))

    def _filter(arr):
        structure = ndi.generate_binary_structure(arr.ndim, connectivity)
        out = np.zeros_like(arr)
        for val in np.unique(arr[arr != 0]):
            mask = arr == val
            labeled, _ = ndi.label(mask, structure=structure)
            sizes = np.bincount(labeled.ravel())
            keep_labels = np.where(sizes >= min_size)[0]
            keep_labels = keep_labels[keep_labels != 0]
            out[np.isin(labeled, keep_labels)] = val
        return out

    if independent_channels:
        out_np = np.stack([_filter(c) for c in img_np])
    else:
        out_np = _filter(img_np)
    from ..utils.type_conversion import convert_to_dst_type

    res, *_ = convert_to_dst_type(out_np, img)
    return res


def fill_holes(img_arr: np.ndarray, applied_labels=None, connectivity: int | None = None) -> np.ndarray:
    """Fill holes per channel/label (reference: transforms/utils.py:1876)."""
    from scipy import ndimage as ndi

    img_np = to_numpy(img_arr)
    out = img_np.copy()
    channels = img_np.shape[0]
    structure = None
    if connectivity is not None and img_np.ndim - 1 >= 1:
        structure = ndi.generate_binary_structure(img_np.ndim - 1, connectivity)
    for c in range(channels):
        labels = applied_labels if applied_labels is not None else np.unique(img_np[c][img_np[c] != 0])
        for lab in np.atleast_1d(labels):
            mask = img_np[c] == lab
            filled = ndi.binary_fill_holes(mask, structure=structure)
            out[c][filled & ~mask] = lab
    return out


def distance_transform_edt(img: Any, sampling=None):
    """Euclidean distance transform (reference: transforms/utils.py:2426 — cucim on GPU;
    here scipy on host; a Pallas jump-flood is the future device path)."""
    from scipy import ndimage as ndi

    img_np = to_numpy(img.data if hasattr(img, "data") and not isinstance(img, np.ndarray) else img)
    # channel-first convention: EDT per channel
    out = np.stack([ndi.distance_transform_edt(c, sampling=sampling) for c in img_np])
    from ..utils.type_conversion import convert_to_dst_type

    res, *_ = convert_to_dst_type(out, img, dtype=np.float32)
    return res


def convert_points_to_disc(image_size, point, point_label, radius: int = 2, disc: bool = False):
    """Rasterize click points into 2-channel (negative, positive) gaussian/disc masks
    (reference: transforms/utils.py:1298). Vectorized over all points — on TPU this is a
    single fused broadcast/exp rather than the reference's per-point python loop."""
    import jax.numpy as jnp

    pts = jnp.asarray(to_jax(point), jnp.float32)          # [B, N, 3]
    lbl = jnp.asarray(to_jax(point_label))                  # [B, N]
    h, w, d = (int(s) for s in image_size)
    grid = jnp.stack(jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  jnp.arange(d, dtype=jnp.float32), indexing="ij"), axis=-1)
    # [B, N, H, W, D]: squared distance of every voxel to every point
    diff = grid[None, None] - pts[:, :, None, None, None, :]
    sq = jnp.sum(diff * diff, axis=-1)
    contrib = (sq < radius ** 2).astype(jnp.float32) if disc else jnp.exp(-sq / (2.0 * radius ** 2))
    valid = lbl > -1
    positive = (lbl == 1) | (lbl == 3)
    neg_mask = (valid & ~positive)[:, :, None, None, None]
    pos_mask = (valid & positive)[:, :, None, None, None]
    neg = jnp.sum(contrib * neg_mask, axis=1)
    pos = jnp.sum(contrib * pos_mask, axis=1)
    return jnp.stack([neg, pos], axis=1)  # [B, 2, H, W, D]


def sample_points_from_label(labels, label_set, max_ppoint: int = 1, max_npoint: int = 0,
                             device=None, use_center: bool = False,
                             rand_state: np.random.RandomState | None = None):
    """Sample clicks from a label map, one row per class in ``label_set``
    (reference: transforms/utils.py:1334). Host-side numpy."""
    from scipy import ndimage as ndi

    rs = rand_state or np.random.RandomState()
    lab = to_numpy(labels)
    if lab.shape[0] != 1:
        raise ValueError("labels must have batch size 1.")
    lab = lab[0, 0]
    uniq = set(np.unique(lab).tolist())
    points, point_labels = [], []
    n_total = max_ppoint + max_npoint
    for cid in label_set:
        if cid in uniq:
            pmask = lab == cid
            eroded = ndi.binary_erosion(pmask)
            core = get_largest_connected_component_mask(eroded) if eroded.any() else pmask
            ppts = np.argwhere(core if np.asarray(core).any() else pmask)
            npts = np.argwhere(~pmask)
            num_p = min(len(ppts), max_ppoint)
            num_n = min(len(npts), max_npoint)
            if use_center and num_p > 0:
                dist = ((ppts - ppts.mean(0)) ** 2).sum(-1)
                order = np.argsort(dist)
            else:
                order = rs.permutation(len(ppts))
            rows = [ppts[order[i]] for i in range(num_p)]
            rows += [npts[rs.randint(len(npts))] for _ in range(num_n)]
            labs = [1] * num_p + [0] * num_n
            while len(rows) < n_total:
                rows.append(np.zeros(3, dtype=np.int64))
                labs.append(-1)
            points.append(np.stack(rows))
            point_labels.append(labs)
        else:
            points.append(np.zeros((n_total, 3), dtype=np.int64))
            point_labels.append([-1] * n_total)
    return np.stack(points).astype(np.float32), np.asarray(point_labels, dtype=np.int64)


def keep_merge_components_with_points(img_pos, img_neg, point_coords, point_labels,
                                      pos_val=(1, 3), neg_val=(0, 2), margins: int = 3):
    """Keep connected components of img_pos/img_neg that contain the respective points
    (reference: transforms/utils.py:1183). Host-side scipy labeling."""
    from scipy import ndimage as ndi

    pos = to_numpy(img_pos).astype(bool)
    neg = to_numpy(img_neg).astype(bool)
    pts = np.round(to_numpy(point_coords)).astype(int)
    lbls = to_numpy(point_labels)
    structure = ndi.generate_binary_structure(3, 3)
    out = np.zeros_like(pos)
    for b in range(pts.shape[0]):
        feats_pos, _ = ndi.label(pos[b, 0], structure=structure)
        feats_neg, _ = ndi.label(neg[b, 0], structure=structure)
        for i, p in enumerate(pts[b]):
            l = int(lbls[b, i])
            if l in pos_val:
                features = feats_pos
            elif l in neg_val:
                features = feats_neg
            else:
                continue
            shape = features.shape
            for margin in range(margins):
                x, y, z = p.tolist()
                l0, h0 = max(x - margin, 0), min(x + margin + 1, shape[0])
                l1, h1 = max(y - margin, 0), min(y + margin + 1, shape[1])
                l2, h2 = max(z - margin, 0), min(z + margin + 1, shape[2])
                region = features[l0:h0, l1:h1, l2:h2]
                ids = np.unique(region)
                ids = ids[ids > 0]
                if len(ids) > 0:
                    out[b, 0] |= np.isin(features, ids)
                    break
    return out


class Fourier:
    """Centered FFT helpers over spatial dims (reference: transforms/utils.py:1859)."""

    @staticmethod
    def shift_fourier(x, spatial_dims: int, as_contiguous: bool = False):
        dims = tuple(range(-spatial_dims, 0))
        if is_jax(x):
            import jax.numpy as jnp

            return jnp.fft.fftshift(jnp.fft.fftn(x, axes=dims), axes=dims)
        k = np.fft.fftshift(np.fft.fftn(x, axes=dims), axes=dims)
        return np.ascontiguousarray(k) if as_contiguous else k

    @staticmethod
    def inv_shift_fourier(k, spatial_dims: int, n_dims=None, as_contiguous: bool = False):
        dims = tuple(range(-spatial_dims, 0))
        if is_jax(k):
            import jax.numpy as jnp

            return jnp.fft.ifftn(jnp.fft.ifftshift(k, axes=dims), axes=dims).real
        out = np.fft.ifftn(np.fft.ifftshift(k, axes=dims), axes=dims).real
        return np.ascontiguousarray(out) if as_contiguous else out


def in_bounds(x: float, y: float, margin: float, maxx: float, maxy: float) -> bool:
    """(x, y) within the margin-inset rectangle (reference: transforms/utils.py:198)."""
    return bool(margin <= x < (maxx - margin) and margin <= y < (maxy - margin))


def rescale_array(arr, minv: float | None = 0.0, maxv: float | None = 1.0, dtype=np.float32):
    """Rescale to [minv, maxv]; normalized only if either bound is None
    (reference: transforms/utils.py:229)."""
    ns = xp(arr)
    if dtype is not None:
        arr = arr.astype(dtype) if hasattr(arr, "astype") else ns.asarray(arr, dtype)
    mina = arr.min()
    maxa = arr.max()
    if mina == maxa:
        return arr * minv if minv is not None else arr
    norm = (arr - mina) / (maxa - mina)
    if (minv is None) or (maxv is None):
        return norm
    return (norm * (maxv - minv)) + minv


def rescale_instance_array(arr: np.ndarray, minv: float | None = 0.0, maxv: float | None = 1.0,
                           dtype=np.float32) -> np.ndarray:
    """Per-channel rescale along dim 0 (reference: transforms/utils.py:260)."""
    out = np.zeros(arr.shape, dtype or arr.dtype)
    for i in range(arr.shape[0]):
        out[i] = np.asarray(rescale_array(np.asarray(arr[i]), minv, maxv, dtype))
    return out


def rescale_array_int_max(arr: np.ndarray, dtype=np.uint16) -> np.ndarray:
    """Rescale to the full integer range of dtype (reference: transforms/utils.py:273)."""
    info = np.iinfo(dtype or arr.dtype)
    return np.asarray(rescale_array(arr, info.min, info.max), dtype=dtype or arr.dtype)


def copypaste_arrays(src_shape, dest_shape, srccenter, destcenter, dims):
    """Slices to copy a centred region between arrays, clipped to both shapes
    (reference: transforms/utils.py:281)."""
    srcslices = [slice(None)] * len(src_shape)
    destslices = [slice(None)] * len(dest_shape)
    for i, ss, ds, sc, dc, dim in zip(range(len(src_shape)), src_shape, dest_shape,
                                      srccenter, destcenter, dims):
        if dim:
            d1 = int(np.clip(dim // 2, 0, min(sc, dc)))
            d2 = int(np.clip(dim // 2 + 1, 0, min(ss - sc, ds - dc)))
            srcslices[i] = slice(sc - d1, sc + d2)
            destslices[i] = slice(dc - d1, dc + d2)
    return tuple(srcslices), tuple(destslices)


def resize_center(img: np.ndarray, *resize_dims, fill_value: float = 0.0, inplace: bool = True):
    """Center crop-or-pad to resize_dims (reference: transforms/utils.py:337)."""
    from ..utils.misc import fall_back_tuple

    resize_dims = fall_back_tuple(resize_dims, img.shape)
    half_img = (np.asarray(img.shape) // 2).tolist()
    half_dst = (np.asarray(resize_dims) // 2).tolist()
    srcslices, destslices = copypaste_arrays(img.shape, resize_dims, half_img, half_dst, resize_dims)
    if not inplace:
        dest = np.full(resize_dims, fill_value, img.dtype)
        dest[destslices] = img[srcslices]
        return dest
    return img[srcslices]


def map_and_generate_sampling_centers(label, spatial_size, num_samples,
                                      label_spatial_shape=None, num_classes=None,
                                      image=None, image_threshold: float = 0.0,
                                      max_samples_per_class=None, ratios=None,
                                      rand_state=None, allow_smaller: bool = False,
                                      warn: bool = True):
    """map_classes_to_indices + generate_label_classes_crop_centers in one call
    (reference: transforms/utils.py:379)."""
    from ..utils.misc import ensure_tuple

    if label is None:
        raise ValueError("label must not be None.")
    indices = map_classes_to_indices(label, num_classes, image, image_threshold,
                                     max_samples_per_class)
    _shape = label_spatial_shape if label_spatial_shape is not None else np.asarray(label).shape[1:]
    centers = generate_label_classes_crop_centers(spatial_size, num_samples, _shape, indices,
                                                  ratios, rand_state, allow_smaller, warn)
    return ensure_tuple(centers)


def equalize_hist(img: np.ndarray, mask=None, num_bins: int = 256, min: int = 0,
                  max: int = 255) -> np.ndarray:
    """Histogram equalization (reference: transforms/utils.py:1823)."""
    orig_shape = img.shape
    hist_img = img[np.array(mask, dtype=bool)] if mask is not None else img
    hist, bins = np.histogram(np.asarray(hist_img).flatten(), num_bins)
    bins = (bins[:-1] + bins[1:]) / 2
    cum = hist.cumsum()
    cum = np.asarray(rescale_array(cum, minv=min, maxv=max))
    out = np.interp(np.asarray(img).flatten(), bins, cum)
    return out.reshape(orig_shape).astype(img.dtype if np.issubdtype(img.dtype, np.floating)
                                          else np.float32)


def convert_applied_interp_mode(trans_info, mode: str = "nearest", align_corners=None):
    """Recursively override the recorded interpolation mode in an applied-operations
    stack — used to invert with nearest for label maps (reference: transforms/utils.py:1752)."""
    if isinstance(trans_info, (list, tuple)):
        return [convert_applied_interp_mode(t, mode, align_corners) for t in trans_info]
    if not isinstance(trans_info, dict):
        return trans_info
    out = dict(trans_info)
    if "mode" in out:
        out["mode"] = mode
    if align_corners is not None and "align_corners" in out:
        out["align_corners"] = align_corners
    for k in (TraceKeys.EXTRA_INFO, "extra_info"):
        if k in out and isinstance(out[k], dict):
            out[k] = convert_applied_interp_mode(out[k], mode, align_corners)
    return out


def reset_ops_id(data):
    """Set the tracking id of every recorded op to 'none' recursively
    (reference: transforms/utils.py:1788)."""
    if isinstance(data, (list, tuple)):
        return [reset_ops_id(d) for d in data]
    from ..data.meta_image import MetaImage

    if isinstance(data, MetaImage):
        data.applied_operations = reset_ops_id(data.applied_operations)
        return data
    if isinstance(data, dict):
        out = {k: reset_ops_id(v) for k, v in data.items()}
        if TraceKeys.ID in out:
            out[TraceKeys.ID] = TraceKeys.NONE
        return out
    return data


def attach_hook(func, hook, mode: str = "pre"):
    """Wrap ``func`` so ``hook`` runs before ("pre") or after ("post") it
    (reference: transforms/utils.py:2116)."""
    supported = {"pre", "post"}
    if mode not in supported:
        raise NotImplementedError(f"mode: {mode} not in {supported}.")

    def wrapper(inst, data):
        if mode == "pre":
            data = hook(data)
        data = func(inst, data)
        if mode == "post":
            data = hook(data)
        return data

    return wrapper


def sync_meta_info(key, data_dict, t: bool = True):
    """Copy the `{key}_transforms` stack and meta dict into/out of the MetaImage so
    dict-based and object-based tracking stay consistent (reference:
    transforms/utils.py:2135)."""
    from ..data.meta_image import MetaImage
    from ..utils.enums import PostFix

    d = dict(data_dict)
    img = d.get(key)
    if not isinstance(img, MetaImage):
        return d
    xform_key = f"{key}{TraceKeys.KEY_SUFFIX}"
    meta_key = PostFix.meta(key)
    if t:  # push dict info into the image
        if xform_key in d and isinstance(d[xform_key], list):
            img.applied_operations = list(d[xform_key])
        if meta_key in d and isinstance(d[meta_key], dict):
            img.meta.update(d[meta_key])
    d[xform_key] = list(img.applied_operations)
    d[meta_key] = dict(img.meta)
    return d


def get_transform_backends():
    """{transform class name: [numpy?, jax?]} over the whole transforms package
    (reference: transforms/utils.py:1956, there torch/numpy)."""
    import inspect

    from .. import transforms as _t
    from .transform import Transform

    backends = {}
    for n in dir(_t):
        obj = getattr(_t, n, None)
        if inspect.isclass(obj) and issubclass(obj, Transform) and obj is not Transform:
            b = getattr(obj, "backend", [])
            names = {str(getattr(x, "value", x)).lower() for x in b}
            backends[n] = [("numpy" in names) or not names, True]
    return backends


def print_transform_backends():
    """Print the per-transform backend table (reference: transforms/utils.py:2006)."""
    for name, (np_ok, jax_ok) in sorted(get_transform_backends().items()):
        print(f"{name}: numpy={np_ok}, jax={jax_ok}")


def get_number_image_type_conversions(transform, test_data, key=None) -> int:
    """Count how many host<->device array-kind conversions a pipeline performs on
    ``test_data`` (reference: transforms/utils.py:1919, torch<->numpy there)."""
    from .compose import Compose
    from ..data.meta_image import MetaImage

    def _kind(x):
        if isinstance(x, MetaImage):
            x = x.data
        return "jax" if type(x).__module__.startswith("jax") else type(x).__name__

    tfms = transform.transforms if isinstance(transform, Compose) else [transform]
    n_conversions = 0
    prev = _kind(test_data[key] if key is not None else test_data)
    data = test_data
    for t in tfms:
        data = t(data)
        cur = _kind(data[key] if key is not None else data)
        if cur != prev:
            n_conversions += 1
        prev = cur
    return n_conversions





# --------------------------------------------------------------------------
# reference: monai/transforms/utils.py L147 soft_clip, L1478 get_unique_labels,
# L1703 allow_missing_keys_mode, L2071 convert_to_contiguous, L2172
# check_boundaries, L2182 paste_slices, L2196 paste, L2210 squarepulse, L2351
# check_applied_operations, L2379 has_status_keys, L2563 apply_affine_to_points,
# L1255 keep_components_with_positive_points
# --------------------------------------------------------------------------
def soft_clip(arr, sharpness_factor: float = 1.0, minv=None, maxv=None, dtype=np.float32):
    """Differentiable soft clip: f(x) = x + softplus(-c(x-minv))/c - softplus(c(x-maxv))/c
    (reference: transforms/utils.py:147)."""
    from .utils_backend_unification import softplus

    jax_in = is_jax(arr)
    v = (to_jax(arr) if jax_in else np.asarray(arr))
    if dtype is not None:
        v = v.astype(dtype)
    out = v
    if minv is not None:
        out = out + softplus(-sharpness_factor * (v - minv)) / sharpness_factor
    if maxv is not None:
        out = out - softplus(sharpness_factor * (v - maxv)) / sharpness_factor
    return out


def get_unique_labels(img, is_onehot: bool, discard=None) -> set:
    """Set of non-background labels present in ``img`` (reference:
    transforms/utils.py:1478)."""
    arr = to_numpy(img)
    if is_onehot:
        applied = {i for i in range(arr.shape[0]) if arr[i].sum() > 0}
    else:
        if arr.shape[0] != 1:
            raise ValueError(f"If input not one-hotted, should only be 1 channel, got {arr.shape[0]}.")
        applied = set(int(v) for v in np.unique(arr))
    if discard is not None:
        for i in ensure_tuple(discard):
            applied.discard(int(i))
    return applied


def convert_to_contiguous(data, **kwargs):
    """Recursively make arrays contiguous (reference: transforms/utils.py:2071)."""
    from collections.abc import Mapping

    if isinstance(data, (str, bytes)):
        return data
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data, **kwargs)
    if is_jax(data):
        return data  # jax arrays are always contiguous (XLA-owned layout)
    if isinstance(data, Mapping):
        return {k: convert_to_contiguous(v, **kwargs) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(convert_to_contiguous(i, **kwargs) for i in data)
    return data


def check_boundaries(boundaries) -> None:
    """Validate signal-transform boundaries (reference: transforms/utils.py:2172)."""
    if not (isinstance(boundaries, Sequence) and len(boundaries) == 2
            and all(isinstance(i, float) for i in boundaries)):
        raise ValueError("Incompatible values: boundaries needs to be a list of float.")


def paste_slices(tup):
    """(pos, w, max_w_array) -> (orig_slice, block_slice) (reference:
    transforms/utils.py:2182)."""
    pos, w, max_w = tup
    max_w = max_w.shape[-1]
    orig_min = max(pos, 0)
    orig_max = min(pos + w, max_w)
    block_min = -min(pos, 0)
    block_max = max_w - max(pos + w, max_w)
    block_max = block_max if block_max != 0 else None
    return slice(orig_min, orig_max), slice(block_min, block_max)


def paste(orig, block, loc):
    """Paste ``block`` into ``orig`` at ``loc`` with boundary clipping (reference:
    transforms/utils.py:2196)."""
    loc_zip = zip(loc, block.shape, orig)
    orig_slices, block_slices = zip(*map(paste_slices, loc_zip))
    orig[:, orig_slices[0]] = block[block_slices[0]]
    if orig.shape[0] == 1:
        orig = orig.squeeze()
    return orig


def squarepulse(sig, duty: float = 0.5):
    """Square pulse train like scipy.signal.square (reference:
    transforms/utils.py:2210)."""
    t = to_numpy(sig).astype(np.float64)
    y = np.zeros(t.shape)
    if duty > 1 or duty < 0:
        return np.full(t.shape, np.nan)
    tmod = np.remainder(t, 2 * np.pi)
    mask2 = tmod < duty * 2 * np.pi
    y[mask2] = 1
    y[~mask2] = -1
    return y


from contextlib import contextmanager  # noqa: E402


@contextmanager
def allow_missing_keys_mode(transform):
    """Temporarily set all contained MapTransforms' allow_missing_keys=True
    (reference: transforms/utils.py:1703)."""
    from .compose import Compose
    from .transform import MapTransform

    from ..utils.misc import issequenceiterable

    if issequenceiterable(transform):
        transform = Compose(list(transform))
    if isinstance(transform, MapTransform):
        transforms = [transform]
    elif isinstance(transform, Compose):
        transforms = [t for t in transform.flatten().transforms if isinstance(t, MapTransform)]
    else:
        transforms = []
    if len(transforms) == 0:
        raise TypeError("allow_missing_keys_mode expects MapTransform(s) or Compose(s) "
                        "containing MapTransform(s)")
    orig_states = [t.allow_missing_keys for t in transforms]
    try:
        for t in transforms:
            t.allow_missing_keys = True
        yield
    finally:
        for t, o_s in zip(transforms, orig_states):
            t.allow_missing_keys = o_s


def check_applied_operations(entry, status_key: str, default_message: str = "No message provided"):
    """Collect status messages matching ``status_key`` in applied-operation trace
    entries (reference: transforms/utils.py:2351)."""
    from ..utils.enums import TraceKeys, TraceStatusKeys

    if isinstance(entry, list):
        results = []
        for sub_entry in entry:
            results.extend(check_applied_operations(sub_entry, status_key, default_message))
        return results
    status_key_ = TraceStatusKeys(status_key)
    statuses = entry.get(TraceKeys.STATUSES) if isinstance(entry, dict) else None
    if statuses and status_key_ in statuses:
        reason = statuses[status_key_]
        if reason is None:
            return [default_message]
        return reason if isinstance(reason, list) else [reason]
    return []


def has_status_keys(data, status_key, default_message: str = "No message provided"):
    """(ok, messages) for a status key across tensors/dicts/sequences (reference:
    transforms/utils.py:2379)."""
    from ..data.meta_image import MetaImage

    occurrences: list = []
    if isinstance(data, (list, tuple)):
        for d in data:
            _, reasons = has_status_keys(d, status_key, default_message)
            if reasons is not None:
                occurrences.extend(reasons)
    elif isinstance(data, MetaImage):
        for op in data.applied_operations:
            occurrences.extend(check_applied_operations(op, status_key, default_message))
    elif isinstance(data, dict):
        for d in data.values():
            _, reasons = has_status_keys(d, status_key, default_message)
            if reasons is not None:
                occurrences.extend(reasons)
    if occurrences:
        return False, occurrences
    return True, None


def apply_affine_to_points(data, affine, dtype=None):
    """Apply an affine to a point set of shape (C, N, 2|3) (reference:
    transforms/utils.py:2563)."""
    from ..data.affine_utils import to_affine_nd

    data_ = to_numpy(data).astype(np.float64)
    affine = to_affine_nd(data_.shape[-1], np.asarray(affine, dtype=np.float64))
    homogeneous = np.concatenate(
        [data_, np.ones((data_.shape[0], data_.shape[1], 1))], axis=2)
    transformed = homogeneous @ affine.T
    out = transformed[:, :, :-1]
    if dtype is not None:
        out = out.astype(dtype)
    return to_jax(out) if is_jax(data) else out


def keep_components_with_positive_points(img, point_coords, point_labels):
    """Keep connected components containing positive click points; fill removed
    positive voxels with the negative-region mean (reference:
    transforms/utils.py:1255, VISTA3D point-only postprocessing)."""
    from scipy import ndimage as ndi

    img_np = to_numpy(img).copy()
    coords_np = to_numpy(point_coords)
    labels_np = to_numpy(point_labels)
    outs = np.zeros_like(img_np, dtype=bool)
    structure = np.ones((3,) * (img_np.ndim - 2), dtype=bool)  # connectivity=3
    for c in range(len(coords_np)):
        if not (np.any(labels_np[c] == 3) or np.any(labels_np[c] == 1)):
            continue
        sel = (labels_np[c] == 3) | (labels_np[c] == 1)
        coords = coords_np[c, sel].tolist()
        not_nan_mask = ~np.isnan(img_np[0, c])
        img_ = np.nan_to_num(img_np[0, c] > 0, 0).astype(np.int8)
        features, _ = ndi.label(img_, structure=structure)
        pos_mask = img_ > 0
        idx = sorted({int(features[round(p[0]), round(p[1]), round(p[2])]) for p in coords})
        for i in idx:
            if i == 0:
                continue
            outs[0, c] |= features == i
        keep = outs[0, c]
        neg_region = np.logical_and(~keep, not_nan_mask)
        fill_in = img_np[0, c][neg_region].mean() if neg_region.any() else 0.0
        img_np[0, c][np.logical_and(pos_mask, ~keep)] = fill_in
    return to_jax(img_np) if is_jax(img) else img_np
