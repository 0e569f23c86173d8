"""Post-processing transforms (array API).

Parity targets: monai/transforms/post/array.py:61-996 (Activations, AsDiscrete,
KeepLargestConnectedComponent, RemoveSmallObjects, FillHoles, LabelToContour,
Mean/VoteEnsemble, ProbNMS, SobelGradients, DistanceTransformEDT, Invert is in
post_dict).
"""
from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import numpy as np

from ..data.meta_image import MetaImage
from ..networks.utils import one_hot
from ..utils.backend import is_jax, to_numpy, xp
from ..utils.misc import ensure_tuple
from ..utils.type_conversion import convert_to_dst_type
from .transform import Transform
from .utils import (
    distance_transform_edt,
    fill_holes,
    get_largest_connected_component_mask,
    remove_small_objects,
)

__all__ = [
    "Activations",
    "AsDiscrete",
    "KeepLargestConnectedComponent",
    "RemoveSmallObjects",
    "FillHoles",
    "LabelToContour",
    "Ensemble",
    "MeanEnsemble",
    "VoteEnsemble",
    "ProbNMS",
    "SobelGradients",
    "LabelFilter",
    "Invert",
    "DistanceTransformEDT",
]


def _sigmoid(x):
    ns = xp(x)
    if ns is np:
        return 1.0 / (1.0 + np.exp(-x))
    import jax

    return jax.nn.sigmoid(x)


def _softmax(x, axis=0):
    ns = xp(x)
    if ns is np:
        e = np.exp(x - np.max(x, axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)
    import jax

    return jax.nn.softmax(x, axis=axis)


class Activations(Transform):
    """Sigmoid/softmax/custom activation (reference: post/array.py:61)."""

    def __init__(self, sigmoid: bool = False, softmax: bool = False, other: Callable | None = None,
                 **kwargs):
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.kwargs = kwargs
        if other is not None and not callable(other):
            raise TypeError(f"other must be None or callable but is {type(other).__name__}.")
        self.other = other

    def __call__(self, img: Any, sigmoid: bool | None = None, softmax: bool | None = None,
                 other: Callable | None = None):
        if sigmoid and softmax:
            raise ValueError("Incompatible values: sigmoid=True and softmax=True.")
        if other is not None and not callable(other):
            raise TypeError(f"other must be None or callable but is {type(other).__name__}.")
        data = img.data if isinstance(img, MetaImage) else img
        if sigmoid or (sigmoid is None and self.sigmoid):
            out = _sigmoid(data)
        elif softmax or (softmax is None and self.softmax):
            out = _softmax(data, axis=0 if data.ndim in (3, 4) and not _looks_batched(data) else 0)
        else:
            act = other if other is not None else self.other
            out = act(data) if act is not None else data
        return img.new_like(out) if isinstance(img, MetaImage) else out


def _looks_batched(data) -> bool:
    return False  # post transforms operate on channel-first single samples (decollated)


class AsDiscrete(Transform):
    """Argmax / threshold / one-hot discretization (reference: post/array.py:153)."""

    def __init__(self, argmax: bool = False, to_onehot: int | None = None, threshold: float | None = None,
                 rounding: str | None = None, **kwargs):
        self.argmax = argmax
        if isinstance(to_onehot, bool):
            raise ValueError("`to_onehot=True/False` is deprecated, please use `to_onehot=num_classes`.")
        self.to_onehot = to_onehot
        self.threshold = threshold
        self.rounding = rounding
        self.kwargs = kwargs

    def __call__(self, img: Any, argmax: bool | None = None, to_onehot: int | None = None,
                 threshold: float | None = None, rounding: str | None = None):
        data = img.data if isinstance(img, MetaImage) else img
        ns = xp(data)
        if argmax or (argmax is None and self.argmax):
            data = ns.argmax(data, axis=0, keepdims=True)
        to_onehot = self.to_onehot if to_onehot is None else to_onehot
        if to_onehot is not None:
            if not isinstance(to_onehot, int):
                raise ValueError(f"the number of classes for One-Hot must be an integer, got {type(to_onehot)}.")
            data = one_hot(data, num_classes=to_onehot, dim=0, dtype=np.float32 if ns is np else None)
        threshold = self.threshold if threshold is None else threshold
        if threshold is not None:
            data = (data >= threshold)
        rounding = self.rounding if rounding is None else rounding
        if rounding is not None:
            if rounding != "torchrounding":
                from ..utils.module import look_up_option

                look_up_option(rounding, ["torchrounding"])
            data = ns.round(data)
        out = data.astype(np.float32) if ns is np else data.astype("float32")
        return img.new_like(out) if isinstance(img, MetaImage) else out


class KeepLargestConnectedComponent(Transform):
    """Keep top-N connected components per class (reference: post/array.py:232).

    Host-side scipy labeling (a Pallas jump-flood union-find is a future device path).
    """

    def __init__(self, applied_labels: Sequence[int] | int | None = None, is_onehot: bool | None = None,
                 independent: bool = True, connectivity: int | None = None, num_components: int = 1):
        self.applied_labels = ensure_tuple(applied_labels) if applied_labels is not None else None
        self.is_onehot = is_onehot
        self.independent = independent
        self.connectivity = connectivity
        self.num_components = num_components

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        img_np = to_numpy(data)
        is_onehot = img_np.shape[0] > 1 if self.is_onehot is None else self.is_onehot
        if self.applied_labels is not None:
            labels = self.applied_labels
        else:
            labels = tuple(range(img_np.shape[0])) if is_onehot else tuple(
                int(x) for x in np.unique(img_np) if x != 0)
        out = img_np.copy()
        if self.independent:
            for i in labels:
                foreground = out[i] > 0 if is_onehot else (out[0] == i)
                mask = get_largest_connected_component_mask(foreground[None], self.connectivity,
                                                            self.num_components)[0]
                if is_onehot:
                    out[i][foreground & ~(mask > 0)] = 0
                else:
                    out[0][foreground & ~(mask > 0)] = 0
        else:
            if is_onehot:
                foreground = np.any(out[list(labels)] > 0, axis=0)
                mask = get_largest_connected_component_mask(foreground[None], self.connectivity,
                                                            self.num_components)[0]
                for i in labels:
                    out[i][foreground & ~(mask > 0)] = 0
            else:
                foreground = np.isin(out[0], labels)
                mask = get_largest_connected_component_mask(foreground[None], self.connectivity,
                                                            self.num_components)[0]
                out[0][foreground & ~(mask > 0)] = 0
        res, *_ = convert_to_dst_type(out, data)
        return img.new_like(res) if isinstance(img, MetaImage) else res


class RemoveSmallObjects(Transform):
    """Remove small components (reference: post/array.py:369)."""

    def __init__(self, min_size: int = 64, connectivity: int = 1, independent_channels: bool = True,
                 by_measure: bool = False, pixdim=None):
        self.min_size = min_size
        self.connectivity = connectivity
        self.independent_channels = independent_channels
        self.by_measure = by_measure
        self.pixdim = pixdim

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        pixdim = self.pixdim
        if pixdim is None and isinstance(img, MetaImage):
            pixdim = img.pixdim
        out = remove_small_objects(data, self.min_size, self.connectivity, self.independent_channels,
                                   self.by_measure, pixdim)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class FillHoles(Transform):
    """Fill enclosed holes (reference: post/array.py:432)."""

    def __init__(self, applied_labels: Sequence[int] | int | None = None, connectivity: int | None = None):
        self.applied_labels = ensure_tuple(applied_labels) if applied_labels else None
        self.connectivity = connectivity

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        out = fill_holes(to_numpy(data), self.applied_labels, self.connectivity)
        res, *_ = convert_to_dst_type(out, data)
        return img.new_like(res) if isinstance(img, MetaImage) else res


class LabelToContour(Transform):
    """Extract contours with a Laplace kernel (reference: post/array.py:508)."""

    def __init__(self, kernel_type: str = "Laplace"):
        if kernel_type != "Laplace":
            raise NotImplementedError('Currently only kernel_type="Laplace" is supported.')
        self.kernel_type = kernel_type

    def __call__(self, img: Any):
        from scipy.ndimage import convolve

        data = img.data if isinstance(img, MetaImage) else img
        img_np = to_numpy(data).astype(np.float32)
        sr = img_np.ndim - 1
        if sr == 2:
            kernel = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], dtype=np.float32)
        elif sr == 3:
            kernel = -1 * np.ones((3, 3, 3), dtype=np.float32)
            kernel[1, 1, 1] = 26
        else:
            raise ValueError(f"{self.__class__} can only handle 2D or 3D images.")
        out = np.stack([convolve(c, kernel, mode="constant") for c in img_np])
        out = np.clip(out, 0, 1)
        res, *_ = convert_to_dst_type(out, data)
        return img.new_like(res) if isinstance(img, MetaImage) else res


class Ensemble:
    @staticmethod
    def get_stacked_torch(img) -> Any:  # name kept for familiarity
        if isinstance(img, Sequence):
            arrs = [i.data if isinstance(i, MetaImage) else i for i in img]
            ns = xp(arrs[0])
            return ns.stack([ns.asarray(a) if ns is np else a for a in arrs])
        return img.data if isinstance(img, MetaImage) else img

    @staticmethod
    def post_convert(out, orig):
        ref = orig[0] if isinstance(orig, Sequence) else orig
        if isinstance(ref, MetaImage):
            return ref.new_like(out)
        return out


class MeanEnsemble(Ensemble, Transform):
    """Weighted mean over ensemble axis (reference: post/array.py:612)."""

    def __init__(self, weights: Sequence[float] | None = None):
        self.weights = np.asarray(weights, dtype=np.float32) if weights is not None else None

    def __call__(self, img: Any):
        stacked = self.get_stacked_torch(img)
        ns = xp(stacked)
        if self.weights is not None:
            w = self.weights
            while w.ndim < stacked.ndim:
                w = w[..., None]
            w_c, *_ = convert_to_dst_type(w, stacked)
            stacked = stacked * w_c / ns.mean(w_c, axis=0, keepdims=True)
        out = ns.mean(stacked, axis=0)
        return self.post_convert(out, img)


class VoteEnsemble(Ensemble, Transform):
    """Majority vote (reference: post/array.py:671)."""

    def __init__(self, num_classes: int | None = None):
        self.num_classes = num_classes

    def __call__(self, img: Any):
        stacked = self.get_stacked_torch(img)
        ns = xp(stacked)
        if self.num_classes is not None:
            has_ch_dim = True
            if stacked.ndim > 1 and stacked.shape[1] > 1:
                import warnings

                warnings.warn("no need to specify num_classes for One-Hot format data.")
            else:
                if stacked.ndim == 1:
                    has_ch_dim = False
                stacked = one_hot(stacked if stacked.ndim > 1 else stacked[:, None], self.num_classes, dim=1)
        out = ns.mean(stacked.astype(np.float32) if ns is np else stacked.astype("float32"), axis=0)
        if self.num_classes is not None:
            out = ns.argmax(out, axis=0, keepdims=has_ch_dim).astype(np.float32 if ns is np else "float32")
        else:
            out = (out >= 0.5).astype(np.float32 if ns is np else "float32")
        return self.post_convert(out, img)


class ProbNMS(Transform):
    """Probability-map non-maximum suppression (reference: post/array.py:741)."""

    def __init__(self, spatial_dims: int = 2, sigma: float = 0.0, prob_threshold: float = 0.5,
                 box_size: int | Sequence[int] = 48):
        self.sigma = sigma
        self.spatial_dims = spatial_dims
        if prob_threshold < 0:
            raise ValueError("prob_threshold should be no less than 0.0.")
        self.prob_threshold = prob_threshold
        if isinstance(box_size, int):
            self.box_size = np.asarray([box_size] * spatial_dims)
        else:
            if len(box_size) != spatial_dims:
                raise ValueError("the sequence length of box_size should be the same as spatial_dims.")
            self.box_size = np.asarray(box_size)
        if self.box_size.min() <= 0:
            raise ValueError("box_size should be larger than 0.")
        self.box_lower_bd = self.box_size // 2
        self.box_upper_bd = self.box_size - self.box_lower_bd

    def __call__(self, prob_map: Any):
        data = prob_map.data if isinstance(prob_map, MetaImage) else prob_map
        prob_np = to_numpy(data).copy().astype(np.float32)
        if self.sigma != 0:
            from ..ops.gaussian import gaussian_filter

            if prob_np.ndim == self.spatial_dims:
                prob_np = np.asarray(gaussian_filter(prob_np[None], self.sigma))[0]
            else:
                prob_np = np.asarray(gaussian_filter(prob_np, self.sigma))
        prob_map_shape = prob_np.shape
        outputs = []
        while prob_np.max() > self.prob_threshold:
            max_idx = np.unravel_index(prob_np.argmax(), prob_map_shape)
            prob_max = prob_np[max_idx]
            max_idx_arr = np.asarray(max_idx)
            outputs.append([float(prob_max)] + list(max_idx_arr[-self.spatial_dims:]))
            idx_min_range = (max_idx_arr[-self.spatial_dims:] - self.box_lower_bd).clip(0, None)
            idx_max_range = (max_idx_arr[-self.spatial_dims:] + self.box_upper_bd).clip(None, prob_map_shape[-self.spatial_dims:])
            slices = tuple(slice(None) for _ in range(prob_np.ndim - self.spatial_dims)) + tuple(
                slice(idx_min_range[i], idx_max_range[i]) for i in range(self.spatial_dims))
            prob_np[slices] = 0
        return outputs


class SobelGradients(Transform):
    """Sobel gradient maps (reference: post/array.py:908)."""

    def __init__(self, kernel_size: int = 3, spatial_axes: Sequence[int] | int | None = None,
                 normalize_kernels: bool = True, normalize_gradients: bool = False,
                 padding_mode: str = "reflect", dtype=np.float32):
        if kernel_size % 2 == 0 or kernel_size < 3:
            raise ValueError(f"Sobel kernel size should be an odd number >= 3, got {kernel_size}")
        self.kernel_size = kernel_size
        self.spatial_axes = spatial_axes
        self.normalize_kernels = normalize_kernels
        self.normalize_gradients = normalize_gradients
        self.padding_mode = padding_mode
        self.dtype = dtype
        self.kernel_diff, self.kernel_smooth = self._get_kernel(kernel_size)

    def _get_kernel(self, size: int):
        # reference post/array.py:884 _get_kernel: diff [-1,0,1]/2, smooth [1,2,1]/4,
        # expanded by full convolution with the (normalized) [1,2,1] kernel
        kd = np.array([-1.0, 0.0, 1.0])
        ks = np.array([1.0, 2.0, 1.0])
        ke = np.array([1.0, 2.0, 1.0])
        if self.normalize_kernels:
            kd = kd / 2.0
            ks = ks / 4.0
            ke = ke / 4.0
        for _ in range((size - 3) // 2):
            kd = np.convolve(kd, ke)
            ks = np.convolve(ks, ke)
        return kd.astype(np.float32), ks.astype(np.float32)

    def __call__(self, image: Any):
        from ..ops.gaussian import separable_filtering

        data = image.data if isinstance(image, MetaImage) else image
        sr = data.ndim - 1
        axes = list(range(sr)) if self.spatial_axes is None else [a % sr for a in ensure_tuple(self.spatial_axes)]
        grads = []
        for ax in axes:
            kernels = [self.kernel_diff if d == ax else self.kernel_smooth for d in range(sr)]
            g = separable_filtering(data, kernels, mode=self.padding_mode)
            if self.normalize_gradients:
                ns = xp(g)
                gmin = ns.min(g)
                grange = ns.max(g) - gmin
                g = (g - gmin) / (grange if is_jax(g) else max(float(grange), 1e-8))
            grads.append(g)
        ns = xp(grads[0])
        out = ns.concatenate(grads, axis=0).astype(self.dtype if not is_jax(grads[0]) else grads[0].dtype)
        return image.new_like(out) if isinstance(image, MetaImage) else out


class DistanceTransformEDT(Transform):
    """Euclidean distance transform (reference: post/array.py:970)."""

    def __init__(self, sampling=None):
        self.sampling = sampling

    def __call__(self, img: Any, sampling=None):
        sampling = self.sampling if sampling is None else sampling
        data = img.data if isinstance(img, MetaImage) else img
        out = distance_transform_edt(data, sampling=sampling)
        return img.new_like(out) if isinstance(img, MetaImage) else out


class LabelFilter(Transform):
    """Keep only the listed label values, zero the rest (reference: post/array.py:445)."""

    def __init__(self, applied_labels):
        self.applied_labels = ensure_tuple(applied_labels)

    def __call__(self, img: Any):
        data = img.data if isinstance(img, MetaImage) else img
        ns = xp(data)
        mask = ns.zeros(data.shape, dtype=bool)
        for lab in self.applied_labels:
            mask = mask | (data == lab)
        out = ns.where(mask, data, ns.zeros_like(data))
        return img.new_like(out) if isinstance(img, MetaImage) else out


class Invert(Transform):
    """Invert the transforms recorded on the prediction's MetaImage
    (reference: post/array.py:832 Invert; the array counterpart of Invertd)."""

    def __init__(self, transform=None, nearest_interp: bool = True, device=None,
                 post_func=None):
        self.transform = transform
        self.nearest_interp = nearest_interp
        self.post_func = post_func

    def __call__(self, data: Any):
        if self.transform is None:
            raise ValueError("transform is not given.")
        if self.nearest_interp and isinstance(data, MetaImage):
            for op in data.applied_operations:
                from ..utils.enums import LazyAttr

                if LazyAttr.INTERP_MODE in op:
                    op[LazyAttr.INTERP_MODE] = "nearest"
        out = self.transform.inverse(data)
        return self.post_func(out) if callable(self.post_func) else out
