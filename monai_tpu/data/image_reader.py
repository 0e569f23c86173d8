"""Image readers with suffix-based auto-selection.

Parity targets: monai/data/image_reader.py (ImageReader ABC:63 verify_suffix/read/get_data,
NibabelReader:995 → NiftiReader, NumpyReader:1218, PILReader:1318; ITK/Pydicom/Nrrd are
gated on optional deps).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Sequence
from pathlib import Path
from typing import Any

import numpy as np

from ..utils.enums import MetaKeys, SpaceKeys
from ..utils.misc import ensure_tuple
from ..utils.module import optional_import, require_pkg
from .nifti import read_nifti

__all__ = ["ImageReader", "NiftiReader", "NibabelReader", "NumpyReader", "PILReader", "ITKReader", "NrrdReader", "PydicomReader"]


class ImageReader(ABC):
    """Reader protocol (reference: image_reader.py:63)."""

    @abstractmethod
    def verify_suffix(self, filename: Any) -> bool:
        raise NotImplementedError

    @abstractmethod
    def read(self, data: Any, **kwargs) -> Any:
        raise NotImplementedError

    @abstractmethod
    def get_data(self, img) -> tuple[np.ndarray, dict]:
        raise NotImplementedError


def _stack_images(image_list: list, meta_dict: dict) -> np.ndarray:
    if len(image_list) <= 1:
        return image_list[0]
    if not np.all([im.shape == image_list[0].shape for im in image_list]):
        raise ValueError("images in the list should have same shape to stack.")
    meta_dict[MetaKeys.ORIGINAL_CHANNEL_DIM] = 0
    return np.stack(image_list, axis=0)


def is_supported_format(filename: Any, suffixes: Sequence[str]) -> bool:
    filenames = ensure_tuple(filename)
    for name in filenames:
        full_suffix = "".join(Path(str(name).lower()).suffixes)
        if not any(full_suffix.endswith(s.lower()) for s in suffixes):
            return False
    return True


class NiftiReader(ImageReader):
    """NIfTI reader using the built-in pure-numpy parser (replaces NibabelReader,
    reference: image_reader.py:995)."""

    def __init__(self, as_closest_canonical: bool = False, squeeze_non_spatial_dims: bool = False,
                 dtype=np.float32, **kwargs):
        self.as_closest_canonical = as_closest_canonical
        self.squeeze_non_spatial_dims = squeeze_non_spatial_dims
        self.dtype = dtype
        self.kwargs = kwargs

    def verify_suffix(self, filename: Any) -> bool:
        return is_supported_format(filename, ["nii", "nii.gz"])

    def read(self, data: Any, **kwargs):
        img_: list = []
        for name in ensure_tuple(data):
            arr, meta = read_nifti(name, dtype=None)
            img_.append((arr, meta))
        return img_ if len(img_) > 1 else img_[0]

    def get_data(self, img) -> tuple[np.ndarray, dict]:
        img_list = img if isinstance(img, list) else [img]
        img_array: list[np.ndarray] = []
        compatible_meta: dict = {}
        for arr, meta in img_list:
            header = dict(meta)
            header[MetaKeys.AFFINE] = meta["affine"].copy()
            header[MetaKeys.ORIGINAL_AFFINE] = meta["affine"].copy()
            header[MetaKeys.SPACE] = SpaceKeys.RAS
            data = arr
            if self.squeeze_non_spatial_dims:
                for d in range(len(data.shape), 3, -1):
                    if data.shape[d - 1] == 1:
                        data = data.squeeze(axis=d - 1)
            if self.dtype is not None:
                data = data.astype(self.dtype, copy=False)
            img_array.append(data)
            header[MetaKeys.ORIGINAL_CHANNEL_DIM] = ("no_channel" if len(data.shape) == len(meta["spatial_shape"])
                                                     else -1)
            _copy_compatible_dict(header, compatible_meta)
        return _stack_images(img_array, compatible_meta), compatible_meta


NibabelReader = NiftiReader  # familiarity alias


def _copy_compatible_dict(from_dict: dict, to_dict: dict) -> None:
    if not isinstance(to_dict, dict):
        raise ValueError(f"to_dict must be a Dict, got {type(to_dict)}.")
    if not to_dict:
        for key in from_dict:
            datum = from_dict[key]
            if isinstance(datum, np.ndarray):
                to_dict[key] = datum.copy()
            else:
                to_dict[key] = datum
    else:
        affine_key, shape_key = MetaKeys.AFFINE, MetaKeys.SPATIAL_SHAPE
        if affine_key in from_dict and not np.allclose(from_dict[affine_key], to_dict.get(affine_key, 0)):
            raise RuntimeError("affine matrix of all images should be the same for channel-wise concatenation.")
        if shape_key in from_dict and not np.allclose(from_dict[shape_key], to_dict.get(shape_key, 0)):
            raise RuntimeError("spatial_shape of all images should be the same for channel-wise concatenation.")


class NumpyReader(ImageReader):
    """.npy/.npz reader (reference: image_reader.py:1218)."""

    def __init__(self, npz_keys=None, channel_dim: int | None = None, **kwargs):
        self.npz_keys = ensure_tuple(npz_keys) if npz_keys is not None else None
        self.channel_dim = channel_dim
        self.kwargs = kwargs

    def verify_suffix(self, filename: Any) -> bool:
        return is_supported_format(filename, ["npz", "npy"])

    def read(self, data: Any, **kwargs):
        img_: list = []
        kwargs_ = dict(self.kwargs)
        kwargs_.update(kwargs)
        for name in ensure_tuple(data):
            img = np.load(name, allow_pickle=True, **kwargs_)
            if str(name).endswith(".npz"):
                npz_keys = list(img.keys()) if self.npz_keys is None else self.npz_keys
                for k in npz_keys:
                    img_.append(img[k])
            else:
                img_.append(img)
        return img_ if len(img_) > 1 else img_[0]

    def get_data(self, img) -> tuple[np.ndarray, dict]:
        img_list = img if isinstance(img, list) else [img]
        img_array: list[np.ndarray] = []
        compatible_meta: dict = {}
        for i in img_list:
            header: dict = {}
            if isinstance(i, np.ndarray):
                spatial_shape = np.asarray(i.shape)
                if isinstance(self.channel_dim, int):
                    spatial_shape = np.delete(spatial_shape, self.channel_dim)
                header[MetaKeys.SPATIAL_SHAPE] = spatial_shape
                header[MetaKeys.SPACE] = SpaceKeys.RAS
            img_array.append(i)
            header[MetaKeys.ORIGINAL_CHANNEL_DIM] = (self.channel_dim if isinstance(self.channel_dim, int)
                                                     else "no_channel")
            _copy_compatible_dict(header, compatible_meta)
        return _stack_images(img_array, compatible_meta), compatible_meta


@require_pkg(pkg_name="PIL")
class PILReader(ImageReader):
    """PNG/JPG/BMP reader (reference: image_reader.py:1318)."""

    def __init__(self, converter=None, reverse_indexing: bool = True, **kwargs):
        self.converter = converter
        self.reverse_indexing = reverse_indexing
        self.kwargs = kwargs

    def verify_suffix(self, filename: Any) -> bool:
        return is_supported_format(filename, ["png", "jpg", "jpeg", "bmp"])

    def read(self, data: Any, **kwargs):
        from PIL import Image as PILImage

        img_: list = []
        for name in ensure_tuple(data):
            img = PILImage.open(name, **{**self.kwargs, **kwargs})
            if callable(self.converter):
                img = self.converter(img)
            img_.append(img)
        return img_ if len(img_) > 1 else img_[0]

    def get_data(self, img) -> tuple[np.ndarray, dict]:
        img_list = img if isinstance(img, list) else [img]
        img_array: list[np.ndarray] = []
        compatible_meta: dict = {}
        for i in img_list:
            header = {"format": getattr(i, "format", ""), "mode": getattr(i, "mode", ""),
                      "width": i.width, "height": i.height}
            data = np.asarray(i)
            if self.reverse_indexing:
                data = np.moveaxis(data, 0, 1)
            header[MetaKeys.SPATIAL_SHAPE] = np.asarray(data.shape[:2])
            header[MetaKeys.SPACE] = SpaceKeys.RAS
            header[MetaKeys.ORIGINAL_CHANNEL_DIM] = "no_channel" if data.ndim == 2 else -1
            img_array.append(data)
            _copy_compatible_dict(header, compatible_meta)
        return _stack_images(img_array, compatible_meta), compatible_meta


itk, _has_itk = optional_import("itk")


class ITKReader(ImageReader):
    """ITK-based reader (optional dependency; reference: image_reader.py:162)."""

    def __init__(self, channel_dim: int | None = None, series_name: str = "", reverse_indexing: bool = False,
                 series_meta: bool = False, affine_lps_to_ras: bool = True, **kwargs):
        if not _has_itk:
            raise ImportError("ITKReader requires the optional dependency itk.")
        self.kwargs = kwargs
        self.channel_dim = channel_dim
        self.series_name = series_name
        self.reverse_indexing = reverse_indexing
        self.series_meta = series_meta
        self.affine_lps_to_ras = affine_lps_to_ras

    def verify_suffix(self, filename: Any) -> bool:
        return _has_itk

    def read(self, data: Any, **kwargs):
        img_ = []
        for name in ensure_tuple(data):
            img_.append(itk.imread(str(name), **{**self.kwargs, **kwargs}))
        return img_ if len(img_) > 1 else img_[0]

    def get_data(self, img) -> tuple[np.ndarray, dict]:
        img_list = img if isinstance(img, list) else [img]
        img_array, compatible_meta = [], {}
        for i in img_list:
            data = itk.array_view_from_image(i, keep_axes=False).T
            direction = np.asarray(i.GetDirection())
            spacing = np.asarray(i.GetSpacing())
            origin = np.asarray(i.GetOrigin())
            sr = len(spacing)
            affine = np.eye(sr + 1)
            affine[:sr, :sr] = direction.reshape(sr, sr) @ np.diag(spacing)
            affine[:sr, -1] = origin
            if self.affine_lps_to_ras:
                from .affine_utils import orientation_ras_lps

                affine = orientation_ras_lps(affine)
            header = {MetaKeys.AFFINE: affine, MetaKeys.ORIGINAL_AFFINE: affine.copy(),
                      MetaKeys.SPATIAL_SHAPE: np.asarray(data.shape[:sr]),
                      MetaKeys.SPACE: SpaceKeys.RAS,
                      MetaKeys.ORIGINAL_CHANNEL_DIM: "no_channel" if data.ndim == sr else -1}
            img_array.append(data)
            _copy_compatible_dict(header, compatible_meta)
        return _stack_images(img_array, compatible_meta), compatible_meta


class NrrdReader(ImageReader):
    """NRRD reader (reference: image_reader.py:1431). Backed by the bundled pure-python
    parser (data/nrrd_io.py) instead of pynrrd."""

    def __init__(self, channel_dim: str | int | None = None, dtype=np.float32,
                 index_order: str = "F", affine_lps_to_ras: bool = True, **kwargs):
        self.channel_dim = channel_dim
        self.dtype = dtype
        self.index_order = index_order
        self.affine_lps_to_ras = affine_lps_to_ras
        self.kwargs = kwargs

    def verify_suffix(self, filename: Any) -> bool:
        return is_supported_format(filename, ["nrrd", "seg.nrrd"])

    def read(self, data: Any, **kwargs):
        from .nrrd_io import read_nrrd

        imgs = []
        for name in ensure_tuple(data):
            imgs.append(read_nrrd(str(name)))
        return imgs if len(imgs) > 1 else imgs[0]

    def _get_affine(self, header: dict, ndim: int) -> np.ndarray:
        affine = np.eye(ndim + 1, dtype=np.float64)
        dirs = header.get("space directions")
        if dirs is not None:
            spatial = [d for d in dirs if d is not None]
            n = len(spatial)
            affine = np.eye(n + 1, dtype=np.float64)
            affine[:n, :n] = np.asarray(spatial, dtype=np.float64).T
            origin = header.get("space origin")
            if origin is not None:
                affine[:n, n] = np.asarray(origin, dtype=np.float64)
        if self.affine_lps_to_ras:
            space = header.get("space", "left-posterior-superior").lower()
            if "left-posterior-superior" in space or space == "lps":
                from .affine_utils import orientation_ras_lps

                affine = orientation_ras_lps(affine)
        return affine

    def get_data(self, img) -> tuple[np.ndarray, dict]:
        img_list = img if isinstance(img, list) else [img]
        arrays, meta = [], {}
        for data, header in img_list:
            arr = np.asarray(data, dtype=self.dtype) if self.dtype is not None else np.asarray(data)
            if self.index_order == "C":
                arr = np.ascontiguousarray(arr)
            affine = self._get_affine(header, arr.ndim)
            meta = dict(header)
            meta[MetaKeys.AFFINE] = affine
            meta[MetaKeys.ORIGINAL_AFFINE] = affine.copy()
            meta[MetaKeys.SPATIAL_SHAPE] = np.asarray(arr.shape)
            if self.channel_dim is not None:
                meta[MetaKeys.ORIGINAL_CHANNEL_DIM] = self.channel_dim
            else:
                meta[MetaKeys.ORIGINAL_CHANNEL_DIM] = "no_channel" \
                    if arr.ndim == len(np.asarray(meta[MetaKeys.SPATIAL_SHAPE])) else 0
            arrays.append(arr)
        return (np.stack(arrays) if len(arrays) > 1 else arrays[0]), meta


class PydicomReader(ImageReader):
    """DICOM reader (reference: image_reader.py:386). Requires the optional `pydicom`
    package (not bundled in this environment)."""

    def __init__(self, channel_dim: str | int | None = None, affine_lps_to_ras: bool = True,
                 swap_ij: bool = True, prune_metadata: bool = True, label_dict=None,
                 fname_regex: str = "", **kwargs):
        from ..utils.module import optional_import

        self._pydicom, has = optional_import("pydicom")
        if not has:
            raise ImportError("PydicomReader requires the 'pydicom' package (not installed).")
        self.channel_dim = channel_dim
        self.affine_lps_to_ras = affine_lps_to_ras
        self.swap_ij = swap_ij
        self.prune_metadata = prune_metadata
        self.label_dict = label_dict
        self.fname_regex = fname_regex
        self.kwargs = kwargs

    def verify_suffix(self, filename: Any) -> bool:
        return is_supported_format(filename, ["dcm"])

    def read(self, data: Any, **kwargs):
        imgs = [self._pydicom.dcmread(str(name), **{**self.kwargs, **kwargs})
                for name in ensure_tuple(data)]
        return imgs if len(imgs) > 1 else imgs[0]

    def get_data(self, img) -> tuple[np.ndarray, dict]:
        img_list = img if isinstance(img, list) else [img]
        arrays, meta = [], {}
        for ds in img_list:
            arr = ds.pixel_array.astype(np.float32)
            slope = float(getattr(ds, "RescaleSlope", 1.0))
            intercept = float(getattr(ds, "RescaleIntercept", 0.0))
            arr = arr * slope + intercept
            if self.swap_ij:
                arr = np.swapaxes(arr, -1, -2)
            meta = {str(k): str(v) for k, v in ds.items()} if not self.prune_metadata else {}
            meta[MetaKeys.SPATIAL_SHAPE] = np.asarray(arr.shape)
            meta[MetaKeys.ORIGINAL_CHANNEL_DIM] = self.channel_dim \
                if self.channel_dim is not None else "no_channel"
            arrays.append(arr)
        return (np.stack(arrays) if len(arrays) > 1 else arrays[0]), meta
