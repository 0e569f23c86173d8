"""Image writers with a format registry.

Parity targets: monai/data/image_writer.py (register_writer/resolve_writer:67,92,
ImageWriter base:125 with resample_if_needed, NibabelWriter→NiftiWriter:534, PILWriter:675).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.enums import MetaKeys
from ..utils.misc import ensure_tuple
from .meta_image import MetaImage
from .nifti import write_nifti

__all__ = ["ImageWriter", "NiftiWriter", "NibabelWriter", "PILWriter", "register_writer", "resolve_writer"]

SUPPORTED_WRITERS: dict = {}


def register_writer(ext_name: str, *im_writers) -> None:
    """Register writers for a file extension (reference: image_writer.py:67)."""
    fmt = f"{ext_name}".lower()
    if fmt.startswith("."):
        fmt = fmt[1:]
    existing = SUPPORTED_WRITERS.get(fmt, ())
    all_writers = im_writers + existing
    SUPPORTED_WRITERS[fmt] = all_writers


def resolve_writer(ext_name, error_if_not_found: bool = True) -> tuple:
    """Writers for an extension, tried in order (reference: image_writer.py:92)."""
    fmt = f"{ext_name}".lower()
    if fmt.startswith("."):
        fmt = fmt[1:]
    avail_writers = []
    default_writers = SUPPORTED_WRITERS.get("*", ())
    for _writer in SUPPORTED_WRITERS.get(fmt, default_writers):
        avail_writers.append(_writer)
    if not avail_writers and error_if_not_found:
        raise OSError(f"No ImageWriter backend found for {fmt}.")
    return tuple(avail_writers)


class ImageWriter:
    """Base writer: set_data_array / set_metadata / write (reference: image_writer.py:125)."""

    def __init__(self, **kwargs):
        self.data_obj: Any = None
        for k, v in kwargs.items():
            setattr(self, k, v)

    def set_data_array(self, data_array, channel_dim: int | None = 0, squeeze_end_dims: bool = True,
                       **kwargs):
        arr = to_numpy(data_array.data if isinstance(data_array, MetaImage) else data_array)
        if channel_dim is not None:
            arr = np.moveaxis(arr, channel_dim, -1)  # channel-last on disk
            if squeeze_end_dims and arr.shape[-1] == 1:
                arr = arr[..., 0]
        self.data_obj = arr

    def set_metadata(self, meta_dict: dict | None = None, resample: bool = True, **options):
        meta_dict = meta_dict or {}
        self.affine = np.asarray(meta_dict.get(MetaKeys.AFFINE, np.eye(4)), dtype=np.float64)
        self.original_affine = np.asarray(meta_dict.get(MetaKeys.ORIGINAL_AFFINE, self.affine), dtype=np.float64)
        self.resample = resample

    def _resampled(self):
        """Resample back to the original affine grid if requested
        (reference: image_writer.py resample_if_needed → SpatialResample)."""
        if not getattr(self, "resample", False) or np.allclose(self.affine, self.original_affine, atol=1e-5):
            return self.data_obj, self.affine
        from ..transforms.spatial_array import SpatialResample

        arr = self.data_obj
        # channel-last → channel-first for the transform
        chan_last = arr.ndim > 3 or (arr.ndim == 3 and arr.shape[-1] <= 4)
        img = MetaImage(np.moveaxis(arr, -1, 0) if chan_last else arr[None], affine=self.affine)
        out = SpatialResample()(img, dst_affine=self.original_affine)
        out_arr = out.data
        out_arr = np.moveaxis(out_arr, 0, -1) if chan_last else out_arr[0]
        return np.asarray(out_arr), self.original_affine

    def write(self, filename, verbose: bool = False, **kwargs):
        if verbose:
            print(f"writing: {filename}")


class NiftiWriter(ImageWriter):
    """NIfTI writer using the built-in pure-numpy serializer
    (replaces NibabelWriter, reference: image_writer.py:534)."""

    def __init__(self, output_dtype=np.float32, **kwargs):
        super().__init__(output_dtype=output_dtype, affine=np.eye(4), **kwargs)

    def write(self, filename, verbose: bool = False, **obj_kwargs):
        super().write(filename, verbose=verbose)
        data, affine = self._resampled()
        write_nifti(data, filename, affine=affine, dtype=self.output_dtype)


NibabelWriter = NiftiWriter


class PILWriter(ImageWriter):
    """PNG/JPG writer (reference: image_writer.py:675)."""

    def __init__(self, output_dtype=np.uint8, scale: int | None = 255, **kwargs):
        super().__init__(output_dtype=output_dtype, scale=scale, **kwargs)

    def set_data_array(self, data_array, channel_dim: int | None = 0, squeeze_end_dims: bool = True,
                       **kwargs):
        arr = to_numpy(data_array.data if isinstance(data_array, MetaImage) else data_array)
        if channel_dim is not None:
            arr = np.moveaxis(arr, channel_dim, -1)
            if arr.shape[-1] == 1:
                arr = arr[..., 0]
        self.data_obj = arr

    def write(self, filename, verbose: bool = False, **obj_kwargs):
        super().write(filename, verbose=verbose)
        from PIL import Image as PILImage

        data = self.data_obj
        if self.scale is not None:
            mn, mx = data.min(), data.max()
            if mx > mn:
                data = (data - mn) / (mx - mn) * self.scale
            data = data.astype(self.output_dtype)
        img = PILImage.fromarray(data)
        img.save(filename)


register_writer("nii.gz", NiftiWriter)
register_writer("nii", NiftiWriter)
register_writer("png", PILWriter)
register_writer("jpg", PILWriter)
register_writer("jpeg", PILWriter)
register_writer("bmp", PILWriter)
register_writer("*", NiftiWriter)


class ITKWriter(ImageWriter):
    """ITK-backed writer (reference: image_writer.py:347 ITKWriter). Requires the
    optional `itk` package (not bundled); NiftiWriter covers the common volumetric
    output path without it."""

    def __init__(self, output_dtype=None, affine_lps_to_ras: bool = True, **kwargs):
        from ..utils.module import optional_import

        self._itk, has = optional_import("itk")
        if not has:
            raise ImportError("ITKWriter requires the optional 'itk' package "
                              "(not installed); use NiftiWriter instead.")
        super().__init__(**kwargs)
        self.output_dtype = output_dtype
        self.affine_lps_to_ras = affine_lps_to_ras


def init() -> None:
    """(Re-)register the default writers per filename extension (reference:
    image_writer.py:865)."""
    for ext in ("png", "jpg", "jpeg", "bmp", "tiff", "tif"):
        register_writer(ext, PILWriter)
    for ext in ("nii.gz", "nii"):
        register_writer(ext, NiftiWriter, NibabelWriter)
    register_writer("nrrd", NiftiWriter, NibabelWriter)
    register_writer("*", NiftiWriter, NibabelWriter)
