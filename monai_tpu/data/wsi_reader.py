"""Whole-slide image readers (reference: monai/data/wsi_reader.py:43 BaseWSIReader,
:447 WSIReader, :651 CuCIMWSIReader, :833 OpenSlideWSIReader, TiffFileWSIReader).

The cucim/openslide/tifffile backends are gated with ``optional_import`` (none are
bundled in this environment); a PIL backend is provided as a working single-level
fallback so the patch-extraction pipeline is exercisable without WSI libraries.
"""
from __future__ import annotations

from abc import abstractmethod
from collections.abc import Sequence
from typing import Any

import numpy as np

from ..utils.enums import MetaKeys
from ..utils.module import optional_import, require_pkg
from .meta_image import MetaImage

__all__ = ["BaseWSIReader", "WSIReader", "CuCIMWSIReader", "OpenSlideWSIReader",
           "TiffFileWSIReader", "PILWSIReader"]


class BaseWSIReader:
    """Common patch-extraction logic over level/size/mpp accessors
    (reference: wsi_reader.py:43)."""

    supported_suffixes: list[str] = []
    backend = ""

    def __init__(self, level: int | None = None, mpp: float | tuple[float, float] | None = None,
                 mpp_rtol: float = 0.05, mpp_atol: float = 0.0,
                 power: int | None = None, power_rtol: float = 0.05, power_atol: float = 0.0,
                 channel_dim: int = 0, dtype=np.uint8, device=None, mode: str = "RGB",
                 **kwargs):
        self.level = level
        self.mpp = mpp
        self.power = power
        self.channel_dim = channel_dim
        self.dtype = dtype
        self.mode = mode
        self.kwargs = kwargs
        self.metadata: dict[Any, Any] = {}

    @abstractmethod
    def get_size(self, wsi, level: int) -> tuple[int, int]:
        ...

    @abstractmethod
    def get_level_count(self, wsi) -> int:
        ...

    def get_downsample_ratio(self, wsi, level: int) -> float:
        s0 = self.get_size(wsi, 0)
        sl = self.get_size(wsi, level)
        return s0[0] / sl[0]

    def get_valid_level(self, wsi, level, mpp=None, power=None) -> int:
        if level is None:
            level = self.level if self.level is not None else 0
        n = self.get_level_count(wsi)
        if level < 0:
            level += n
        if not 0 <= level < n:
            raise ValueError(f"level {level} out of range [0, {n}).")
        return level

    @abstractmethod
    def _get_patch(self, wsi, location, size, level, dtype, mode) -> np.ndarray:
        ...

    def verify_suffix(self, filename) -> bool:
        from pathlib import Path

        suffixes = [Path(str(f)).suffix[1:].lower() for f in
                    (filename if isinstance(filename, (list, tuple)) else [filename])]
        return all(s in self.supported_suffixes for s in suffixes)

    def get_data(self, wsi, location: tuple[int, int] = (0, 0), size=None, level=None,
                 mode: str | None = None):
        """Extract a patch (C, H, W) + metadata (reference: wsi_reader.py:320)."""
        mode = mode or self.mode
        patch_list = []
        meta_list = []
        for each in (wsi if isinstance(wsi, (list, tuple)) else [wsi]):
            lvl = self.get_valid_level(each, level)
            if size is None:
                sz = self.get_size(each, lvl)
                loc = (0, 0)
            else:
                sz = size
                loc = location
            patch = self._get_patch(each, loc, sz, lvl, self.dtype, mode)
            meta = {
                MetaKeys.ORIGINAL_CHANNEL_DIM: self.channel_dim,
                MetaKeys.SPATIAL_SHAPE: np.asarray(patch.shape[1:]),
                "location": loc, "size": sz, "level": lvl,
            }
            patch_list.append(patch)
            meta_list.append(meta)
        if len(patch_list) == 1:
            return patch_list[0], meta_list[0]
        return np.stack(patch_list), meta_list[0]

    def read(self, data, **kwargs):
        raise NotImplementedError


class CuCIMWSIReader(BaseWSIReader):
    """(reference: wsi_reader.py:651). Requires the optional `cucim` package."""

    supported_suffixes = ["tif", "tiff", "svs"]
    backend = "cucim"

    def __init__(self, *args, **kwargs):
        self._cucim, has = optional_import("cucim")
        if not has:
            raise ImportError("CuCIMWSIReader requires the 'cucim' package (not installed).")
        super().__init__(*args, **kwargs)

    def get_level_count(self, wsi) -> int:
        return int(wsi.resolutions["level_count"])

    def get_size(self, wsi, level: int) -> tuple[int, int]:
        d = wsi.resolutions["level_dimensions"][level]
        return (int(d[1]), int(d[0]))

    def read(self, data, **kwargs):
        img = self._cucim.CuImage
        files = data if isinstance(data, (list, tuple)) else [data]
        out = [img(str(f), **kwargs) for f in files]
        return out if len(out) > 1 else out[0]

    def _get_patch(self, wsi, location, size, level, dtype, mode) -> np.ndarray:
        patch = wsi.read_region(location=location[::-1], size=size[::-1], level=level)
        arr = np.asarray(patch, dtype=dtype)
        arr = arr.transpose(2, 0, 1)
        if mode == "RGB":
            arr = arr[:3]
        return arr


class OpenSlideWSIReader(BaseWSIReader):
    """(reference: wsi_reader.py:833). Requires the optional `openslide` package."""

    supported_suffixes = ["tif", "tiff", "svs", "ndpi"]
    backend = "openslide"

    def __init__(self, *args, **kwargs):
        self._openslide, has = optional_import("openslide")
        if not has:
            raise ImportError("OpenSlideWSIReader requires 'openslide-python' (not installed).")
        super().__init__(*args, **kwargs)

    def get_level_count(self, wsi) -> int:
        return int(wsi.level_count)

    def get_size(self, wsi, level: int) -> tuple[int, int]:
        d = wsi.level_dimensions[level]
        return (int(d[1]), int(d[0]))

    def read(self, data, **kwargs):
        files = data if isinstance(data, (list, tuple)) else [data]
        out = [self._openslide.OpenSlide(str(f)) for f in files]
        return out if len(out) > 1 else out[0]

    def _get_patch(self, wsi, location, size, level, dtype, mode) -> np.ndarray:
        # `location` is already level-0 (yx); openslide wants level-0 xy
        loc0 = (int(location[1]), int(location[0]))
        pil = wsi.read_region(location=loc0, size=size[::-1], level=level).convert(mode)
        return np.asarray(pil, dtype=dtype).transpose(2, 0, 1)


class TiffFileWSIReader(BaseWSIReader):
    """(reference: wsi_reader.py TiffFileWSIReader). Requires `tifffile` (not installed)."""

    supported_suffixes = ["tif", "tiff", "svs"]
    backend = "tifffile"

    def __init__(self, *args, **kwargs):
        self._tifffile, has = optional_import("tifffile")
        if not has:
            raise ImportError("TiffFileWSIReader requires the 'tifffile' package (not installed).")
        super().__init__(*args, **kwargs)

    def get_level_count(self, wsi) -> int:
        return len(wsi.pages)

    def get_size(self, wsi, level: int) -> tuple[int, int]:
        return (int(wsi.pages[level].imagelength), int(wsi.pages[level].imagewidth))

    def read(self, data, **kwargs):
        files = data if isinstance(data, (list, tuple)) else [data]
        out = [self._tifffile.TiffFile(str(f), **kwargs) for f in files]
        return out if len(out) > 1 else out[0]

    def _get_patch(self, wsi, location, size, level, dtype, mode) -> np.ndarray:
        # `location` is in the level-0 reference frame (reference convention)
        ratio = self.get_downsample_ratio(wsi, level)
        loc = [round(location[i] / ratio) for i in range(len(location))]
        arr = wsi.asarray(level=level)
        patch = arr[loc[0]:loc[0] + size[0], loc[1]:loc[1] + size[1]]
        if patch.ndim == 2:
            patch = patch[..., None].repeat(3, axis=-1)
        return np.asarray(patch, dtype=dtype).transpose(2, 0, 1)[:3]


class PILWSIReader(BaseWSIReader):
    """PIL-backed slide reader. Ordinary images are one-level slides; MULTI-PAGE
    TIFFs are treated as resolution pyramids (page k = level k), so real pyramidal
    WSI files round-trip without the optional cucim/openslide/tifffile packages.
    Patch ``location`` follows the reference's level-0 frame convention."""

    supported_suffixes = ["png", "jpg", "jpeg", "bmp", "tif", "tiff"]
    backend = "pil"

    def get_level_count(self, wsi) -> int:
        return int(getattr(wsi, "n_frames", 1))

    def get_size(self, wsi, level: int) -> tuple[int, int]:
        if getattr(wsi, "n_frames", 1) > 1:
            wsi.seek(level)
        return (int(wsi.height), int(wsi.width))

    def read(self, data, **kwargs):
        from PIL import Image

        files = data if isinstance(data, (list, tuple)) else [data]
        out = [Image.open(str(f)) for f in files]
        return out if len(out) > 1 else out[0]

    def _get_patch(self, wsi, location, size, level, dtype, mode) -> np.ndarray:
        if getattr(wsi, "n_frames", 1) > 1:
            ratio = self.get_downsample_ratio(wsi, level)
            wsi.seek(level)
        else:
            ratio = 1.0
        loc = [round(location[i] / ratio) for i in range(len(location))]
        arr = np.asarray(wsi.convert(mode))
        patch = arr[loc[0]:loc[0] + size[0], loc[1]:loc[1] + size[1]]
        return np.asarray(patch, dtype=dtype).transpose(2, 0, 1)


class WSIReader(BaseWSIReader):
    """Backend-dispatching reader (reference: wsi_reader.py:447).

    ``backend`` one of cucim/openslide/tifffile/pil; the first three require their
    optional packages.
    """

    def __init__(self, backend: str = "cucim", level: int | None = None, **kwargs):
        self.backend = backend.lower()
        readers = {"cucim": CuCIMWSIReader, "openslide": OpenSlideWSIReader,
                   "tifffile": TiffFileWSIReader, "pil": PILWSIReader}
        if self.backend not in readers:
            raise ValueError(f"unsupported backend {backend}; use one of {list(readers)}")
        self.reader = readers[self.backend](level=level, **kwargs)
        super().__init__(level=level, **kwargs)
        self.supported_suffixes = self.reader.supported_suffixes

    def get_level_count(self, wsi) -> int:
        return self.reader.get_level_count(wsi)

    def get_size(self, wsi, level: int) -> tuple[int, int]:
        return self.reader.get_size(wsi, level)

    def read(self, data, **kwargs):
        return self.reader.read(data, **kwargs)

    def _get_patch(self, wsi, location, size, level, dtype, mode) -> np.ndarray:
        return self.reader._get_patch(wsi, location, size, level, dtype, mode)
