"""IO transforms: LoadImage / SaveImage.

Parity targets: monai/transforms/io/array.py (LoadImage:109-305 with reader auto-select
by suffix, SaveImage:307 with writer registry + FolderLayout).
"""
from __future__ import annotations

import traceback
import warnings
from pathlib import Path
from typing import Any, Sequence

import numpy as np

from ..data.folder_layout import FolderLayout
from ..data.image_reader import (ImageReader, ITKReader, NiftiReader, NrrdReader,
                                 NumpyReader, PILReader, PydicomReader)
from ..data.image_writer import resolve_writer
from ..data.meta_image import MetaImage
from ..utils.enums import MetaKeys, PostFix, SpaceKeys
from ..utils.misc import ensure_tuple
from ..utils.module import look_up_option, optional_import
from .transform import Transform
from .utility_array import EnsureChannelFirst

__all__ = ["LoadImage", "SaveImage", "SUPPORTED_READERS"]

SUPPORTED_READERS = {
    "niftireader": NiftiReader,
    "nibabelreader": NiftiReader,
    "numpyreader": NumpyReader,
    "pilreader": PILReader,
    "itkreader": ITKReader,
    "nrrdreader": NrrdReader,
    "pydicomreader": PydicomReader,
}


class LoadImage(Transform):
    """Load image file(s) into a MetaImage (reference: io/array.py:109).

    Readers are tried last-registered-first, falling back by suffix.
    """

    def __init__(self, reader=None, image_only: bool = True, dtype=np.float32,
                 ensure_channel_first: bool = False, simple_keys: bool = False,
                 prune_meta_pattern: str | None = None, prune_meta_sep: str = ".",
                 expanduser: bool = True, *args, **kwargs):
        self.auto_select = reader is None
        self.image_only = image_only
        self.dtype = dtype
        self.ensure_channel_first = ensure_channel_first
        self.simple_keys = simple_keys
        self.expanduser = expanduser

        self.readers: list[ImageReader] = []
        # default readers, lowest priority first
        for r in (NumpyReader, PILReader, NiftiReader):
            try:
                self.register(r(*args, **kwargs))
            except Exception:  # optional deps
                pass
        if reader is None:
            return
        for _r in ensure_tuple(reader):
            if isinstance(_r, str):
                the_reader = look_up_option(_r.lower(), SUPPORTED_READERS)
                try:
                    self.register(the_reader(*args, **kwargs))
                except Exception as e:
                    warnings.warn(f"required package for reader {_r} is not installed: {e}")
            elif isinstance(_r, type):
                self.register(_r(*args, **kwargs))
            else:
                self.register(_r)

    def register(self, reader: ImageReader) -> None:
        if not isinstance(reader, ImageReader):
            warnings.warn(f"Preferably the reader should inherit ImageReader, but got {type(reader)}.")
        self.readers.append(reader)

    def __call__(self, filename: Sequence[str] | str, reader: ImageReader | None = None):
        filename_ = tuple(str(Path(s).expanduser() if self.expanduser else s) for s in ensure_tuple(filename))
        img, err = None, []
        if reader is not None:
            img = reader.read(filename_ if len(filename_) > 1 else filename_[0])
            img_array, meta = reader.get_data(img)
        else:
            for r in self.readers[::-1]:
                if self.auto_select:
                    if not r.verify_suffix(filename_):
                        continue
                try:
                    img = r.read(filename_ if len(filename_) > 1 else filename_[0])
                    img_array, meta = r.get_data(img)
                    break
                except Exception as e:
                    err.append(traceback.format_exc())
                    img = None
            else:
                img = None
            if img is None:
                msg = "\n".join(err)
                raise RuntimeError(
                    f"{self.__class__.__name__} cannot find a suitable reader for file: {filename_}.\n"
                    f"{msg}"
                )
        img_array = np.asarray(img_array)
        if self.dtype is not None:
            img_array = img_array.astype(self.dtype, copy=False)
        meta = dict(meta)
        meta[MetaKeys.FILENAME_OR_OBJ] = filename_[0] if len(filename_) == 1 else list(filename_)
        out = MetaImage(img_array, meta=meta)
        if self.ensure_channel_first:
            out = EnsureChannelFirst()(out)
        if self.image_only:
            return out
        return out, dict(out.meta)


class SaveImage(Transform):
    """Save a MetaImage to disk (reference: io/array.py:307)."""

    def __init__(self, output_dir: str = "./", output_postfix: str = "trans", output_ext: str = ".nii.gz",
                 output_dtype=np.float32, resample: bool = False, mode: str = "nearest",
                 padding_mode: str = "border", scale: int | None = None, dtype=np.float64,
                 squeeze_end_dims: bool = True, data_root_dir: str = "", separate_folder: bool = True,
                 print_log: bool = True, output_format: str = "", writer=None,
                 output_name_formatter=None, folder_layout=None, savepath_in_metadict: bool = False):
        self.folder_layout = folder_layout or FolderLayout(
            output_dir=output_dir, postfix=output_postfix, extension=output_ext,
            parent=separate_folder, makedirs=True, data_root_dir=data_root_dir)
        self.output_ext = output_ext.lower() or output_format.lower()
        self.output_ext = self.output_ext if self.output_ext.startswith(".") else f".{self.output_ext}"
        if isinstance(writer, str):
            writer_, has_built_in = optional_import("monai_tpu.data.image_writer", name=f"{writer}")
            if not has_built_in:
                raise ValueError(f"writer {writer} not found")
            writer = writer_
        self.writers = (writer,) if writer is not None else resolve_writer(self.output_ext[1:])
        self.output_dtype = output_dtype
        self.resample = resample
        self.scale = scale
        self.squeeze_end_dims = squeeze_end_dims
        self.print_log = print_log
        self.savepath_in_metadict = savepath_in_metadict
        self.write_kwargs = {"verbose": print_log}
        self._data_index = 0

    def __call__(self, img: Any, meta_data: dict | None = None, filename: str | None = None):
        meta_data = img.meta if isinstance(img, MetaImage) else (meta_data or {})
        if filename is not None:
            path = str(filename)
        else:
            subject = meta_data.get(MetaKeys.FILENAME_OR_OBJ, str(self._data_index)) if meta_data else str(self._data_index)
            patch_index = meta_data.get("patch_index", None) if meta_data else None
            path = self.folder_layout.filename(subject=f"{subject}", idx=patch_index)
        self._data_index += 1
        err = []
        for writer_cls in self.writers:
            try:
                w = writer_cls(output_dtype=self.output_dtype) if self.output_ext in (".nii", ".nii.gz") \
                    else writer_cls(output_dtype=self.output_dtype, scale=self.scale)
                w.set_data_array(img, channel_dim=0, squeeze_end_dims=self.squeeze_end_dims)
                w.set_metadata(meta_data, resample=self.resample)
                w.write(path, **self.write_kwargs)
                if self.savepath_in_metadict and isinstance(img, MetaImage):
                    img.meta[MetaKeys.SAVED_TO] = path
                return img
            except Exception:
                err.append(traceback.format_exc())
        msg = "\n".join(err)
        raise RuntimeError(
            f"{self.__class__.__name__} cannot find a suitable writer for {path}.\n{msg}")


class WriteFileMapping(Transform):
    """Append input->output path mappings to a JSON file (reference: io/array.py:526).

    Uses an exclusive open-append loop instead of the reference's FileLock dependency.
    """

    def __init__(self, mapping_file_path="mapping.json"):
        from pathlib import Path

        self.mapping_file_path = Path(mapping_file_path)

    def __call__(self, img):
        import json

        from ..data.meta_image import MetaImage
        from ..utils.enums import MetaKeys

        if not isinstance(img, MetaImage):
            raise ValueError("WriteFileMapping requires a MetaImage input with metadata.")
        meta = img.meta
        if "saved_to" not in meta:
            raise KeyError("Missing 'saved_to' key in metadata. Check SaveImage argument "
                           "'savepath_in_metadict' is True.")
        entry = {"input": str(meta.get(MetaKeys.FILENAME_OR_OBJ, "")),
                 "output": str(meta["saved_to"])}
        existing = []
        if self.mapping_file_path.exists():
            try:
                existing = json.loads(self.mapping_file_path.read_text() or "[]")
            except json.JSONDecodeError:
                existing = []
        existing.append(entry)
        self.mapping_file_path.write_text(json.dumps(existing, indent=2))
        return img


def switch_endianness(data, new: str = "<"):
    """Convert ``data`` to the target endianness recursively (reference:
    transforms/io/array.py:74)."""
    import sys as _sys

    if isinstance(data, np.ndarray):
        sys_native = "<" if (_sys.byteorder == "little") else ">"
        current_ = sys_native if data.dtype.byteorder not in ("<", ">") else data.dtype.byteorder
        if new not in ("<", ">"):
            raise NotImplementedError(f"Not implemented option new={new}.")
        if current_ != new:
            data = data.byteswap().view(data.dtype.newbyteorder(new))
        return data
    if isinstance(data, tuple):
        return tuple(switch_endianness(x, new) for x in data)
    if isinstance(data, list):
        return [switch_endianness(x, new) for x in data]
    if isinstance(data, dict):
        return {k: switch_endianness(v, new) for k, v in data.items()}
    return data
