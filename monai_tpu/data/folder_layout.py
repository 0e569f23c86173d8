"""Output filename layout (reference: monai/data/folder_layout.py)."""
from __future__ import annotations

import os
from pathlib import Path

__all__ = ["FolderLayout", "default_name_formatter"]


def default_name_formatter(metadict: dict, saver) -> dict:
    subject = metadict.get("filename_or_obj", getattr(saver, "_data_index", 0)) if metadict else 0
    patch_index = metadict.get("patch_index", None) if metadict else None
    return {"subject": f"{subject}", "idx": patch_index}


class FolderLayout:
    """Generates output paths ``{output_dir}/{subject}/{subject}{postfix}{idx}{ext}``
    (reference: folder_layout.py:46)."""

    def __init__(self, output_dir: str, postfix: str = "", extension: str = "", parent: bool = False,
                 makedirs: bool = False, data_root_dir: str = ""):
        self.output_dir = output_dir
        self.postfix = postfix
        self.ext = extension
        self.parent = parent
        self.makedirs = makedirs
        self.data_root_dir = data_root_dir

    def filename(self, subject: str = "subject", idx=None, **kwargs) -> str:
        full_name = _create_file_basename(
            postfix=self.postfix, input_file_name=subject, folder_path=self.output_dir,
            data_root_dir=self.data_root_dir, separate_folder=self.parent,
            patch_index=idx, makedirs=self.makedirs)
        for k, v in kwargs.items():
            full_name += f"_{k}-{v}"
        if self.ext is not None:
            ext = f"{self.ext}"
            full_name += f".{ext}" if ext and not ext.startswith(".") else f"{ext}"
        return full_name


def _create_file_basename(postfix: str, input_file_name: str, folder_path: str,
                          data_root_dir: str = "", separate_folder: bool = True, patch_index=None,
                          makedirs: bool = True) -> str:
    """(reference: monai/data/utils.py create_file_basename)."""
    filedir, filename = os.path.split(input_file_name)
    filename, ext = os.path.splitext(filename)
    if ext == ".gz":
        filename, ext = os.path.splitext(filename)
    subfolder_path = Path(folder_path)
    if data_root_dir and filedir:
        filedir_rel_path = os.path.relpath(filedir, data_root_dir)
        subfolder_path = subfolder_path / filedir_rel_path
    if separate_folder:
        subfolder_path = subfolder_path / filename
    if makedirs:
        subfolder_path.mkdir(parents=True, exist_ok=True)
    output = str(subfolder_path / filename)
    if postfix:
        output += f"_{postfix}"
    if patch_index is not None:
        output += f"_{patch_index}"
    return output


class FolderLayoutBase:
    """ABC for output filename layouts (reference: folder_layout.py FolderLayoutBase)."""

    def filename(self, **kwargs):
        raise NotImplementedError
