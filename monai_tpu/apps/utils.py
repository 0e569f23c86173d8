"""App utilities (reference: monai/apps/utils.py:370 download_url/extractall/
download_and_extract, get_logger, check_hash)."""
from __future__ import annotations

import hashlib
import logging
import os
import shutil
import sys
import tarfile
import zipfile
from pathlib import Path
from typing import Any

__all__ = ["get_logger", "check_hash", "download_url", "extractall", "download_and_extract",
           "logger", "SUPPORTED_HASH_TYPES"]

DEFAULT_FMT = "%(asctime)s - %(levelname)s - %(message)s"
SUPPORTED_HASH_TYPES = {"md5": hashlib.md5, "sha1": hashlib.sha1, "sha256": hashlib.sha256,
                        "sha512": hashlib.sha512}


def get_logger(module_name: str = "monai_tpu.apps", fmt: str = DEFAULT_FMT, datefmt: str | None = None,
               logger_handler: logging.Handler | None = None) -> logging.Logger:
    """Module logger writing to stdout (reference: apps/utils.py get_logger)."""
    adds_stdout_handler = module_name is not None and module_name not in logging.root.manager.loggerDict
    logger = logging.getLogger(module_name)
    logger.propagate = False
    logger.setLevel(logging.INFO)
    if adds_stdout_handler:
        handler = logging.StreamHandler(sys.stdout)
        formatter = logging.Formatter(fmt=fmt, datefmt=datefmt)
        handler.setFormatter(formatter)
        logger.addHandler(handler)
    if logger_handler is not None:
        logger.addHandler(logger_handler)
    return logger


logger = get_logger("monai_tpu.apps")


def check_hash(filepath: str, val: str | None = None, hash_type: str = "md5") -> bool:
    """Verify a file hash (reference: apps/utils.py check_hash)."""
    if val is None:
        logger.info(f"Expected {hash_type} is None, skip {hash_type} check for file {filepath}.")
        return True
    if hash_type.lower() not in SUPPORTED_HASH_TYPES:
        raise NotImplementedError(f"Unknown 'hash_type' {hash_type}.")
    actual_hash_func = SUPPORTED_HASH_TYPES[hash_type.lower()]
    actual_hash = actual_hash_func(usedforsecurity=False) if sys.version_info >= (3, 9) else actual_hash_func()
    try:
        with open(filepath, "rb") as f:
            for chunk in iter(lambda: f.read(1024 * 1024), b""):
                actual_hash.update(chunk)
    except Exception as e:
        logger.error(f"Exception in check_hash: {e}")
        return False
    if actual_hash.hexdigest() != val:
        logger.error(f"check_hash failed {actual_hash.hexdigest()}.")
        return False
    logger.info(f"Verified '{os.path.basename(filepath)}', {hash_type}: {val}.")
    return True


def download_url(url: str, filepath: str = "", hash_val: str | None = None, hash_type: str = "md5",
                 progress: bool = True, **gdown_kwargs) -> None:
    """Download a URL (reference: apps/utils.py:—).

    This environment is zero-egress: local file:// URLs and existing paths work; network
    downloads raise with a clear message.
    """
    if not filepath:
        filepath = os.path.abspath(os.path.basename(url))
    if os.path.exists(filepath):
        if not check_hash(filepath, hash_val, hash_type):
            raise RuntimeError(f"{hash_type} check of existing file failed: filepath={filepath}, "
                               f"expected {hash_type}={hash_val}.")
        logger.info(f"File exists: {filepath}, skipped downloading.")
        return
    if url.startswith("file://") or os.path.exists(url):
        src = url[len("file://"):] if url.startswith("file://") else url
        shutil.copyfile(src, filepath)
        if not check_hash(filepath, hash_val, hash_type):
            raise RuntimeError(f"{hash_type} check of copied file failed: {filepath}.")
        return
    try:
        import urllib.request

        urllib.request.urlretrieve(url, filepath)
    except Exception as e:
        raise RuntimeError(
            f"network downloads are unavailable in this environment; stage the file at {filepath} "
            f"manually (tried {url}).") from e
    if not check_hash(filepath, hash_val, hash_type):
        raise RuntimeError(f"{hash_type} check of downloaded file failed: URL={url}, filepath={filepath}.")


def extractall(filepath: str, output_dir: str = ".", hash_val: str | None = None, hash_type: str = "md5",
               file_type: str = "", has_base: bool = True) -> None:
    """Extract zip/tar archives (reference: apps/utils.py extractall)."""
    if has_base:
        cache_dir = os.path.join(output_dir, _basename(filepath).split(".")[0])
    else:
        cache_dir = output_dir
    if os.path.exists(cache_dir) and len(os.listdir(cache_dir)) > 0:
        logger.info(f"Non-empty folder exists in {cache_dir}, skipped extracting.")
        return
    filepath = str(filepath)
    if hash_val and not check_hash(filepath, hash_val, hash_type):
        raise RuntimeError(f"{hash_type} check of compressed file failed: {filepath}.")
    logger.info(f"Writing into directory: {output_dir}.")
    _file_type = file_type.lower().strip()
    if filepath.endswith("zip") or _file_type == "zip":
        zip_file = zipfile.ZipFile(filepath)
        zip_file.extractall(output_dir)
        zip_file.close()
        return
    if filepath.endswith("tar") or filepath.endswith("tar.gz") or "tar" in _file_type:
        tar_file = tarfile.open(filepath)
        tar_file.extractall(output_dir)
        tar_file.close()
        return
    raise NotImplementedError(f'Unsupported file type, available options are: ["zip", "tar.gz", "tar"].')


def _basename(p) -> str:
    sep = os.path.sep + (os.path.altsep or "") + "/ "
    return Path(f"{p}".rstrip(sep)).name


def download_and_extract(url: str, filepath: str = "", output_dir: str = ".", hash_val: str | None = None,
                         hash_type: str = "md5", file_type: str = "", has_base: bool = True,
                         progress: bool = True) -> None:
    """Download + extract (reference: apps/utils.py download_and_extract)."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp_dir:
        filename = filepath or os.path.join(tmp_dir, f"{_basename(url)}")
        download_url(url=url, filepath=filename, hash_val=hash_val, hash_type=hash_type,
                     progress=progress)
        extractall(filepath=filename, output_dir=output_dir, file_type=file_type, has_base=has_base)


def get_filename_from_url(data_url: str) -> str:
    """Best-effort filename from a download URL (reference: apps/utils.py:304).
    The Content-Disposition probe needs egress (gated); the URL-path basename
    fallback is always available."""
    import os
    import re
    from urllib.parse import unquote, urlparse

    if os.environ.get("MONAI_TPU_ALLOW_DOWNLOADS", "0") == "1":
        try:
            import requests

            response = requests.head(data_url, allow_redirects=True, timeout=30)
            content_disposition = response.headers.get("Content-Disposition")
            if content_disposition:
                filename = re.findall('filename="?([^";]+)"?', content_disposition)
                if filename:
                    return str(filename[0])
        except Exception:
            pass
    return os.path.basename(unquote(urlparse(data_url).path))
