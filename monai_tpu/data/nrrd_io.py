"""Minimal pure-python NRRD reader (reference: monai/data/image_reader.py:1431
NrrdReader, which wraps pynrrd — not bundled here, so the format is parsed directly).

Supports the common NRRD0004/5 subset: raw/gzip encodings, little/big endian, space
directions/origin for the affine. Format spec: https://teem.sourceforge.net/nrrd/format.html
"""
from __future__ import annotations

import gzip
import zlib

import numpy as np

__all__ = ["read_nrrd", "NrrdImage"]

_NRRD_TYPES = {
    "signed char": np.int8, "int8": np.int8, "int8_t": np.int8,
    "uchar": np.uint8, "unsigned char": np.uint8, "uint8": np.uint8, "uint8_t": np.uint8,
    "short": np.int16, "short int": np.int16, "signed short": np.int16, "int16": np.int16,
    "int16_t": np.int16,
    "ushort": np.uint16, "unsigned short": np.uint16, "uint16": np.uint16,
    "uint16_t": np.uint16,
    "int": np.int32, "signed int": np.int32, "int32": np.int32, "int32_t": np.int32,
    "uint": np.uint32, "unsigned int": np.uint32, "uint32": np.uint32, "uint32_t": np.uint32,
    "longlong": np.int64, "long long": np.int64, "int64": np.int64, "int64_t": np.int64,
    "ulonglong": np.uint64, "unsigned long long": np.uint64, "uint64": np.uint64,
    "uint64_t": np.uint64,
    "float": np.float32, "double": np.float64,
}


def _parse_vector(text: str) -> list[float] | None:
    text = text.strip()
    if text == "none":
        return None
    return [float(v) for v in text.strip("()").split(",")]


def read_nrrd(filename: str) -> tuple[np.ndarray, dict]:
    """Read an NRRD file -> (data in F-index order per the header, header dict)."""
    opener = gzip.open if str(filename).endswith(".gz") else open
    with opener(filename, "rb") as f:
        magic = f.readline().decode("ascii", errors="replace").strip()
        if not magic.startswith("NRRD"):
            raise ValueError(f"{filename} is not a NRRD file (magic: {magic!r}).")
        header: dict = {}
        while True:
            line = f.readline()
            if not line or line.strip() == b"":
                break  # blank line terminates the header
            text = line.decode("ascii", errors="replace").rstrip("\n")
            if text.startswith("#"):
                continue
            if ":=" in text:
                k, v = text.split(":=", 1)
                header[k.strip()] = v.strip()
            elif ":" in text:
                k, v = text.split(":", 1)
                header[k.strip()] = v.strip()
        if "data file" in header or "datafile" in header:
            raise NotImplementedError("detached NRRD data files are not supported.")
        sizes = [int(s) for s in header["sizes"].split()]
        dtype = _NRRD_TYPES.get(header["type"].lower())
        if dtype is None:
            raise ValueError(f"unsupported NRRD type {header['type']!r}.")
        dtype = np.dtype(dtype)
        endian = header.get("endian", "little")
        if dtype.itemsize > 1:
            dtype = dtype.newbyteorder("<" if endian == "little" else ">")
        encoding = header.get("encoding", "raw").lower()
        payload = f.read()
    if encoding in ("gzip", "gz"):
        payload = zlib.decompress(payload, zlib.MAX_WBITS | 32)
    elif encoding in ("ascii", "text", "txt"):
        data = np.array(payload.decode("ascii").split(), dtype=dtype)
        data = data.reshape(sizes[::-1]).transpose(tuple(range(len(sizes))[::-1]))
        return data, header
    elif encoding != "raw":
        raise NotImplementedError(f"NRRD encoding {encoding!r} not supported.")
    count = int(np.prod(sizes))
    data = np.frombuffer(payload, dtype=dtype, count=count)
    # NRRD stores the FIRST axis fastest; C-reshape reversed sizes then transpose
    data = data.reshape(sizes[::-1]).transpose(tuple(range(len(sizes))[::-1]))
    # parse structured fields
    if "space directions" in header:
        dirs = [_parse_vector(v) for v in header["space directions"].split(") ")]
        header["space directions"] = dirs
    if "space origin" in header:
        header["space origin"] = _parse_vector(header["space origin"])
    return data, header


class NrrdImage:
    """Bundle of (array, header) as returned by the NRRD reader
    (reference: image_reader.py:1423 NrrdImage)."""

    __slots__ = ("array", "header")

    def __init__(self, array, header):
        self.array = array
        self.header = header
