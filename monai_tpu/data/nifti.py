"""Self-contained NIfTI-1 reader/writer (pure numpy, no nibabel dependency).

Implements the NIfTI-1 on-disk format from its public specification: 348-byte header,
optional gzip container, sform/qform affines (RAS+ world convention).  Functional
replacement for the reference's NibabelReader/NibabelWriter
(monai/data/image_reader.py:995, monai/data/image_writer.py:534).
"""
from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Any

import warnings
import numpy as np

__all__ = ["read_nifti", "write_nifti", "NiftiHeader"]

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


class NiftiHeader:
    """Parsed NIfTI-1 header fields needed for IO."""

    def __init__(self):
        self.dim = [1] * 8
        self.datatype = 16
        self.bitpix = 32
        self.pixdim = [1.0] * 8
        self.vox_offset = 352.0
        self.scl_slope = 0.0
        self.scl_inter = 0.0
        self.qform_code = 0
        self.sform_code = 1
        self.quatern = (0.0, 0.0, 0.0)
        self.qoffset = (0.0, 0.0, 0.0)
        self.srow = np.eye(4, dtype=np.float64)[:3]
        self.descrip = b""

    @property
    def shape(self) -> tuple:
        ndim = self.dim[0]
        return tuple(int(d) for d in self.dim[1:1 + ndim])

    def affine(self) -> np.ndarray:
        """World affine (RAS+): prefer sform, then qform, then pixdim diagonal."""
        if self.sform_code > 0:
            aff = np.eye(4, dtype=np.float64)
            aff[:3] = self.srow
            return aff
        if self.qform_code > 0:
            b, c, d = self.quatern
            a2 = 1.0 - (b * b + c * c + d * d)
            a = np.sqrt(max(a2, 0.0))
            R = np.array([
                [a * a + b * b - c * c - d * d, 2 * b * c - 2 * a * d, 2 * b * d + 2 * a * c],
                [2 * b * c + 2 * a * d, a * a + c * c - b * b - d * d, 2 * c * d - 2 * a * b],
                [2 * b * d - 2 * a * c, 2 * c * d + 2 * a * b, a * a + d * d - c * c - b * b],
            ])
            qfac = -1.0 if self.pixdim[0] == -1 else 1.0
            zooms = np.array([self.pixdim[1], self.pixdim[2], self.pixdim[3] * qfac])
            aff = np.eye(4, dtype=np.float64)
            aff[:3, :3] = R * zooms
            aff[:3, 3] = self.qoffset
            return aff
        aff = np.diag([self.pixdim[1], self.pixdim[2], self.pixdim[3], 1.0]).astype(np.float64)
        return aff


def _open_maybe_gz(path: Path, mode: str = "rb"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_nifti(filename: Any, dtype=None) -> tuple[np.ndarray, dict]:
    """Read a .nii / .nii.gz file.

    Returns (data_array[fortran axis order x,y,z,...], meta dict with 'affine',
    'original_affine', 'spatial_shape', 'pixdim', 'scl_slope'...).
    """
    path = Path(filename)
    with _open_maybe_gz(path) as f:
        raw = f.read()
    if len(raw) < 348:
        raise ValueError(f"File too short to be NIfTI-1: {filename}")
    sizeof_hdr = struct.unpack("<i", raw[:4])[0]
    endian = "<"
    if sizeof_hdr != 348:
        sizeof_hdr_be = struct.unpack(">i", raw[:4])[0]
        if sizeof_hdr_be == 348:
            endian = ">"
        else:
            raise ValueError(f"Not a NIfTI-1 file (sizeof_hdr={sizeof_hdr}): {filename}")
    magic = raw[344:348]
    if magic[:3] not in (b"n+1", b"ni1"):
        raise ValueError(f"Bad NIfTI magic {magic!r}: {filename}")

    hdr = NiftiHeader()
    hdr.dim = list(struct.unpack(endian + "8h", raw[40:56]))
    hdr.datatype = struct.unpack(endian + "h", raw[70:72])[0]
    hdr.bitpix = struct.unpack(endian + "h", raw[72:74])[0]
    hdr.pixdim = list(struct.unpack(endian + "8f", raw[76:108]))
    hdr.vox_offset = struct.unpack(endian + "f", raw[108:112])[0]
    hdr.scl_slope = struct.unpack(endian + "f", raw[112:116])[0]
    hdr.scl_inter = struct.unpack(endian + "f", raw[116:120])[0]
    hdr.descrip = raw[148:228].split(b"\0")[0]
    hdr.qform_code = struct.unpack(endian + "h", raw[252:254])[0]
    hdr.sform_code = struct.unpack(endian + "h", raw[254:256])[0]
    hdr.quatern = struct.unpack(endian + "3f", raw[256:268])
    hdr.qoffset = struct.unpack(endian + "3f", raw[268:280])
    srow = struct.unpack(endian + "12f", raw[280:328])
    hdr.srow = np.asarray(srow, dtype=np.float64).reshape(3, 4)

    if hdr.datatype not in _DTYPES:
        raise ValueError(f"Unsupported NIfTI datatype code {hdr.datatype}: {filename}")
    np_dtype = np.dtype(_DTYPES[hdr.datatype]).newbyteorder(endian)
    shape = hdr.shape
    count = int(np.prod(shape)) if shape else 0
    offset = int(hdr.vox_offset)
    data = np.frombuffer(raw, dtype=np_dtype, count=count, offset=offset)
    # NIfTI stores in Fortran (column-major) voxel order
    data = data.reshape(shape, order="F")
    if hdr.scl_slope not in (0.0, 1.0) or hdr.scl_inter != 0.0:
        slope = hdr.scl_slope if hdr.scl_slope != 0.0 else 1.0
        data = data * slope + hdr.scl_inter
    if dtype is not None:
        data = data.astype(dtype)
    else:
        data = np.asarray(data)
    affine = hdr.affine()
    meta = {
        "affine": affine.copy(),
        "original_affine": affine.copy(),
        "spatial_shape": np.asarray(shape[:3] if len(shape) >= 3 else shape),
        "pixdim": np.asarray(hdr.pixdim[1:1 + len(shape)]),
        "filename_or_obj": str(filename),
        "space": "RAS",
    }
    return data, meta


def write_nifti(data: np.ndarray, filename: Any, affine: np.ndarray | None = None,
                dtype=None) -> None:
    """Write array to .nii / .nii.gz with an sform affine (RAS+)."""
    path = Path(filename)
    arr = np.asarray(data)
    if dtype is not None:
        arr = arr.astype(dtype)
    if arr.dtype == np.bool_:
        arr = arr.astype(np.uint8)
    if np.dtype(arr.dtype) not in _DTYPE_CODES:
        arr = arr.astype(np.float32)
    code = _DTYPE_CODES[np.dtype(arr.dtype)]
    if affine is None:
        affine = np.eye(4, dtype=np.float64)
    affine = np.asarray(affine, dtype=np.float64)
    if affine.shape != (4, 4):
        full = np.eye(4)
        d = min(affine.shape[0] - 1, 3)
        full[:d, :d] = affine[:d, :d]
        full[:d, 3] = affine[:d, -1]
        affine = full
    ndim = arr.ndim
    dim = [ndim] + list(arr.shape) + [1] * (7 - ndim)
    zooms = np.sqrt((affine[:3, :3] ** 2).sum(axis=0))
    pixdim = [1.0] + list(zooms[:min(3, ndim)]) + [1.0] * (7 - min(3, ndim))

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, arr.dtype.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    descrip = b"monai_tpu"
    hdr[148:148 + len(descrip)] = descrip
    struct.pack_into("<h", hdr, 252, 0)  # qform_code
    struct.pack_into("<h", hdr, 254, 1)  # sform_code = SCANNER_ANAT
    struct.pack_into("<12f", hdr, 280, *affine[:3].reshape(-1).tolist())
    hdr[344:348] = b"n+1\0"

    body = hdr + b"\0\0\0\0" + np.asfortranarray(arr).tobytes(order="F")
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(bytes(body))
    else:
        with open(path, "wb") as f:
            f.write(bytes(body))


def rectify_header_sform_qform(img_nii):
    """Make the nibabel header's sform/qform consistent with the data spacing
    (reference: monai/data/utils.py rectify_header_sform_qform)."""
    d = img_nii.header["dim"][0]
    pixdim = np.asarray(img_nii.header.get_zooms())[:d]
    sform, qform = img_nii.get_sform(), img_nii.get_qform()
    norm_sform = np.sqrt(np.sum(np.square(sform[:d, :d]), 0))
    norm_qform = np.sqrt(np.sum(np.square(qform[:d, :d]), 0))
    sform_mismatch = not np.allclose(norm_sform, pixdim)
    qform_mismatch = not np.allclose(norm_qform, pixdim)
    if img_nii.header["sform_code"] != 0 and not sform_mismatch:
        return img_nii
    if img_nii.header["qform_code"] != 0 and not qform_mismatch:
        img_nii.set_sform(img_nii.get_qform())
        return img_nii
    norm = np.sqrt(np.sum(np.square(img_nii.affine[:d, :d]), 0))
    warnings.warn(f"Modifying image pixdim from {pixdim} to {norm}")
    img_nii.header.set_zooms(norm)
    return img_nii


def correct_nifti_header_if_necessary(img_nii):
    """Check and fix the affine/pixdim consistency of a nibabel image
    (reference: monai/data/utils.py correct_nifti_header_if_necessary)."""
    if img_nii.header.get("dim") is None:
        return img_nii
    dim = img_nii.header["dim"][0]
    if dim >= 5:
        return img_nii
    pixdim = np.asarray(img_nii.header.get_zooms())[:dim]
    norm_affine = np.sqrt(np.sum(np.square(img_nii.affine[:dim, :dim]), 0))
    if np.allclose(pixdim, norm_affine):
        return img_nii
    if hasattr(img_nii, "get_sform"):
        return rectify_header_sform_qform(img_nii)
    return img_nii
