"""ITK <-> MetaImage bridge (reference: monai/data/itk_torch_bridge.py:30-345).

The affine conversion math (spacing / direction / center-of-rotation / reference
space) is pure numpy f64 and duck-types the ITK image API (``GetSpacing``,
``GetDirection``, ``GetOrigin``, ``GetLargestPossibleRegion``), so it is usable
and testable without the optional ``itk`` package; only the functions that
construct real ITK objects require it.
"""
from __future__ import annotations

import numpy as np

from ..utils.module import optional_import

itk, has_itk = optional_import("itk")

__all__ = [
    "itk_image_to_metatensor",
    "metatensor_to_itk_image",
    "itk_to_monai_affine",
    "monai_to_itk_affine",
    "get_itk_image_center",
    "monai_to_itk_ddf",
]


def _direction_array(image) -> np.ndarray:
    d = image.GetDirection()
    if has_itk and not isinstance(d, np.ndarray):
        try:
            return np.asarray(itk.array_from_matrix(d), dtype=np.float64)
        except Exception:
            pass
    return np.asarray(d, dtype=np.float64)


def get_itk_image_center(image) -> list:
    """Implicit (MONAI-convention) center of an ITK image (reference:
    itk_torch_bridge.py:196)."""
    image_size = np.asarray(image.GetLargestPossibleRegion().GetSize(), np.float32)
    spacing = np.asarray(image.GetSpacing())
    origin = np.asarray(image.GetOrigin())
    center = _direction_array(image) @ ((image_size / 2 - 0.5) * spacing) + origin
    return center.tolist()


def _assert_itk_regions_match_array(image) -> None:
    largest = image.GetLargestPossibleRegion()
    largest_size = np.array(largest.GetSize())
    array_size = np.array(image.shape)[::-1]
    if not np.all(np.array(largest.GetIndex()) == 0):
        raise AssertionError("ITK-MONAI bridge: non-zero ITK region indices encountered")
    if not np.array_equal(array_size, largest_size):
        raise AssertionError("ITK-MONAI bridge: ITK regions should be of the same shape")


def _compute_offset_matrix(image, center_of_rotation):
    ndim = image.ndim
    offset = np.asarray(get_itk_image_center(image)) - np.asarray(center_of_rotation)
    m = np.eye(ndim + 1, dtype=np.float64)
    m[:ndim, ndim] = offset
    inv = np.eye(ndim + 1, dtype=np.float64)
    inv[:ndim, ndim] = -offset
    return m, inv


def _compute_spacing_matrix(image):
    ndim = image.ndim
    spacing = np.asarray(image.GetSpacing(), dtype=np.float64)
    m = np.eye(ndim + 1, dtype=np.float64)
    inv = np.eye(ndim + 1, dtype=np.float64)
    for i, e in enumerate(spacing):
        m[i, i] = e
        inv[i, i] = 1.0 / e
    return m, inv


def _compute_direction_matrix(image):
    ndim = image.ndim
    direction = _direction_array(image)
    m = np.eye(ndim + 1, dtype=np.float64)
    m[:ndim, :ndim] = direction
    inv = np.eye(ndim + 1, dtype=np.float64)
    inv[:ndim, :ndim] = np.linalg.inv(direction)
    return m, inv


def _compute_reference_space_affine_matrix(image, ref_image) -> np.ndarray:
    ndim = ref_image.ndim
    spacing_matrix, inv_spacing_matrix = (m[:ndim, :ndim] for m in _compute_spacing_matrix(image))
    ref_spacing_matrix, _ = (m[:ndim, :ndim] for m in _compute_spacing_matrix(ref_image))
    direction_matrix, inv_direction_matrix = (m[:ndim, :ndim] for m in _compute_direction_matrix(image))
    ref_direction_matrix, _ = (m[:ndim, :ndim] for m in _compute_direction_matrix(ref_image))
    matrix = ref_direction_matrix @ ref_spacing_matrix @ inv_spacing_matrix @ inv_direction_matrix
    pixel_offset = -1
    image_size = np.asarray(ref_image.GetLargestPossibleRegion().GetSize(), np.float32)
    translation = ((ref_direction_matrix @ ref_spacing_matrix
                    - direction_matrix @ spacing_matrix) @ (image_size + pixel_offset) / 2)
    translation += np.asarray(ref_image.GetOrigin()) - np.asarray(image.GetOrigin())
    return itk_to_monai_affine(image, matrix=matrix, translation=translation)


def itk_to_monai_affine(image, matrix, translation, center_of_rotation=None,
                        reference_image=None) -> np.ndarray:
    """ITK affine (matrix + translation) -> MONAI-convention (ndim+1)² affine
    (reference: itk_torch_bridge.py:106)."""
    _assert_itk_regions_match_array(image)
    ndim = image.ndim
    if reference_image is not None:
        reference_affine_matrix = _compute_reference_space_affine_matrix(image, reference_image)
    else:
        reference_affine_matrix = np.eye(ndim + 1, dtype=np.float64)

    affine_matrix = np.eye(ndim + 1, dtype=np.float64)
    affine_matrix[:ndim, :ndim] = np.asarray(matrix, dtype=np.float64)
    affine_matrix[:ndim, ndim] = np.asarray(translation, dtype=np.float64)

    if center_of_rotation is not None:
        offset_matrix, inverse_offset_matrix = _compute_offset_matrix(image, center_of_rotation)
        affine_matrix = inverse_offset_matrix @ affine_matrix @ offset_matrix

    direction_matrix, inverse_direction_matrix = _compute_direction_matrix(image)
    affine_matrix = inverse_direction_matrix @ affine_matrix @ direction_matrix

    spacing_matrix, inverse_spacing_matrix = _compute_spacing_matrix(image)
    affine_matrix = inverse_spacing_matrix @ affine_matrix @ spacing_matrix

    return affine_matrix @ reference_affine_matrix


def monai_to_itk_affine(image, affine_matrix, center_of_rotation=None):
    """MONAI-convention affine -> ITK (matrix, translation) pair (reference:
    itk_torch_bridge.py:160). Exact inverse of ``itk_to_monai_affine``."""
    _assert_itk_regions_match_array(image)
    affine_matrix = np.asarray(affine_matrix, dtype=np.float64)
    spacing_matrix, inverse_spacing_matrix = _compute_spacing_matrix(image)
    affine_matrix = spacing_matrix @ affine_matrix @ inverse_spacing_matrix
    direction_matrix, inverse_direction_matrix = _compute_direction_matrix(image)
    affine_matrix = direction_matrix @ affine_matrix @ inverse_direction_matrix
    if center_of_rotation is not None:
        offset_matrix, inverse_offset_matrix = _compute_offset_matrix(image, center_of_rotation)
        affine_matrix = offset_matrix @ affine_matrix @ inverse_offset_matrix
    ndim = image.ndim
    matrix = affine_matrix[:ndim, :ndim]
    translation = affine_matrix[:ndim, ndim].tolist()
    return matrix, translation


def itk_image_to_metatensor(image, channel_dim=None, dtype=float):
    """ITK image -> channel-first MetaImage (reference: itk_torch_bridge.py:43)."""
    from ..transforms.utility_array import EnsureChannelFirst
    from .image_reader import ITKReader

    reader = ITKReader(affine_lps_to_ras=False, channel_dim=channel_dim)
    image_array, meta_data = reader.get_data(image)
    from .meta_image import MetaImage

    mi = MetaImage(np.asarray(image_array, dtype=dtype),
                   affine=meta_data.get("affine"), meta=dict(meta_data))
    return EnsureChannelFirst(channel_dim=channel_dim)(mi)


def metatensor_to_itk_image(meta_tensor, channel_dim: int | None = 0,
                            dtype=np.float32, **kwargs):
    """Channel-first MetaImage -> ITK image (reference: itk_torch_bridge.py:69).
    Requires the optional ``itk`` package."""
    if not has_itk:
        raise ImportError("metatensor_to_itk_image requires the optional 'itk' package.")
    from ..data.affine_utils import orientation_ras_lps
    from ..utils.enums import MetaKeys, SpaceKeys

    affine = np.asarray(meta_tensor.affine, dtype=np.float64)
    if meta_tensor.meta.get(MetaKeys.SPACE, SpaceKeys.LPS) == SpaceKeys.RAS:
        affine = orientation_ras_lps(affine)
    arr = np.asarray(meta_tensor.data, dtype=dtype)
    if channel_dim is not None:
        arr = np.moveaxis(arr, channel_dim, -1)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
            channel_dim = None
    ndim = arr.ndim if channel_dim is None else arr.ndim - 1
    itk_image = itk.GetImageFromArray(np.ascontiguousarray(arr.T if channel_dim is None else arr),
                                      is_vector=channel_dim is not None, **kwargs)
    d = affine[:ndim, :ndim].copy()
    spacing = np.linalg.norm(d, axis=0)
    d /= spacing
    itk_image.SetSpacing([float(s) for s in spacing])
    itk_image.SetOrigin([float(o) for o in affine[:ndim, ndim]])
    itk_image.SetDirection(itk.matrix_from_array(d))
    return itk_image


def monai_to_itk_ddf(image, ddf):
    """MONAI dense displacement field -> ITK displacement-field image (reference:
    itk_torch_bridge.py:300). Requires the optional ``itk`` package."""
    if not has_itk:
        raise ImportError("monai_to_itk_ddf requires the optional 'itk' package.")
    ndim = image.ndim
    ddf = np.asarray(ddf).transpose(tuple(list(range(1, ndim + 1)) + [0]))
    ddf = ddf[..., ::-1]
    spacing = np.asarray(image.GetSpacing(), dtype=np.float64)
    ddf = ddf * np.array(spacing, ndmin=ndim + 1)
    direction = _direction_array(image)
    ddf = np.einsum("ij,...j->...i", direction, ddf).astype(np.float32)
    vector_pixel_type = itk.Vector[itk.F, ndim]
    displacement_field_type = itk.Image[vector_pixel_type, ndim]
    displacement_field = itk.GetImageFromArray(ddf, ttype=displacement_field_type)
    displacement_field.SetSpacing(image.GetSpacing())
    displacement_field.SetOrigin(image.GetOrigin())
    displacement_field.SetDirection(image.GetDirection())
    return displacement_field
