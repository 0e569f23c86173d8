"""1-D sequence orderings of 2D/3D latent grids (reference: monai/utils/ordering.py:19
Ordering) — used by the VQVAE + transformer generative pipeline."""
from __future__ import annotations

import numpy as np

from .enums import OrderingTransformations, OrderingType

__all__ = ["Ordering"]


class Ordering:
    """Project a 2D/3D latent grid into a 1D token sequence with optional
    transpose/rot90/reflect preprocessing (reference: ordering.py:19)."""

    def __init__(self, ordering_type: str, spatial_dims: int, dimensions,
                 reflected_spatial_dims=None, transpositions_axes=None, rot90_axes=None,
                 transformation_order=(OrderingTransformations.TRANSPOSE.value,
                                       OrderingTransformations.ROTATE_90.value,
                                       OrderingTransformations.REFLECT.value)):
        if ordering_type not in list(OrderingType):
            raise ValueError(f"ordering_type must be one of {list(OrderingType)}, "
                             f"got {ordering_type}.")
        if len(dimensions) != spatial_dims + 1:
            raise ValueError(f"dimensions must be of length {spatial_dims + 1}.")
        if len(set(transformation_order)) != len(transformation_order):
            raise ValueError(f"No duplicate transformations: {transformation_order}.")
        for t in transformation_order:
            if t not in list(OrderingTransformations):
                raise ValueError(f"invalid transformation {t}.")
        self.ordering_type = ordering_type
        self.spatial_dims = spatial_dims
        self.dimensions = tuple(dimensions)
        self.reflected_spatial_dims = reflected_spatial_dims
        self.transpositions_axes = transpositions_axes
        self.rot90_axes = rot90_axes
        self.transformation_order = transformation_order

        template = np.arange(int(np.prod(self.dimensions[1:]))).reshape(*self.dimensions[1:])
        for t in transformation_order:
            if t == OrderingTransformations.TRANSPOSE.value and transpositions_axes:
                for axes in transpositions_axes:
                    template = np.transpose(template, axes=axes)
            elif t == OrderingTransformations.ROTATE_90.value and rot90_axes:
                for axes in rot90_axes:
                    template = np.rot90(template, axes=axes)
            elif t == OrderingTransformations.REFLECT.value and reflected_spatial_dims:
                for axis, do in enumerate(reflected_spatial_dims):
                    if do:
                        template = np.flip(template, axis=axis)
        seq = self._index_sequence(template.shape)
        self._sequence_ordering = np.array([template[tuple(e)] for e in seq])
        self._revert_sequence_ordering = np.argsort(self._sequence_ordering)

    def _index_sequence(self, shape) -> np.ndarray:
        if self.ordering_type == OrderingType.RASTER_SCAN:
            return np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"),
                            axis=-1).reshape(-1, len(shape))
        if self.ordering_type == OrderingType.S_CURVE:
            idx = []
            rows = shape[0]
            cols = shape[1]
            depths = shape[2] if len(shape) == 3 else None
            for r in range(rows):
                col_iter = range(cols) if r % 2 == 0 else range(cols - 1, -1, -1)
                for ci, c in enumerate(col_iter):
                    if depths is not None:
                        fwd = (r * cols + ci) % 2 == 0
                        d_iter = range(depths) if fwd else range(depths - 1, -1, -1)
                        idx.extend((r, c, d) for d in d_iter)
                    else:
                        idx.append((r, c))
            return np.array(idx)
        # random
        flat = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"),
                        axis=-1).reshape(-1, len(shape))
        np.random.shuffle(flat)
        return flat

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return x[self._sequence_ordering]

    def get_sequence_ordering(self) -> np.ndarray:
        return self._sequence_ordering

    def get_revert_sequence_ordering(self) -> np.ndarray:
        return self._revert_sequence_ordering
