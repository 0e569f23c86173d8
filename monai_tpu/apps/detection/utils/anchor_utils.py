"""Anchor generation (reference: monai/apps/detection/utils/anchor_utils.py
AnchorGenerator / AnchorGeneratorWithAnchorShape).

Host-side numpy: anchor grids are static per (image_size, feature_map sizes) and
feed jitted detection heads as constants, so there is nothing to trace.
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

__all__ = ["AnchorGenerator", "AnchorGeneratorWithAnchorShape"]


def _is_seq(x) -> bool:
    return isinstance(x, (tuple, list, np.ndarray))


class AnchorGenerator:
    """Generate per-level anchor boxes in standard corner mode
    (reference: anchor_utils.py:111 AnchorGenerator).

    2D anchors are ``[-w, -h, w, h]/2`` with ``w = s/sqrt(ar)``, ``h = s*sqrt(ar)``;
    3D anchors use ``w:h:d = 1:ar0:ar1`` normalised to volume ``s**3``. Cell anchors
    are rounded to integers like the reference (anchor_utils.py:207 ``.round()``).
    """

    def __init__(self, sizes: Sequence = ((20, 30, 40),), aspect_ratios: Sequence = (((0.5, 1), (1, 0.5)),),
                 indexing: str = "ij"):
        if not _is_seq(sizes[0]):
            self.sizes = tuple((s,) for s in sizes)
        else:
            self.sizes = tuple(tuple(s) for s in sizes)
        if not _is_seq(aspect_ratios[0]):
            aspect_ratios = (tuple(aspect_ratios),) * len(self.sizes)
        if len(self.sizes) != len(aspect_ratios):
            raise ValueError("len(sizes) and len(aspect_ratios) should be equal")
        # infer dims from the aspect-ratio spec: 2D ratios are scalars, 3D ratios are pairs
        self.spatial_dims = len(np.atleast_1d(aspect_ratios[0][0])) + 1
        if self.spatial_dims not in (2, 3):
            raise ValueError(f"unsupported spatial_dims {self.spatial_dims}")
        if indexing not in ("ij", "xy"):
            raise ValueError(f"indexing must be 'ij' or 'xy', got {indexing}")
        self.indexing = indexing
        self.aspect_ratios = aspect_ratios
        self.cell_anchors = [self.generate_anchors(size, ar)
                             for size, ar in zip(self.sizes, aspect_ratios)]

    def generate_anchors(self, scales: Sequence, aspect_ratios: Sequence) -> np.ndarray:
        """Zero-centered cell anchors sized (M*N, 2*D), ratio-major ordering."""
        scales_a = np.asarray(scales, dtype=np.float32)  # (N,)
        ratios_a = np.asarray(aspect_ratios, dtype=np.float32)  # (M,) or (M, 2)
        if self.spatial_dims == 2:
            area_scale = np.sqrt(ratios_a)
            w_ratios = 1.0 / area_scale
            h_ratios = area_scale
            d_ratios = None
        else:
            if ratios_a.ndim != 2 or ratios_a.shape[1] != 2:
                raise ValueError(f"3-D aspect_ratios must be (M, 2), got {ratios_a.shape}")
            area_scale = np.power(ratios_a[:, 0] * ratios_a[:, 1], 1.0 / 3.0)
            w_ratios = 1.0 / area_scale
            h_ratios = ratios_a[:, 0] / area_scale
            d_ratios = ratios_a[:, 1] / area_scale
        ws = (w_ratios[:, None] * scales_a[None, :]).reshape(-1)
        hs = (h_ratios[:, None] * scales_a[None, :]).reshape(-1)
        if self.spatial_dims == 2:
            base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
        else:
            ds = (d_ratios[:, None] * scales_a[None, :]).reshape(-1)
            base = np.stack([-ws, -hs, -ds, ws, hs, ds], axis=1) / 2.0
        return np.round(base).astype(np.float32)

    def num_anchors_per_location(self) -> list[int]:
        return [len(c) for c in self.cell_anchors]

    def grid_anchors(self, grid_sizes: Sequence[Sequence[int]], strides: Sequence[Sequence[int]]) -> list:
        """All anchors per feature level (reference: anchor_utils.py:220); centers at
        ``arange(size) * stride`` (top-left aligned, matching the reference)."""
        if not (len(grid_sizes) == len(strides) == len(self.cell_anchors)):
            raise ValueError("grid_sizes/strides must match the number of cell-anchor levels")
        anchors = []
        for size, stride, base in zip(grid_sizes, strides, self.cell_anchors):
            centers = [np.arange(int(s), dtype=np.int32) * int(st) for s, st in zip(size, stride)]
            mesh = [m.reshape(-1) for m in np.meshgrid(*centers, indexing="ij")]
            if self.indexing == "xy":
                mesh[0], mesh[1] = mesh[1], mesh[0]
            shifts = np.stack(mesh * 2, axis=1).astype(np.float32)  # (G, 2D)
            lvl = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 2 * self.spatial_dims)
            anchors.append(lvl)
        return anchors

    def _anchors_for_sizes(self, image_size, grid_sizes) -> np.ndarray:
        strides = [[int(image_size[a]) // int(g[a]) for a in range(self.spatial_dims)]
                   for g in grid_sizes]
        return np.concatenate(self.grid_anchors(grid_sizes, strides), axis=0)

    def __call__(self, images=None, feature_maps=None, *, image_size=None,
                 feature_map_sizes=None) -> list[np.ndarray]:
        """Per-image anchors concatenated over levels (reference: anchor_utils.py:284).

        Accepts either batched arrays (``images``, ``feature_maps``) like the reference
        forward, or explicit ``image_size``/``feature_map_sizes`` keywords (shape-only,
        convenient under jit where only static sizes are known).
        """
        batch = 1
        if images is not None:
            image_size = images.shape[-self.spatial_dims:]
            feature_map_sizes = [fm.shape[-self.spatial_dims:] for fm in feature_maps]
            batch = images.shape[0]
        anchors = self._anchors_for_sizes(image_size, feature_map_sizes)
        return [anchors] * batch


class AnchorGeneratorWithAnchorShape(AnchorGenerator):
    """Anchors from explicit base shapes, scaled per feature map
    (reference: anchor_utils.py:369 AnchorGeneratorWithAnchorShape)."""

    def __init__(self, feature_map_scales: Sequence[float] = (1, 2, 4, 8),
                 base_anchor_shapes: Sequence[Sequence[float]] = ((32, 32, 32), (48, 20, 20),
                                                                 (20, 48, 20), (20, 20, 48)),
                 indexing: str = "ij"):
        base = np.asarray(base_anchor_shapes, dtype=np.float32)
        self.spatial_dims = int(base.shape[1])
        if self.spatial_dims not in (2, 3):
            raise ValueError(f"unsupported spatial_dims {self.spatial_dims}")
        if indexing not in ("ij", "xy"):
            raise ValueError(f"indexing must be 'ij' or 'xy', got {indexing}")
        self.indexing = indexing
        self.sizes = tuple(feature_map_scales)
        self.cell_anchors = [self.generate_anchors_using_shape(s * base)
                             for s in feature_map_scales]

    @staticmethod
    def generate_anchors_using_shape(anchor_shapes: np.ndarray) -> np.ndarray:
        """[-w/2, -h/2, (-d/2,) w/2, h/2 (, d/2)], rounded (reference: anchor_utils.py:392)."""
        half = np.asarray(anchor_shapes, dtype=np.float32) / 2.0
        return np.round(np.concatenate([-half, half], axis=1)).astype(np.float32)
