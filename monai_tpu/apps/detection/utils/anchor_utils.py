"""Anchor generation (reference: monai/apps/detection/utils/anchor_utils.py
AnchorGenerator / AnchorGeneratorWithAnchorShape)."""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

__all__ = ["AnchorGenerator", "AnchorGeneratorWithAnchorShape"]


class AnchorGenerator:
    """Generate per-level anchor boxes in standard corner mode
    (reference: anchor_utils.py AnchorGenerator)."""

    def __init__(self, sizes: Sequence = ((20, 30, 40),), aspect_ratios: Sequence = (((0.5, 1), (1, 0.5)),),
                 indexing: str = "ij"):
        self.sizes = sizes
        self.aspect_ratios = aspect_ratios
        self.spatial_dims = None
        # infer dims from aspect ratio spec: 2D ratios are scalars, 3D ratios are pairs
        first = aspect_ratios[0][0]
        self.spatial_dims = 3 if isinstance(first, (tuple, list)) else 2
        self.cell_anchors = [self._generate_anchors(size, ar)
                             for size, ar in zip(sizes, aspect_ratios)]

    def _generate_anchors(self, scales, aspect_ratios) -> np.ndarray:
        """Zero-centered anchors (N, 2*D)."""
        anchors = []
        for s in scales:
            for ar in aspect_ratios:
                if self.spatial_dims == 2:
                    h = s * np.sqrt(ar)
                    w = s / np.sqrt(ar)
                    anchors.append([-h / 2, -w / 2, h / 2, w / 2])
                else:
                    ar0, ar1 = ar
                    d0 = s / ((ar0 * ar1) ** (1.0 / 3.0))
                    d1 = d0 * ar0
                    d2 = d0 * ar1
                    anchors.append([-d0 / 2, -d1 / 2, -d2 / 2, d0 / 2, d1 / 2, d2 / 2])
        return np.asarray(anchors, dtype=np.float32)

    def num_anchors_per_location(self) -> list[int]:
        return [len(c) for c in self.cell_anchors]

    def grid_anchors(self, grid_sizes: Sequence[Sequence[int]], strides: Sequence[Sequence[int]]) -> list:
        """All anchors per feature level (reference: anchor_utils.py grid_anchors)."""
        anchors = []
        for size, stride, base in zip(grid_sizes, strides, self.cell_anchors):
            coords = [np.arange(s) * st + st // 2 for s, st in zip(size, stride)]
            mesh = np.stack(np.meshgrid(*coords, indexing="ij"), axis=-1).reshape(-1, len(size))
            centers = np.concatenate([mesh, mesh], axis=-1).astype(np.float32)  # (G, 2D)
            lvl = (centers[:, None] + base[None]).reshape(-1, 2 * len(size))
            anchors.append(lvl)
        return anchors

    def __call__(self, images: np.ndarray, feature_maps: Sequence[np.ndarray]) -> list[np.ndarray]:
        """Per-image anchors concatenated over levels (reference: anchor_utils.py forward)."""
        image_size = images.shape[2:]
        grid_sizes = [fm.shape[2:] for fm in feature_maps]
        strides = [[int(i / g) for i, g in zip(image_size, gs)] for gs in grid_sizes]
        anchors_per_level = self.grid_anchors(grid_sizes, strides)
        anchors = np.concatenate(anchors_per_level, axis=0)
        return [anchors.copy() for _ in range(images.shape[0])]


class AnchorGeneratorWithAnchorShape(AnchorGenerator):
    """Anchors from explicit base shapes (reference: anchor_utils.py
    AnchorGeneratorWithAnchorShape)."""

    def __init__(self, feature_map_scales: Sequence[float] = (1, 2, 4, 8),
                 base_anchor_shapes: Sequence[Sequence[float]] = ((32, 32, 32),),
                 indexing: str = "ij"):
        base = np.asarray(base_anchor_shapes, dtype=np.float32)
        self.spatial_dims = base.shape[1]
        self.cell_anchors = []
        for scale in feature_map_scales:
            shapes = base * scale
            half = shapes / 2
            self.cell_anchors.append(np.concatenate([-half, half], axis=1))
        self.sizes = feature_map_scales
