"""Prompt sampling for promptable segmentation training
(reference: monai/apps/vista3d/sampler.py:41 sample_prompt_pairs)."""
from __future__ import annotations

from typing import Any

import numpy as np

from ...utils.backend import to_numpy

__all__ = ["sample_prompt_pairs"]


def sample_prompt_pairs(labels: Any, label_set: list[int], max_prompt: int | None = None,
                        max_foreprompt: int | None = None, max_backprompt: int = 1,
                        max_point: int = 20, include_background: bool = False,
                        drop_label_prob: float = 0.2, drop_point_prob: float = 0.2,
                        point_sampler=None, rand_state: np.random.RandomState | None = None,
                        **kwargs):
    """Sample (label_prompts, point_coords, point_labels, prompt_class) from a label map
    (reference: sampler.py:41)."""
    rs = rand_state or np.random.RandomState()
    lab = to_numpy(labels)
    if lab.ndim == 5:
        lab = lab[0, 0]
    elif lab.ndim == 4:
        lab = lab[0]
    present = [int(v) for v in np.unique(lab) if int(v) in label_set and (include_background or v != 0)]
    background = [v for v in label_set if v not in present and v != 0]
    if max_backprompt is not None and len(background) > max_backprompt:
        background = list(rs.choice(background, max_backprompt, replace=False))
    if max_foreprompt is not None and len(present) > max_foreprompt:
        present = list(rs.choice(present, max_foreprompt, replace=False))
    all_prompts = present + background
    if max_prompt is not None and len(all_prompts) > max_prompt:
        all_prompts = list(rs.choice(all_prompts, max_prompt, replace=False))

    point_coords, point_labels = [], []
    n_points = min(max_point, 3)
    for cls in all_prompts:
        mask = lab == cls
        coords_cls, labels_cls = [], []
        idx = np.argwhere(mask)
        for _ in range(n_points):
            if len(idx) > 0:
                p = idx[rs.randint(len(idx))]
                coords_cls.append(p.tolist())
                labels_cls.append(1)
            else:
                coords_cls.append([0, 0, 0])
                labels_cls.append(-1)  # padding/no point
        point_coords.append(coords_cls)
        point_labels.append(labels_cls)

    label_prompt = np.asarray(all_prompts, dtype=np.int64).reshape(-1, 1)
    point_coords = np.asarray(point_coords, dtype=np.float32)
    point_labels = np.asarray(point_labels, dtype=np.int64)
    prompt_class = label_prompt.copy()
    if rs.rand() < drop_label_prob:
        label_prompt = None
    elif rs.rand() < drop_point_prob:
        point_coords = None
        point_labels = None
    return label_prompt, point_coords, point_labels, prompt_class
