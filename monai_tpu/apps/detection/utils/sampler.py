"""Hard-negative sampling (reference: monai/apps/detection/utils/hard_negative_sampler.py)."""
from __future__ import annotations

import numpy as np

__all__ = ["HardNegativeSampler"]


class HardNegativeSampler:
    """Pick positives + hardest negatives for classification loss balance
    (reference: hard_negative_sampler.py HardNegativeSampler)."""

    def __init__(self, batch_size_per_image: int = 64, positive_fraction: float = 0.5,
                 min_neg: int = 1, pool_size: float = 10):
        self.batch_size_per_image = batch_size_per_image
        self.positive_fraction = positive_fraction
        self.min_neg = min_neg
        self.pool_size = pool_size

    def __call__(self, target_labels: list[np.ndarray], concat_fg_probs: np.ndarray):
        """Returns (pos_masks, neg_masks) per image."""
        samples_per_img = [len(t) for t in target_labels]
        fg_probs = np.split(concat_fg_probs, np.cumsum(samples_per_img)[:-1])
        pos_masks, neg_masks = [], []
        for labels, probs in zip(target_labels, fg_probs):
            positive = np.where(labels >= 1)[0]
            negative = np.where(labels == 0)[0]
            num_pos = int(self.batch_size_per_image * self.positive_fraction)
            num_pos = min(positive.size, num_pos)
            num_neg = int(max(1, num_pos) * (1 - self.positive_fraction) / max(self.positive_fraction, 1e-3))
            num_neg = max(int(num_neg), self.min_neg)
            num_neg = min(negative.size, num_neg)
            # hard negatives: largest fg prob among negatives, sampled from a pool
            pool = int(num_neg * self.pool_size)
            pool = min(negative.size, pool)
            if negative.size > 0:
                hard_idx = negative[np.argsort(-probs[negative])[:pool]]
                sel_neg = np.random.permutation(hard_idx)[:num_neg]
            else:
                sel_neg = negative
            sel_pos = np.random.permutation(positive)[:num_pos]
            pos_mask = np.zeros(len(labels), dtype=bool)
            neg_mask = np.zeros(len(labels), dtype=bool)
            pos_mask[sel_pos] = True
            neg_mask[sel_neg] = True
            pos_masks.append(pos_mask)
            neg_masks.append(neg_mask)
        return pos_masks, neg_masks


class HardNegativeSamplerBase:
    """Base protocol for hard-negative samplers: subclasses implement
    ``select_samples_img`` / ``__call__`` (reference: hard_negative_sampler.py:24
    HardNegativeSamplerBase)."""

    def __init__(self, pool_size: float = 10):
        self.pool_size = pool_size

    def select_negatives(self, negative: np.ndarray, num_neg: int, fg_probs: np.ndarray):
        """Hardest-negative selection from a randomized pool of the highest-scoring
        negatives."""
        pool = min(negative.size, int(num_neg * self.pool_size))
        if negative.size == 0:
            return negative
        hard_idx = negative[np.argsort(-fg_probs[negative])[:pool]]
        return np.random.permutation(hard_idx)[:num_neg]


__all__ += ["HardNegativeSamplerBase"]
