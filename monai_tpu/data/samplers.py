"""Distributed samplers (reference: monai/data/samplers.py:23,64).

On TPU pods, data-parallel input sharding = per-host partition of the index list by
``jax.process_index()``; these samplers reproduce the reference's pad-or-not semantics.
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

__all__ = ["DistributedSampler", "DistributedWeightedRandomSampler"]


class DistributedSampler:
    """Even-divisibility-aware distributed sampler (reference: samplers.py:23)."""

    def __init__(self, dataset, even_divisible: bool = True, num_replicas: int | None = None,
                 rank: int | None = None, shuffle: bool = True, seed: int = 0, drop_last: bool = False):
        import jax

        self.dataset = dataset
        self.num_replicas = num_replicas if num_replicas is not None else jax.process_count()
        self.rank = rank if rank is not None else jax.process_index()
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.even_divisible = even_divisible
        self.drop_last = drop_last
        n = len(dataset)
        if n == 0:
            raise ValueError("the dataset length is 0.")
        if self.even_divisible:
            self.num_samples = int(np.ceil(n / self.num_replicas))
            self.total_size = self.num_samples * self.num_replicas
        elif drop_last:
            self.num_samples = n // self.num_replicas
            self.total_size = self.num_samples * self.num_replicas
        else:
            self.total_size = n
            self.num_samples = len(range(self.rank, n, self.num_replicas))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self):
        n = len(self.dataset)
        indices = list(range(n))
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            rs.shuffle(indices)
        if self.even_divisible and len(indices) < self.total_size:
            indices += indices[: self.total_size - len(indices)]
        elif self.drop_last:
            indices = indices[: self.total_size]
        return iter(indices[self.rank: self.total_size: self.num_replicas])


class DistributedWeightedRandomSampler(DistributedSampler):
    """Weighted sampling within each rank's partition (reference: samplers.py:64)."""

    def __init__(self, dataset, weights: Sequence[float], num_samples_per_rank: int | None = None,
                 generator=None, even_divisible: bool = True, num_replicas: int | None = None,
                 rank: int | None = None, seed: int = 0, **kwargs):
        super().__init__(dataset=dataset, even_divisible=even_divisible, num_replicas=num_replicas,
                         rank=rank, shuffle=True, seed=seed, **kwargs)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.num_samples_per_rank = num_samples_per_rank if num_samples_per_rank is not None else self.num_samples

    def __iter__(self):
        indices = list(super().__iter__())
        weights = self.weights[indices]
        p = weights / weights.sum()
        rs = np.random.RandomState(self.seed + self.epoch)
        rand_indices = rs.choice(len(indices), size=self.num_samples_per_rank, replace=True, p=p)
        for i in rand_indices:
            yield indices[int(i)]
