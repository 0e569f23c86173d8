"""Distributed helpers over jax collectives.

The reference uses torch.distributed all-gathers with pad-to-max semantics
(monai/utils/dist.py:59 evenly_divisible_all_gather, :143 string_list_all_gather,
:174 RankFilter).  Here the process-level analogs use ``jax.process_index`` and
``jax.experimental.multihost_utils``; the in-jit analogs are ``jax.lax`` collectives.
"""
from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def get_device_count() -> int:
    return jax.device_count()


def evenly_divisible_all_gather(data: Any, concat: bool = True):
    """All-gather host-local arrays of varying leading length across processes.

    Parity with monai/utils/dist.py:59: pad each rank's batch dim to the max length,
    all-gather, then strip padding.  Single-process: identity.
    """
    data = np.asarray(data)
    if jax.process_count() == 1:
        return data if concat else [data]
    from jax.experimental import multihost_utils

    length = np.asarray([data.shape[0]], dtype=np.int64)
    all_lens = multihost_utils.process_allgather(length).reshape(-1)
    max_len = int(all_lens.max())
    if data.shape[0] < max_len:
        pad = np.zeros((max_len - data.shape[0],) + data.shape[1:], dtype=data.dtype)
        data = np.concatenate([data, pad], axis=0)
    gathered = multihost_utils.process_allgather(data)  # (procs, max_len, ...)
    outs = [gathered[i, : int(all_lens[i])] for i in range(gathered.shape[0])]
    return np.concatenate(outs, axis=0) if concat else outs


def string_list_all_gather(strings: list[str], delimiter: str = "\t") -> list[str]:
    """All-gather a list of strings across processes (reference: monai/utils/dist.py:143)."""
    world_size = jax.process_count()
    if world_size <= 1:
        return strings
    joined = delimiter.join(strings)
    data = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    gathered = evenly_divisible_all_gather(data, concat=False)
    return [bytes(g.tobytes()).decode("utf-8") for g in gathered for _ in [0]][:0] + [
        s for g in gathered for s in bytes(g.tobytes()).decode("utf-8").split(delimiter)
    ]


class RankFilter(logging.Filter):
    """Log filter that only emits on a chosen rank (reference: monai/utils/dist.py:174)."""

    def __init__(self, rank: int | None = None, filter_fn=lambda rank: rank == 0):
        super().__init__()
        self.filter_fn = filter_fn
        self.rank = rank if rank is not None else get_rank()

    def filter(self, *_args):
        return self.filter_fn(self.rank)


def initialize_distributed(**kwargs) -> None:
    """Initialize multi-process jax (ICI/DCN).  No-op when single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass


def get_dist_device():
    """Expected target device for collective payloads. The reference returns the
    NCCL GPU / Gloo CPU device; here collectives run through jax, so this returns
    the first local jax device when initialized, else None (reference:
    dist.py get_dist_device)."""
    try:
        import jax

        return jax.local_devices()[0]
    except Exception:
        return None
