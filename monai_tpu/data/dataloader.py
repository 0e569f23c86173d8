"""DataLoader: host-side batching with thread-pool prefetch.

TPU-first replacement for the reference's torch DataLoader wrapper
(monai/data/dataloader.py:26) + ThreadDataLoader (monai/data/thread_buffer.py:137).
Worker *processes* (torch's model) pay IPC serialization costs; on TPU hosts the
winning recipe per the reference's own fast-training guidance is cached datasets +
thread prefetch, so this loader uses a ThreadPoolExecutor pipeline feeding collated
numpy batches (ready for jax.device_put / sharding).
"""
from __future__ import annotations

import queue
import threading
from collections.abc import Callable, Iterator, Sequence
from typing import Any

import numpy as np

from ..utils.misc import first
from .utils import list_data_collate, pad_list_data_collate, set_rnd

__all__ = ["DataLoader", "ThreadDataLoader", "ThreadBuffer"]


class DataLoader:
    """Iterate a dataset in shuffled batches with optional thread prefetch.

    Matches the reference wrapper's defaults: ``list_data_collate`` (MetaImage-aware)
    and per-epoch reseeding of Randomizable transforms (dataloader.py:26-100).
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False, num_workers: int = 0,
                 collate_fn: Callable | None = None, drop_last: bool = False, seed: int | None = None,
                 prefetch: int = 2, sampler=None, **kwargs):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(int(num_workers), 0)
        self.collate_fn = collate_fn if collate_fn is not None else list_data_collate
        self.drop_last = drop_last
        self.prefetch = max(int(prefetch), 1)
        self.sampler = sampler
        # seed=None follows the ambient np.random stream so set_determinism
        # governs shuffle order and per-epoch transform reseeding (the reference's
        # torch DataLoader derives its generator from the global torch seed the
        # same way; with no set_determinism call this stays entropy-seeded)
        self._seed_state = np.random.RandomState(
            np.random.randint(0, 2**31 - 1) if seed is None else seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.sampler is not None:
            n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> list[list[int]]:
        if self.sampler is not None:
            indices = list(iter(self.sampler))
        else:
            indices = list(range(len(self.dataset)))
            if self.shuffle:
                rs = np.random.RandomState(self._seed_state.randint(0, 2**31 - 1) + self._epoch)
                rs.shuffle(indices)
        batches = [indices[i:i + self.batch_size] for i in range(0, len(indices), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]
        return batches

    def _fetch(self, idx_batch: list[int]):
        items = [self.dataset[i] for i in idx_batch]
        return self.collate_fn(items)

    def __iter__(self) -> Iterator:
        self._epoch += 1
        # reseed dataset transforms for reproducible-but-different epochs
        set_rnd(self.dataset, int(self._seed_state.randint(0, 2**31 - 1)))
        batches = self._batch_indices()
        if self.num_workers <= 0:
            for b in batches:
                yield self._fetch(b)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = []
            n_ahead = self.num_workers * self.prefetch
            it = iter(batches)
            for b in batches[:n_ahead]:
                futures.append(pool.submit(self._fetch, b))
            pending = batches[n_ahead:]
            i = 0
            while futures:
                fut = futures.pop(0)
                if pending:
                    futures.append(pool.submit(self._fetch, pending.pop(0)))
                yield fut.result()


class ThreadBuffer:
    """Iterate a source in a background thread, buffering results
    (reference: monai/data/thread_buffer.py:23)."""

    def __init__(self, src, buffer_size: int = 1, timeout: float = 0.01):
        self.src = src
        self.buffer_size = buffer_size
        self.timeout = timeout
        self.buffer: queue.Queue = queue.Queue(self.buffer_size)
        self.gen_thread: threading.Thread | None = None
        self.is_running = False

    def enqueue_values(self) -> None:
        for src_val in self.src:
            while self.is_running:
                try:
                    self.buffer.put(src_val, timeout=self.timeout)
                    break
                except queue.Full:
                    pass
            if not self.is_running:
                break

    def stop(self) -> None:
        self.is_running = False
        if self.gen_thread is not None:
            self.gen_thread.join()
        self.gen_thread = None

    def __iter__(self):
        self.is_running = True
        self.gen_thread = threading.Thread(target=self.enqueue_values, daemon=True)
        self.gen_thread.start()
        try:
            while self.is_running and (self.gen_thread.is_alive() or not self.buffer.empty()):
                try:
                    yield self.buffer.get(timeout=self.timeout)
                except queue.Empty:
                    pass
        finally:
            self.stop()


class ThreadDataLoader(DataLoader):
    """DataLoader decoupled from consumption via a background thread, optionally
    repeating each batch (reference: monai/data/thread_buffer.py:137).

    ``repeats > 1`` feeds the same batch multiple times — useful when host transforms
    are the bottleneck and batch-level randomization (e.g. RandCropByPosNegLabel
    samples) provides enough diversity.
    """

    def __init__(self, dataset, buffer_size: int = 1, buffer_timeout: float = 0.01, repeats: int = 1,
                 use_thread_workers: bool = True, **kwargs):
        super().__init__(dataset, **kwargs)
        self.buffer_size = buffer_size
        self.buffer_timeout = buffer_timeout
        self.repeats = repeats

    def __iter__(self):
        buffer = ThreadBuffer(src=super().__iter__(), buffer_size=self.buffer_size,
                              timeout=self.buffer_timeout)
        for batch in buffer:
            for _ in range(self.repeats):
                yield batch


def buffer_iterator(src, buffer_size: int = 1, timeout: float = 0.01, repeats: int = 1):
    """Wrap ``src`` in a ThreadBuffer and yield each item ``repeats`` times
    (reference: thread_buffer.py:83)."""
    buffer = ThreadBuffer(src=src, buffer_size=buffer_size, timeout=timeout)
    for batch in buffer:
        for _ in range(repeats):
            yield batch
