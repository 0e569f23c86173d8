"""Learning-rate range test (reference: monai/optimizers/lr_finder.py:145)."""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

__all__ = ["LearningRateFinder"]


class LearningRateFinder:
    """LR range test: sweep LR exponentially/linearly while recording loss.

    Functional redesign: the caller provides ``train_step_fn(lr, batch) -> loss`` (a
    jitted step parameterized by LR) and an iterable of batches.
    """

    def __init__(self, train_step_fn: Callable[[float, Any], float] | None = None,
                 memory_cache: bool = True, cache_dir: str | None = None, verbose: bool = True):
        self.train_step_fn = train_step_fn
        self.history: dict[str, list] = {"lr": [], "loss": []}
        self.verbose = verbose

    def range_test(self, data_iter, start_lr: float = 1e-7, end_lr: float = 10.0, num_iter: int = 100,
                   step_mode: str = "exp", smooth_f: float = 0.05, diverge_th: float = 5.0) -> None:
        if num_iter <= 1:
            raise ValueError(f"num_iter {num_iter} must be larger than 1")
        if step_mode.lower() == "exp":
            lrs = np.exp(np.linspace(np.log(start_lr), np.log(end_lr), num_iter))
        elif step_mode.lower() == "linear":
            lrs = np.linspace(start_lr, end_lr, num_iter)
        else:
            raise ValueError(f"expected one of (exp, linear), got {step_mode}")
        self.history = {"lr": [], "loss": []}
        best_loss = None
        it = iter(data_iter)
        for i, lr in enumerate(lrs):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(data_iter)
                batch = next(it)
            loss = float(self.train_step_fn(float(lr), batch))
            if i > 0 and smooth_f > 0:
                loss = smooth_f * loss + (1 - smooth_f) * self.history["loss"][-1]
            self.history["lr"].append(float(lr))
            self.history["loss"].append(loss)
            if best_loss is None or loss < best_loss:
                best_loss = loss
            if loss > diverge_th * best_loss:
                if self.verbose:
                    print("Stopping early, the loss has diverged")
                break

    def get_lrs_and_losses(self, skip_start: int = 0, skip_end: int = 0):
        lrs = self.history["lr"][skip_start: len(self.history["lr"]) - skip_end or None]
        losses = self.history["loss"][skip_start: len(self.history["loss"]) - skip_end or None]
        return lrs, losses

    def get_steepest_gradient(self, skip_start: int = 0, skip_end: int = 0):
        lrs, losses = self.get_lrs_and_losses(skip_start, skip_end)
        try:
            idx = int(np.gradient(np.asarray(losses)).argmin())
            return lrs[idx], losses[idx]
        except ValueError:
            print("Failed to compute the gradients, there might not be enough points.")
            return None, None


class DataLoaderIter:
    """Wraps a DataLoader with image/label extractor callables; iterating yields
    (image, label) pairs (reference: optimizers/lr_finder.py:45)."""

    def __init__(self, data_loader, image_extractor, label_extractor):
        self.data_loader = data_loader
        self._iterator = iter(data_loader)
        self.image_extractor = image_extractor
        self.label_extractor = label_extractor

    @property
    def dataset(self):
        return getattr(self.data_loader, "dataset", None)

    def inputs_labels_from_batch(self, batch_data):
        return self.image_extractor(batch_data), self.label_extractor(batch_data)

    def __iter__(self):
        return self

    def __next__(self):
        return self.inputs_labels_from_batch(next(self._iterator))


class TrainDataLoaderIter(DataLoaderIter):
    """Training iterator: optionally resets and re-iterates when exhausted
    (reference: optimizers/lr_finder.py:73)."""

    def __init__(self, data_loader, image_extractor, label_extractor,
                 auto_reset: bool = True):
        super().__init__(data_loader, image_extractor, label_extractor)
        self.run_limit = len(data_loader) if hasattr(data_loader, "__len__") else None
        self.auto_reset = auto_reset

    def __next__(self):
        try:
            return self.inputs_labels_from_batch(next(self._iterator))
        except StopIteration:
            if not self.auto_reset:
                raise
            self._iterator = iter(self.data_loader)
            return self.inputs_labels_from_batch(next(self._iterator))


class ValDataLoaderIter(DataLoaderIter):
    """Validation iterator: must be re-entered via iter() after exhaustion; tracks
    consumed batches (reference: optimizers/lr_finder.py:95)."""

    def __init__(self, data_loader, image_extractor, label_extractor):
        super().__init__(data_loader, image_extractor, label_extractor)
        self.run_limit = len(data_loader) if hasattr(data_loader, "__len__") else None
        self.run_counter = 0

    def __iter__(self):
        if self.run_limit is not None and self.run_counter >= self.run_limit:
            self._iterator = iter(self.data_loader)
            self.run_counter = 0
        return self

    def __next__(self):
        self.run_counter += 1
        return super().__next__()


__all__ += ["DataLoaderIter", "TrainDataLoaderIter", "ValDataLoaderIter"]


def default_image_extractor(x):
    """Default callable for getting image from batch data (reference:
    lr_finder.py default_image_extractor)."""
    return x["image"] if isinstance(x, dict) else x[0]


def default_label_extractor(x):
    """Default callable for getting label from batch data (reference:
    lr_finder.py default_label_extractor)."""
    return x["label"] if isinstance(x, dict) else x[1]
