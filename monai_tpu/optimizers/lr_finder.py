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
