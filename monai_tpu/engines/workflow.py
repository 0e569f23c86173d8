"""Workflow engine base (reference: monai/engines/workflow.py:47 Workflow(ignite.Engine)).

TPU-first redesign: a functional epoch/iteration loop around a jit-compiled step
function (no ignite).  Event hooks, engine state, metric attachment, and
decollate+postprocessing wiring keep the reference's surface.
"""
from __future__ import annotations

import time
import warnings
from collections.abc import Callable, Iterable, Sequence
from typing import Any

import numpy as np

from ..data.utils import decollate_batch
from ..transforms.transform import apply_transform
from ..utils.enums import CommonKeys
from .events import EventEmitter, Events, IterationEvents

__all__ = ["State", "Workflow"]


class State:
    """Engine state (ignite.engine.State analog)."""

    def __init__(self, **kwargs):
        self.rank = 0
        self.iteration = 0
        self.epoch = 0
        self.max_epochs = 1
        self.epoch_length: int | None = None
        self.output: Any = None
        self.batch: Any = None
        self.metrics: dict = {}
        self.metric_details: dict = {}
        self.dataloader: Any = None
        self.device = None
        self.key_metric_name: str | None = None
        self.best_metric: float = -1
        self.best_metric_epoch: int = -1
        self.terminate = False
        for k, v in kwargs.items():
            setattr(self, k, v)


class Workflow(EventEmitter):
    """Epoch/iteration loop + events + metrics (reference: workflow.py:47-400)."""

    def __init__(self, device=None, max_epochs: int = 1, data_loader: Iterable | None = None,
                 epoch_length: int | None = None, non_blocking: bool = False,
                 prepare_batch: Callable | None = None, iteration_update: Callable | None = None,
                 postprocessing: Callable | None = None, key_metric: dict | None = None,
                 additional_metrics: dict | None = None, metric_cmp_fn: Callable = lambda cur, best: cur > best,
                 handlers: Sequence | None = None, amp: bool = False, event_names: list | None = None,
                 event_to_attr: dict | None = None, decollate: bool = True, to_kwargs: dict | None = None,
                 amp_kwargs: dict | None = None):
        super().__init__()
        self.state = State(max_epochs=max_epochs)
        self.data_loader = data_loader
        self.non_blocking = non_blocking
        self.prepare_batch = prepare_batch
        self.metric_cmp_fn = metric_cmp_fn
        self.amp = amp
        self.scaler = None
        self.device = device
        self.postprocessing = postprocessing
        self.decollate = decollate
        self._iteration_update = iteration_update

        if epoch_length is None and data_loader is not None:
            try:
                epoch_length = len(data_loader)
            except TypeError:
                epoch_length = None
        self.state.epoch_length = epoch_length

        try:
            import jax

            self.state.rank = jax.process_index()
        except Exception:
            self.state.rank = 0

        self.key_metric = key_metric
        self.additional_metrics = additional_metrics if additional_metrics else {}
        self.metrics: dict = {}
        if key_metric is not None:
            self.metrics.update(key_metric)
            self.state.key_metric_name = list(key_metric.keys())[0]
        self.metrics.update(self.additional_metrics)

        if postprocessing is not None:
            self._register_postprocessing(postprocessing)
        if self.metrics:
            self._register_metrics()
        if handlers is not None:
            self._register_handlers(handlers)

    # -- registration ---------------------------------------------------------
    def _register_postprocessing(self, posttrans: Callable):
        @self.on(Events.ITERATION_COMPLETED)
        def _run_postprocessing(engine) -> None:
            if not engine.decollate:
                engine.state.batch = apply_transform(posttrans, engine.state.batch, map_items=False)
                engine.state.output = apply_transform(posttrans, engine.state.output, map_items=False)
            else:
                pass  # decollate+post handled in _apply_post per-sample

    def _register_metrics(self):
        @self.on(Events.EPOCH_COMPLETED)
        def _aggregate_metrics(engine) -> None:
            for name, metric in engine.metrics.items():
                try:
                    value = metric.aggregate()
                    if isinstance(value, (tuple, list)):
                        value = value[0]
                    value = float(np.asarray(value).reshape(-1)[0]) if np.asarray(value).size else float("nan")
                    engine.state.metrics[name] = value
                    metric.reset()
                except Exception as e:
                    warnings.warn(f"metric {name} aggregation failed: {e}")
            key_name = engine.state.key_metric_name
            if key_name and key_name in engine.state.metrics:
                current = engine.state.metrics[key_name]
                if engine.state.best_metric_epoch == -1 or engine.metric_cmp_fn(current, engine.state.best_metric):
                    engine.state.best_metric = current
                    engine.state.best_metric_epoch = engine.state.epoch

    def _register_handlers(self, handlers: Sequence):
        for handler in handlers:
            if hasattr(handler, "attach"):
                handler.attach(self)
            elif callable(handler):
                self.add_event_handler(Events.ITERATION_COMPLETED, handler)

    # -- iteration ------------------------------------------------------------
    def _iteration(self, engine, batchdata) -> dict:
        raise NotImplementedError(f"Subclass {self.__class__.__name__} must implement this method.")

    def _apply_post_and_metrics(self, engine):
        """Decollate batch output, run per-sample postprocessing, feed metrics
        (reference: workflow.py decollate wiring)."""
        out = engine.state.output
        if out is None or not isinstance(out, dict):
            return
        if self.decollate:
            samples = decollate_batch(out)
            if self.postprocessing is not None:
                samples = [apply_transform(self.postprocessing, s, map_items=False) for s in samples]
            engine.state.output = samples
            # reference decollates state.batch alongside state.output
            # (workflow.py decollate wiring / DecollateBatch handler invariant)
            if isinstance(engine.state.batch, dict):
                try:
                    engine.state.batch = decollate_batch(engine.state.batch)
                except Exception:
                    pass
        for name, metric in self.metrics.items():
            try:
                if isinstance(engine.state.output, list):
                    y_pred = [s.get(CommonKeys.PRED) for s in engine.state.output]
                    y = [s.get(CommonKeys.LABEL) for s in engine.state.output]
                    if all(p is not None for p in y_pred) and all(t is not None for t in y):
                        arrs_p = [np.asarray(p.data if hasattr(p, "data") and not isinstance(p, np.ndarray) else p) for p in y_pred]
                        arrs_y = [np.asarray(t.data if hasattr(t, "data") and not isinstance(t, np.ndarray) else t) for t in y]
                        metric(np.stack(arrs_p), np.stack(arrs_y))
                else:
                    y_pred = engine.state.output.get(CommonKeys.PRED)
                    y = engine.state.output.get(CommonKeys.LABEL)
                    if y_pred is not None and y is not None:
                        metric(np.asarray(y_pred), np.asarray(y))
            except Exception as e:
                warnings.warn(f"metric {name} update failed: {e}")

    # -- run loop ---------------------------------------------------------------
    def run(self) -> None:
        """Execute the full training/eval loop (reference: workflow.py:271)."""
        if self.state.epoch_length == 0 or self.data_loader is None:
            warnings.warn("No data to iterate, exiting run.")
            return
        try:
            self.fire_event(Events.STARTED)
            while self.state.epoch < self.state.max_epochs and not self.state.terminate:
                self.state.epoch += 1
                if hasattr(self.data_loader, "sampler") and hasattr(getattr(self.data_loader, "sampler"), "set_epoch"):
                    self.data_loader.sampler.set_epoch(self.state.epoch)
                self.fire_event(Events.EPOCH_STARTED)
                it = 0
                for batchdata in self.data_loader:
                    it += 1
                    self.state.iteration += 1
                    self.state.batch = batchdata
                    self.fire_event(Events.ITERATION_STARTED)
                    # ignite semantics: a user iteration_update REPLACES the default
                    # _iteration (reference: workflow.py:47 passes it to Engine.__init__)
                    if self._iteration_update is not None:
                        self.state.output = self._iteration_update(self, batchdata)
                    else:
                        self.state.output = self._iteration(self, batchdata)
                    self._apply_post_and_metrics(self)
                    self.fire_event(Events.ITERATION_COMPLETED)
                    if self.state.terminate:
                        break
                    if self.state.epoch_length is not None and it >= self.state.epoch_length:
                        break
                self.fire_event(Events.EPOCH_COMPLETED)
            self.fire_event(Events.COMPLETED)
        except Exception as e:
            # ignite semantics (reference workflow.py / ignite Engine._handle_exception):
            # fire EXCEPTION_RAISED handlers (e.g. CheckpointSaver's final save, which
            # re-raises after saving); with no handler, propagate unchanged
            handlers = self._event_handlers.get(str(Events.EXCEPTION_RAISED), [])
            if not handlers:
                raise
            for handler, args, kwargs in list(handlers):
                handler(self, e, *args, **kwargs)

    def terminate(self) -> None:
        self.state.terminate = True

    def interrupt(self) -> None:
        self.state.terminate = True

    def get_stats(self, *vars_name: str) -> dict:
        stats = {
            "rank": self.state.rank,
            "current_epoch": self.state.epoch,
            "current_iteration": self.state.iteration,
            "total_epochs": self.state.max_epochs,
            "total_iterations": self.state.epoch_length,
        }
        for k in vars_name:
            stats[k] = getattr(self.state, k, None)
        return stats
