"""Additional handlers: MLflow (gated), SmartCache, PostProcessing, DecollateBatch,
ProbMapProducer, ParamScheduler.

Parity targets: monai/handlers/{mlflow_handler.py:50, smartcache_handler.py,
postprocessing.py, decollate_batch.py, probability_maps.py, param_scheduler.py}.
"""
from __future__ import annotations

import os
import threading
from collections.abc import Callable
from typing import Any

import numpy as np

from ..data.utils import decollate_batch as _decollate
from ..engines.events import Events
from ..transforms.transform import apply_transform
from ..utils.backend import to_numpy
from ..utils.module import optional_import

__all__ = ["MLFlowHandler", "SmartCacheHandler", "PostProcessing", "DecollateBatch",
           "ProbMapProducer", "ParamSchedulerHandler"]

mlflow, _has_mlflow = optional_import("mlflow")


class MLFlowHandler:
    """Track loss/metrics in MLflow (reference: mlflow_handler.py:50; requires the
    optional mlflow package)."""

    def __init__(self, tracking_uri: str | None = None, iteration_log: bool = True,
                 epoch_log: bool = True, epoch_logger=None, iteration_logger=None,
                 output_transform: Callable = lambda x: x, global_epoch_transform: Callable = lambda x: x,
                 state_attributes=None, tag_name: str = "Loss", experiment_name: str = "monai_experiment",
                 run_name=None, experiment_param=None, artifacts=None, optimizer_param_names="lr",
                 close_on_complete: bool = False):
        if not _has_mlflow:
            raise ImportError("MLFlowHandler requires the optional dependency mlflow.")
        self.iteration_log = iteration_log
        self.epoch_log = epoch_log
        self.output_transform = output_transform
        self.global_epoch_transform = global_epoch_transform
        self.tag_name = tag_name
        self.experiment_name = experiment_name
        self.run_name = run_name
        self.close_on_complete = close_on_complete
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)

    def attach(self, engine) -> None:
        engine.add_event_handler(Events.STARTED, self.start)
        if self.iteration_log:
            engine.add_event_handler(Events.ITERATION_COMPLETED, self.iteration_completed)
        if self.epoch_log:
            engine.add_event_handler(Events.EPOCH_COMPLETED, self.epoch_completed)
        engine.add_event_handler(Events.COMPLETED, self.complete)

    def start(self, engine) -> None:
        mlflow.set_experiment(self.experiment_name)
        mlflow.start_run(run_name=self.run_name)

    def iteration_completed(self, engine) -> None:
        out = self.output_transform(engine.state.output)
        if isinstance(out, list) and out and isinstance(out[0], dict):
            out = out[0]  # decollated per-sample dicts share the iteration loss
        loss = out.get("loss") if isinstance(out, dict) else out
        if loss is not None and np.ndim(to_numpy(loss)) == 0:
            mlflow.log_metric(self.tag_name, float(to_numpy(loss)), step=engine.state.iteration)

    def epoch_completed(self, engine) -> None:
        epoch = self.global_epoch_transform(engine.state.epoch)
        for k, v in engine.state.metrics.items():
            if isinstance(v, (int, float)):
                mlflow.log_metric(k, v, step=epoch)

    def complete(self, engine) -> None:
        if self.close_on_complete:
            mlflow.end_run()


class SmartCacheHandler:
    """Drive SmartCacheDataset start/update/shutdown (reference: smartcache_handler.py)."""

    def __init__(self, smartcacher):
        from ..data.dataset import SmartCacheDataset

        if not isinstance(smartcacher, SmartCacheDataset):
            raise TypeError("smartcacher must be a SmartCacheDataset.")
        self.smartcacher = smartcacher

    def attach(self, engine) -> None:
        engine.add_event_handler(Events.STARTED, self.started)
        engine.add_event_handler(Events.EPOCH_COMPLETED, self.epoch_completed)
        engine.add_event_handler(Events.COMPLETED, self.completed)

    def started(self, engine) -> None:
        self.smartcacher.start()

    def epoch_completed(self, engine) -> None:
        self.smartcacher.update_cache()

    def completed(self, engine) -> None:
        self.smartcacher.shutdown()


class PostProcessing:
    """Apply postprocessing at a chosen event (reference: postprocessing.py)."""

    def __init__(self, transform: Callable, event: str = Events.ITERATION_COMPLETED):
        self.transform = transform
        self.event = event

    def attach(self, engine) -> None:
        engine.add_event_handler(self.event, self)

    def __call__(self, engine) -> None:
        from ..engines.utils import engine_apply_transform

        if not isinstance(engine.state.batch, list) or not isinstance(engine.state.output, list):
            engine.state.batch, engine.state.output = engine_apply_transform(
                engine.state.batch, engine.state.output, self.transform)
        else:
            for i, (b, o) in enumerate(zip(engine.state.batch, engine.state.output)):
                engine.state.batch[i], engine.state.output[i] = engine_apply_transform(b, o, self.transform)


class DecollateBatch:
    """Decollate engine batch/output into lists (reference: decollate_batch.py)."""

    def __init__(self, event: str = Events.ITERATION_COMPLETED, detach: bool = True,
                 decollate_batch: bool = True, batch_keys=None, decollate_output: bool = True,
                 output_keys=None, allow_missing_keys: bool = False):
        self.event = event
        self.detach = detach
        self.decollate_batch = decollate_batch
        self.decollate_output = decollate_output

    def attach(self, engine) -> None:
        engine.add_event_handler(self.event, self)

    def __call__(self, engine) -> None:
        if self.decollate_batch and not isinstance(engine.state.batch, list):
            engine.state.batch = _decollate(engine.state.batch, detach=self.detach)
        if self.decollate_output and not isinstance(engine.state.output, list):
            engine.state.output = _decollate(engine.state.output, detach=self.detach)


class ProbMapProducer:
    """Accumulate patch probabilities into whole-slide probability maps
    (reference: probability_maps.py)."""

    def __init__(self, output_dir: str = "./", output_postfix: str = "", prob_key: str = "pred",
                 dtype=np.float64, name: str | None = None):
        self.output_dir = output_dir
        self.output_postfix = output_postfix
        self.prob_key = prob_key
        self.dtype = dtype
        self.prob_map: dict[str, np.ndarray] = {}
        self.counter: dict[str, int] = {}
        self.num_done_images = 0
        self.num_images = 0
        self.lock = threading.Lock()

    def attach(self, engine) -> None:
        image_data = getattr(getattr(engine, "data_loader", None), "dataset", None)
        image_data = getattr(image_data, "image_data", None)
        if image_data is not None:
            self.num_images = len(image_data)
            for sample in image_data:
                name = sample["name"]
                self.prob_map[name] = np.zeros(sample["mask_shape"], dtype=self.dtype)
                self.counter[name] = sample["num_patches"]
        engine.add_event_handler(Events.ITERATION_COMPLETED, self)
        engine.add_event_handler(Events.COMPLETED, self.finalize)

    def __call__(self, engine) -> None:
        output = engine.state.output
        if not isinstance(output, dict):
            return
        names = output.get("name")
        locs = output.get("mask_location")
        probs = output.get(self.prob_key)
        if names is None or locs is None or probs is None:
            return
        probs = to_numpy(probs)
        for i, name in enumerate(np.atleast_1d(names)):
            with self.lock:
                self.prob_map[str(name)][tuple(np.asarray(locs)[i])] = probs[i]
                self.counter[str(name)] -= 1
                if self.counter[str(name)] == 0:
                    self.save_prob_map(str(name))

    def save_prob_map(self, name: str) -> None:
        os.makedirs(self.output_dir, exist_ok=True)
        file_path = os.path.join(self.output_dir, f"{name}{self.output_postfix}.npy")
        np.save(file_path, self.prob_map[name])
        self.num_done_images += 1
        del self.prob_map[name]

    def finalize(self, engine) -> None:
        pass


class ParamSchedulerHandler:
    """Update an engine/net parameter on a schedule (reference: param_scheduler.py)."""

    def __init__(self, parameter_setter: Callable, value_calculator: Callable | str,
                 vc_kwargs: dict, epoch_level: bool = False, name: str | None = None,
                 event=None):
        self.epoch_level = epoch_level
        self.event = event if event is not None else (
            Events.EPOCH_COMPLETED if epoch_level else Events.ITERATION_COMPLETED)
        self._calculators = {"linear": self._linear, "exponential": self._exponential,
                             "step": self._step, "multistep": self._multistep}
        self._parameter_setter = parameter_setter
        self._vc_kwargs = vc_kwargs
        self._value_calculator = (self._calculators[value_calculator]
                                  if isinstance(value_calculator, str) else value_calculator)

    def attach(self, engine) -> None:
        engine.add_event_handler(self.event, self)

    def _get_current_event(self, engine) -> int:
        return engine.state.epoch if self.epoch_level else engine.state.iteration

    def __call__(self, engine) -> None:
        value = self._value_calculator(**self._vc_kwargs, current_step=self._get_current_event(engine))
        self._parameter_setter(value)

    @staticmethod
    def _linear(initial_value, step_constant, step_max_value, max_value, current_step) -> float:
        if current_step <= step_constant:
            return float(initial_value)
        if current_step >= step_max_value:
            return float(max_value)
        return float(initial_value + (max_value - initial_value)
                     * (current_step - step_constant) / (step_max_value - step_constant))

    @staticmethod
    def _exponential(initial_value, gamma, current_step) -> float:
        return float(initial_value * gamma**current_step)

    @staticmethod
    def _step(initial_value, gamma, step_size, current_step) -> float:
        return float(initial_value * gamma ** (current_step // step_size))

    @staticmethod
    def _multistep(initial_value, gamma, milestones, current_step) -> float:
        return float(initial_value * gamma ** len([m for m in milestones if m <= current_step]))
