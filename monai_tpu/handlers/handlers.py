"""Event handlers: stats logging, validation cadence, early stop, LR schedule,
metrics saving, garbage collection, metric logging.

Parity targets: monai/handlers/stats_handler.py:36, validation_handler.py,
earlystop_handler.py:30, lr_schedule_handler.py, metrics_saver.py, metric_logger.py,
garbage_collector.py, logfile_handler.py, classification_saver.py:151.
"""
from __future__ import annotations

import gc
import logging
import os
import time
import warnings
from collections.abc import Callable, Sequence
from typing import Any

import numpy as np

from ..engines.events import Events
from ..utils.backend import to_numpy
from ..utils.dist import RankFilter, evenly_divisible_all_gather, get_rank, string_list_all_gather
from ..utils.enums import CommonKeys

__all__ = ["StatsHandler", "ValidationHandler", "EarlyStopHandler", "LrScheduleHandler",
           "MetricsSaver", "MetricLogger", "GarbageCollector", "LogfileHandler",
           "ClassificationSaver", "StatsKeys"]

DEFAULT_KEY_VAL_FORMAT = "{}: {:.4f} "
DEFAULT_TAG = "Loss"


class StatsKeys:
    LOSS = "loss"
    METRICS = "metrics"


class StatsHandler:
    """stdout/logger statistics at iteration and epoch events
    (reference: stats_handler.py:36)."""

    def __init__(self, iteration_log: bool | Callable = True, epoch_log: bool | Callable = True,
                 epoch_print_logger: Callable | None = None, iteration_print_logger: Callable | None = None,
                 output_transform: Callable = lambda x: x[0] if isinstance(x, (list, tuple)) else x,
                 global_epoch_transform: Callable = lambda x: x, state_attributes: Sequence[str] | None = None,
                 name: str | None = "StatsHandler", tag_name: str = DEFAULT_TAG,
                 key_var_format: str = DEFAULT_KEY_VAL_FORMAT):
        self.iteration_log = iteration_log
        self.epoch_log = epoch_log
        self.epoch_print_logger = epoch_print_logger
        self.iteration_print_logger = iteration_print_logger
        self.output_transform = output_transform
        self.global_epoch_transform = global_epoch_transform
        self.state_attributes = state_attributes
        self.tag_name = tag_name
        self.key_var_format = key_var_format
        self.logger = logging.getLogger(name)
        self.logger.setLevel(logging.INFO)
        if not self.logger.handlers:
            import sys

            console = logging.StreamHandler(sys.stdout)
            console.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
            self.logger.addHandler(console)
        self.logger.addFilter(RankFilter())

    def attach(self, engine) -> None:
        if self.iteration_log:
            engine.add_event_handler(Events.ITERATION_COMPLETED, self.iteration_completed)
        if self.epoch_log:
            engine.add_event_handler(Events.EPOCH_COMPLETED, self.epoch_completed)
        engine.add_event_handler(Events.EXCEPTION_RAISED, self.exception_raised)

    def iteration_completed(self, engine) -> None:
        if self.iteration_print_logger is not None:
            self.iteration_print_logger(engine)
            return
        out = engine.state.output
        loss = None
        if isinstance(out, dict):
            loss = out.get(CommonKeys.LOSS)
        elif isinstance(out, list) and out and isinstance(out[0], dict):
            loss = out[0].get(CommonKeys.LOSS)
        if loss is None:
            return
        try:
            loss_v = float(np.asarray(to_numpy(loss)).mean())
        except Exception:
            return
        ep = engine.state.epoch
        it = engine.state.iteration
        per_epoch = engine.state.epoch_length or "?"
        cur_it = (it - 1) % engine.state.epoch_length + 1 if engine.state.epoch_length else it
        self.logger.info(f"Epoch: {ep}/{engine.state.max_epochs}, Iter: {cur_it}/{per_epoch} -- "
                         + self.key_var_format.format(self.tag_name, loss_v))

    def epoch_completed(self, engine) -> None:
        if self.epoch_print_logger is not None:
            self.epoch_print_logger(engine)
            return
        prints_dict = engine.state.metrics
        current_epoch = self.global_epoch_transform(engine.state.epoch)
        if prints_dict:
            out_str = f"Epoch[{current_epoch}] Metrics -- "
            for name in sorted(prints_dict):
                value = prints_dict[name]
                if isinstance(value, (int, float)):
                    out_str += self.key_var_format.format(name, value)
            self.logger.info(out_str)
        if engine.state.key_metric_name is not None:
            self.logger.info(f"Key metric: {engine.state.key_metric_name} "
                             f"best value: {engine.state.best_metric} "
                             f"at epoch: {engine.state.best_metric_epoch}")
        if self.state_attributes:
            out_str = "State values: "
            for attr in self.state_attributes:
                out_str += f"{attr}: {getattr(engine.state, attr, None)}; "
            self.logger.info(out_str)

    def exception_raised(self, engine, e: Exception | None = None) -> None:
        self.logger.exception(f"Exception: {e}")
        if e is not None:
            raise e


class ValidationHandler:
    """Run an evaluator every N epochs (reference: validation_handler.py)."""

    def __init__(self, interval: int, validator=None, epoch_level: bool = True,
                 exec_at_start: bool = False):
        if validator is not None and not hasattr(validator, "run"):
            raise TypeError(f"validator must have a run() method, got {type(validator).__name__}.")
        self.validator = validator
        self.interval = interval
        self.epoch_level = epoch_level
        self.exec_at_start = exec_at_start

    def set_validator(self, validator) -> None:
        self.validator = validator

    def attach(self, engine) -> None:
        if self.epoch_level:
            engine.add_event_handler(Events.EPOCH_COMPLETED, self, every=self.interval)
        else:
            engine.add_event_handler(Events.ITERATION_COMPLETED, self, every=self.interval)
        if self.exec_at_start:
            engine.add_event_handler(Events.STARTED, self)

    def __call__(self, engine) -> None:
        if self.validator is None:
            raise RuntimeError("please set validator in __init__() or call set_validator() before training.")
        self.validator.run(engine.state.epoch)


class EarlyStopHandler:
    """Stop training when a score stops improving (reference: earlystop_handler.py:30)."""

    def __init__(self, patience: int, score_function: Callable, trainer=None,
                 min_delta: float = 0.0, cumulative_delta: bool = False, epoch_level: bool = True):
        self.patience = patience
        self.score_function = score_function
        self.min_delta = min_delta
        self.cumulative_delta = cumulative_delta
        self.epoch_level = epoch_level
        self.trainer = trainer
        self.best_score: float | None = None
        self.counter = 0

    def attach(self, engine) -> None:
        if self.trainer is None:
            self.trainer = engine
        if self.epoch_level:
            engine.add_event_handler(Events.EPOCH_COMPLETED, self)
        else:
            engine.add_event_handler(Events.ITERATION_COMPLETED, self)

    def set_trainer(self, trainer) -> None:
        self.trainer = trainer

    def __call__(self, engine) -> None:
        score = self.score_function(engine)
        if self.best_score is None:
            self.best_score = score
            return
        if score <= self.best_score + self.min_delta:
            if not self.cumulative_delta and score > self.best_score:
                self.best_score = score
            self.counter += 1
            if self.counter >= self.patience:
                if self.trainer is not None:
                    self.trainer.state.terminate = True
        else:
            self.best_score = score
            self.counter = 0


class LrScheduleHandler:
    """Record/advance an LR schedule value into engine state (reference:
    lr_schedule_handler.py).  In optax, schedules are step-driven inside the optimizer;
    this handler mirrors the current LR for logging and supports callable schedulers."""

    def __init__(self, lr_scheduler: Callable | None = None, print_lr: bool = True,
                 name: str | None = None, epoch_level: bool = True, step_transform: Callable = lambda e: e.state.iteration):
        self.lr_scheduler = lr_scheduler
        self.print_lr = print_lr
        self.epoch_level = epoch_level
        self.step_transform = step_transform
        self.logger = logging.getLogger(name or "LrScheduleHandler")

    def attach(self, engine) -> None:
        if self.epoch_level:
            engine.add_event_handler(Events.EPOCH_COMPLETED, self)
        else:
            engine.add_event_handler(Events.ITERATION_COMPLETED, self)

    def __call__(self, engine) -> None:
        if self.lr_scheduler is None:
            return
        step = self.step_transform(engine)
        lr = float(self.lr_scheduler(step))
        engine.state.metrics["lr"] = lr
        if self.print_lr:
            self.logger.info(f"Current learning rate: {lr}")


class MetricsSaver:
    """Save metrics + per-case details to CSV (reference: metrics_saver.py)."""

    def __init__(self, save_dir: str, metrics: Sequence[str] | str | None = "*",
                 metric_details: Sequence[str] | str | None = None, batch_transform: Callable = lambda x: x,
                 summary_ops: Sequence[str] | str | None = None, save_rank: int = 0,
                 delimiter: str = ",", output_type: str = "csv"):
        self.save_dir = save_dir
        self.metrics = metrics
        self.metric_details = metric_details
        self.save_rank = save_rank
        self.delimiter = delimiter

    def attach(self, engine) -> None:
        engine.add_event_handler(Events.COMPLETED, self)

    def __call__(self, engine) -> None:
        if get_rank() != self.save_rank:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        if self.metrics is not None and engine.state.metrics:
            with open(os.path.join(self.save_dir, "metrics.csv"), "w") as f:
                for k, v in engine.state.metrics.items():
                    if self.metrics == "*" or k in self.metrics:
                        f.write(f"{k}{self.delimiter}{v}\n")
        if self.metric_details is not None and engine.state.metric_details:
            for k, v in engine.state.metric_details.items():
                if self.metric_details == "*" or k in self.metric_details:
                    arr = np.asarray(v)
                    np.savetxt(os.path.join(self.save_dir, f"{k}_raw.csv"), arr.reshape(arr.shape[0], -1),
                               delimiter=self.delimiter)


class MetricLogger:
    """Accumulate loss/metric history (reference: metric_logger.py)."""

    def __init__(self, loss_transform: Callable = lambda x: x.get(CommonKeys.LOSS) if isinstance(x, dict) else x,
                 metric_transform: Callable = lambda x: x, evaluator=None):
        self.loss_transform = loss_transform
        self.metric_transform = metric_transform
        self.loss: list = []
        self.metrics: dict = {}
        if evaluator is not None:
            self.attach_evaluator(evaluator)

    def attach(self, engine) -> None:
        engine.add_event_handler(Events.ITERATION_COMPLETED, self)

    def attach_evaluator(self, evaluator) -> None:
        evaluator.add_event_handler(Events.COMPLETED, self.log_metrics)

    def __call__(self, engine) -> None:
        out = engine.state.output
        if isinstance(out, list) and out:
            out = out[0]
        loss = self.loss_transform(out)
        if loss is not None:
            self.loss.append((engine.state.iteration, float(np.asarray(to_numpy(loss)).mean())))

    def log_metrics(self, engine) -> None:
        for m, v in self.metric_transform(engine.state.metrics).items():
            self.metrics.setdefault(m, []).append(v)


class GarbageCollector:
    """Explicit gc at a chosen event (reference: garbage_collector.py)."""

    def __init__(self, trigger_event: str = Events.EPOCH_COMPLETED, log_level: int = 10):
        self.trigger_event = trigger_event
        self.log_level = log_level

    def attach(self, engine) -> None:
        engine.add_event_handler(self.trigger_event, self)

    def __call__(self, engine) -> None:
        pre_count = gc.get_count()
        gc.collect()
        unreachable = gc.collect()
        after_count = gc.get_count()
        logging.getLogger("GarbageCollector").log(
            self.log_level,
            f"Garbage Count: [before: {pre_count}] -> [after: {after_count}] (unreachable: {unreachable})")


class LogfileHandler:
    """Add a per-run file handler to the root logger (reference: logfile_handler.py)."""

    def __init__(self, output_dir: str, filename: str = "log.txt", loglevel: int = logging.INFO,
                 formatter: str = "%(asctime)s %(name)s %(levelname)s: %(message)s",
                 create_dir: bool = True):
        self.output_dir = output_dir
        self.filename = filename
        self.loglevel = loglevel
        self.formatter = formatter
        self.create_dir = create_dir
        self.logger = logging.getLogger()
        self.handler: logging.FileHandler | None = None

    def attach(self, engine) -> None:
        engine.add_event_handler(Events.STARTED, self._start)
        engine.add_event_handler(Events.COMPLETED, self._completed)

    def _start(self, engine) -> None:
        if self.create_dir and not os.path.exists(self.output_dir):
            os.makedirs(self.output_dir, exist_ok=True)
        self.handler = logging.FileHandler(os.path.join(self.output_dir, self.filename))
        self.handler.setLevel(self.loglevel)
        self.handler.setFormatter(logging.Formatter(self.formatter))
        self.logger.addHandler(self.handler)

    def _completed(self, engine) -> None:
        if self.handler is not None:
            self.logger.removeHandler(self.handler)
            self.handler.close()
        self.handler = None


class ClassificationSaver:
    """Gather per-sample classification results across ranks, save CSV on rank 0
    (reference: classification_saver.py:151)."""

    def __init__(self, output_dir: str = "./", filename: str = "predictions.csv", delimiter: str = ",",
                 overwrite: bool = True, batch_transform: Callable = lambda x: x,
                 output_transform: Callable = lambda x: x, name: str | None = None, save_rank: int = 0):
        self.output_dir = output_dir
        self.filename = filename
        self.delimiter = delimiter
        self.overwrite = overwrite
        self.batch_transform = batch_transform
        self.output_transform = output_transform
        self.save_rank = save_rank
        self._filenames: list[str] = []
        self._outputs: list[np.ndarray] = []

    def attach(self, engine) -> None:
        engine.add_event_handler(Events.EPOCH_STARTED, self._started)
        engine.add_event_handler(Events.ITERATION_COMPLETED, self)
        engine.add_event_handler(Events.EPOCH_COMPLETED, self._finalize)

    def _started(self, engine) -> None:
        self._filenames = []
        self._outputs = []

    def __call__(self, engine) -> None:
        meta_data = self.batch_transform(engine.state.batch)
        if isinstance(meta_data, dict):
            fnames = meta_data.get("filename_or_obj", [])
            self._filenames.extend([str(f) for f in np.atleast_1d(fnames)])
        engine_output = self.output_transform(engine.state.output)
        if engine_output is not None:
            arr = np.asarray(to_numpy(engine_output))
            self._outputs.append(arr)

    def _finalize(self, engine) -> None:
        outputs = np.concatenate(self._outputs, axis=0) if self._outputs else np.asarray([])
        outputs = evenly_divisible_all_gather(outputs, concat=True)
        filenames = string_list_all_gather(self._filenames)
        if get_rank() != self.save_rank:
            return
        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(self.output_dir, self.filename)
        with open(path, "w") as f:
            for i, o in enumerate(outputs):
                fname = filenames[i] if i < len(filenames) else str(i)
                items = np.atleast_1d(o).tolist()
                f.write(self.delimiter.join([fname] + [str(x) for x in items]) + "\n")


class MetricLoggerKeys:
    """(reference: handlers/metric_logger.py MetricLoggerKeys)."""

    METRICS = "Metrics"
    LOSS = "Loss"


class RangeHandler:
    """Open a profiler range on a start event and close it on an end event — the TPU
    analog of the NVTX range handler (reference: handlers/nvtx_handlers.py RangeHandler)."""

    def __init__(self, events, msg: str | None = None):
        if isinstance(events, str):
            self.start_event = f"{events}_STARTED"
            self.end_event = f"{events}_COMPLETED"
        else:
            self.start_event, self.end_event = events
        self.msg = msg or str(self.start_event)
        self._ctx = None

    def attach(self, engine) -> None:
        engine.add_event_handler(self.start_event, self.range_push)
        engine.add_event_handler(self.end_event, self.range_pop)

    def range_push(self, engine=None):
        import jax.profiler

        self._ctx = jax.profiler.TraceAnnotation(self.msg)
        self._ctx.__enter__()

    def range_pop(self, engine=None):
        if self._ctx is not None:
            self._ctx.__exit__(None, None, None)
            self._ctx = None


class RangePushHandler:
    """(reference: nvtx_handlers.py RangePushHandler)."""

    _stack: list = []

    def __init__(self, event, msg: str | None = None):
        self.event = event
        self.msg = msg or str(event)

    def attach(self, engine) -> None:
        engine.add_event_handler(self.event, self.range_push)

    def range_push(self, engine=None):
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(self.msg)
        ctx.__enter__()
        RangePushHandler._stack.append(ctx)


class RangePopHandler:
    """(reference: nvtx_handlers.py RangePopHandler)."""

    def __init__(self, event):
        self.event = event

    def attach(self, engine) -> None:
        engine.add_event_handler(self.event, self.range_pop)

    def range_pop(self, engine=None):
        if RangePushHandler._stack:
            RangePushHandler._stack.pop().__exit__(None, None, None)


class MarkHandler:
    """(reference: nvtx_handlers.py MarkHandler)."""

    def __init__(self, event, msg: str | None = None):
        self.event = event
        self.msg = msg or str(event)

    def attach(self, engine) -> None:
        engine.add_event_handler(self.event, self.mark)

    def mark(self, engine=None):
        import jax.profiler

        with jax.profiler.TraceAnnotation(self.msg):
            pass


class TrtHandler:
    """TensorRT export handler (reference: handlers/trt_handler.py TrtHandler).
    TensorRT is CUDA-only with no TPU counterpart; on TPU, ahead-of-time compilation is
    handled by XLA (jax.jit + AOT lowering). Construction raises to make this explicit."""

    def __init__(self, *args, **kwargs):
        raise RuntimeError(
            "TrtHandler is CUDA/TensorRT-specific and has no TPU equivalent; use "
            "jax.jit AOT compilation (jax.jit(fn).lower(...).compile()) instead.")


def _clearml_gated(name):
    class _Gated:
        def __init__(self, *args, **kwargs):
            raise ImportError(f"{name} requires the optional 'clearml' package "
                              "(not installed).")
    _Gated.__name__ = name
    return _Gated


ClearMLHandler = _clearml_gated("ClearMLHandler")
ClearMLStatsHandler = _clearml_gated("ClearMLStatsHandler")
ClearMLImageHandler = _clearml_gated("ClearMLImageHandler")
