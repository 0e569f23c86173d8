"""TensorBoard handlers (reference: monai/handlers/tensorboard_handlers.py:71
TensorBoardStatsHandler, :288 TensorBoardImageHandler)."""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

from ..engines.events import Events
from ..utils.backend import to_numpy
from ..utils.enums import CommonKeys
from ..utils.module import optional_import

SummaryWriter, _has_tb = optional_import("tensorboardX", name="SummaryWriter")
if not _has_tb:
    SummaryWriter, _has_tb = optional_import("torch.utils.tensorboard", name="SummaryWriter")

__all__ = ["TensorBoardHandler", "TensorBoardStatsHandler", "TensorBoardImageHandler"]

DEFAULT_TAG = "Loss"


class TensorBoardHandler:
    """Base: owns/creates the SummaryWriter (reference: tensorboard_handlers.py:44)."""

    def __init__(self, summary_writer=None, log_dir: str = "./runs"):
        if summary_writer is None:
            self._writer = SummaryWriter(log_dir=log_dir)
            self.internal_writer = True
        else:
            self._writer = summary_writer
            self.internal_writer = False

    def attach(self, engine) -> None:
        raise NotImplementedError(f"Subclass {self.__class__.__name__} must implement this method.")

    def close(self):
        if self.internal_writer:
            self._writer.close()


class TensorBoardStatsHandler(TensorBoardHandler):
    """Write loss/metrics to TensorBoard (reference: tensorboard_handlers.py:71)."""

    def __init__(self, summary_writer=None, log_dir: str = "./runs", iteration_log: bool = True,
                 epoch_log: bool = True, epoch_event_writer: Callable | None = None,
                 iteration_event_writer: Callable | None = None,
                 output_transform: Callable = lambda x: x,
                 global_epoch_transform: Callable = lambda x: x, state_attributes=None,
                 tag_name: str = DEFAULT_TAG):
        super().__init__(summary_writer=summary_writer, log_dir=log_dir)
        self.iteration_log = iteration_log
        self.epoch_log = epoch_log
        self.output_transform = output_transform
        self.global_epoch_transform = global_epoch_transform
        self.state_attributes = state_attributes
        self.tag_name = tag_name

    def attach(self, engine) -> None:
        if self.iteration_log:
            engine.add_event_handler(Events.ITERATION_COMPLETED, self.iteration_completed)
        if self.epoch_log:
            engine.add_event_handler(Events.EPOCH_COMPLETED, self.epoch_completed)

    def iteration_completed(self, engine) -> None:
        out = self.output_transform(engine.state.output)
        loss = None
        if isinstance(out, dict):
            loss = out.get(CommonKeys.LOSS)
        elif isinstance(out, list) and out and isinstance(out[0], dict):
            loss = out[0].get(CommonKeys.LOSS)
        elif np.isscalar(out) or (hasattr(out, "ndim") and np.ndim(out) == 0):
            loss = out
        if loss is None:
            return
        self._writer.add_scalar(self.tag_name, float(np.asarray(to_numpy(loss)).mean()),
                                engine.state.iteration)

    def epoch_completed(self, engine) -> None:
        epoch = self.global_epoch_transform(engine.state.epoch)
        for name, value in engine.state.metrics.items():
            if isinstance(value, (int, float)):
                self._writer.add_scalar(name, value, epoch)
        for attr in self.state_attributes or ():
            val = getattr(engine.state, attr, None)
            if isinstance(val, (int, float)):
                self._writer.add_scalar(attr, val, epoch)
        self._writer.flush()


class TensorBoardImageHandler(TensorBoardHandler):
    """Write 2D/3D image snapshots (reference: tensorboard_handlers.py:288)."""

    def __init__(self, summary_writer=None, log_dir: str = "./runs", interval: int = 1,
                 epoch_level: bool = True, batch_transform: Callable = lambda x: x,
                 output_transform: Callable = lambda x: x, global_iter_transform: Callable = lambda x: x,
                 index: int = 0, max_channels: int = 1, frame_dim: int = -3, max_frames: int = 64):
        super().__init__(summary_writer=summary_writer, log_dir=log_dir)
        self.interval = interval
        self.epoch_level = epoch_level
        self.batch_transform = batch_transform
        self.output_transform = output_transform
        self.global_iter_transform = global_iter_transform
        self.index = index
        self.max_frames = max_frames
        self.frame_dim = frame_dim

    def attach(self, engine) -> None:
        event = Events.EPOCH_COMPLETED if self.epoch_level else Events.ITERATION_COMPLETED
        engine.add_event_handler(event, self, every=self.interval)

    def _write_image(self, tag: str, img, step: int) -> None:
        arr = np.asarray(to_numpy(getattr(img, "data", img)))
        if arr.ndim == 4:  # (C, H, W, D)-ish 3D: take middle slice of last dim
            arr = arr[..., arr.shape[-1] // 2]
        if arr.ndim == 3 and arr.shape[0] not in (1, 3):
            arr = arr[:1]
        mn, mx = arr.min(), arr.max()
        arr = (arr - mn) / max(mx - mn, 1e-8)
        self._writer.add_image(tag, arr, step)

    def __call__(self, engine) -> None:
        step = self.global_iter_transform(engine.state.epoch if self.epoch_level
                                          else engine.state.iteration)
        batch = self.batch_transform(engine.state.batch)
        output = self.output_transform(engine.state.output)
        if isinstance(batch, dict):
            if CommonKeys.IMAGE in batch:
                self._write_image("input_0", _index_batch(batch[CommonKeys.IMAGE], self.index), step)
            if CommonKeys.LABEL in batch:
                self._write_image("input_1", _index_batch(batch[CommonKeys.LABEL], self.index), step)
        out_item = None
        if isinstance(output, dict):
            out_item = output.get(CommonKeys.PRED)
        elif isinstance(output, list) and output and isinstance(output[0], dict):
            out_item = output[self.index].get(CommonKeys.PRED)
        if out_item is not None:
            self._write_image("output", _index_batch(out_item, 0 if isinstance(output, list) else self.index),
                              step)
        self._writer.flush()


def _index_batch(x, index: int):
    arr = getattr(x, "data", x)
    if hasattr(arr, "ndim") and np.ndim(arr) >= 4:
        return arr[index]
    return arr
