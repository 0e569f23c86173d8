"""Video datasets backed by OpenCV (reference API: monai/data/video_dataset.py:62
VideoDataset, :154 VideoFileDataset, :212 CameraDataset).

Own implementation: capture handling is centralised in ``_Capture`` (lazy,
optionally per-access for multiprocessing), and frame decoding/conversion lives
in one ``_decode`` helper shared by the indexed and streaming variants.
"""
from __future__ import annotations

import os
import tempfile
from collections.abc import Callable, Iterator
from typing import Any

import numpy as np

from ..utils.module import optional_import
from .iterable_dataset import IterableDataset

cv2, has_cv2 = optional_import("cv2")

__all__ = ["VideoDataset", "VideoFileDataset", "CameraDataset"]


class _Capture:
    """Wrap a cv2.VideoCapture source; reopens per access when ``per_access`` is set
    (required for multiprocessing DataLoader workers, which cannot share handles)."""

    def __init__(self, source: str | int, per_access: bool):
        self.source = source
        self.per_access = per_access
        self._cap = None if per_access else self._open()

    def _open(self):
        if isinstance(self.source, str) and not os.path.isfile(self.source):
            raise RuntimeError("Video file does not exist: " + self.source)
        cap = cv2.VideoCapture(self.source)
        if not cap.isOpened():
            raise RuntimeError(f"Failed to open video: {self.source}")
        return cap

    def get(self):
        return self._open() if self.per_access else self._cap


class VideoDataset:
    """Base video source: decode frames, convert color order, move channel dim,
    apply an optional per-frame transform."""

    def __init__(self, video_source: str | int, transform: Callable | None = None,
                 max_num_frames: int | None = None, color_order: str = "rgb",
                 multiprocessing: bool = False, channel_dim: int = 0):
        if not has_cv2:
            raise RuntimeError("OpenCV not installed.")
        if color_order not in ("rgb", "bgr"):
            raise NotImplementedError(f"unknown color order {color_order}")
        self.color_order = color_order
        self.channel_dim = channel_dim
        self.video_source = video_source
        self.multiprocessing = multiprocessing
        self._capture = _Capture(video_source, per_access=multiprocessing)
        self.transform = transform
        self.max_num_frames = max_num_frames

    # kept as API parity with the reference
    @staticmethod
    def open_video(video_source: str | int):
        return _Capture(video_source, per_access=False).get()

    def _get_cap(self):
        return self._capture.get()

    def get_fps(self) -> float:
        return self._get_cap().get(cv2.CAP_PROP_FPS)

    def _decode(self, ok: bool, raw) -> Any:
        if not ok:
            raise RuntimeError("Failed to read frame.")
        if self.color_order == "rgb":
            raw = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        frame = np.moveaxis(raw, -1, self.channel_dim)
        return frame if self.transform is None else self.transform(frame)

    def get_frame(self) -> Any:
        return self._decode(*self._get_cap().read())


class VideoFileDataset(VideoDataset):
    """Indexed access to the frames of a video file (reference: video_dataset.py:154)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        available = self.get_num_frames()
        self.max_num_frames = available if self.max_num_frames is None else min(
            self.max_num_frames, available)

    @staticmethod
    def get_available_codecs() -> dict[str, str]:
        """Probe which fourcc codecs this OpenCV build can write."""
        if not has_cv2:
            return {}
        candidates = {"mp4v": ".mp4", "X264": ".avi", "H264": ".mp4", "MP42": ".mp4",
                      "MJPG": ".mjpeg", "DIVX": ".avi"}
        usable: dict[str, str] = {}
        with tempfile.TemporaryDirectory() as tmp:
            for codec, ext in candidates.items():
                writer = cv2.VideoWriter()
                try:
                    if writer.open(os.path.join(tmp, f"probe{ext}"),
                                   cv2.VideoWriter_fourcc(*codec), 1, (10, 10)):
                        usable[codec] = ext
                finally:
                    writer.release()
        return usable

    def get_num_frames(self) -> int:
        count = int(self._get_cap().get(cv2.CAP_PROP_FRAME_COUNT))
        if count == 0:
            raise RuntimeError("0 frames found")
        return count

    def __len__(self) -> int:
        return self.max_num_frames

    def __getitem__(self, index: int):
        if self.max_num_frames is not None and index >= self.max_num_frames:
            raise IndexError
        cap = self._get_cap()
        cap.set(cv2.CAP_PROP_POS_FRAMES, index)
        return self._decode(*cap.read())


class CameraDataset(IterableDataset, VideoDataset):
    """Iterate frames from a capture device (reference: video_dataset.py:212)."""

    def __init__(self, video_source: int, transform: Callable | None = None,
                 max_num_frames: int | None = None, color_order: str = "rgb",
                 multiprocessing: bool = False, channel_dim: int = 0):
        VideoDataset.__init__(self, video_source, transform, max_num_frames, color_order,
                              multiprocessing, channel_dim)
        IterableDataset.__init__(self, data=None, transform=None)  # type: ignore

    @staticmethod
    def get_num_devices() -> int:
        """Count consecutive readable capture devices starting at index 0."""
        if not has_cv2:
            return 0
        device = 0
        while True:
            cap = cv2.VideoCapture(device)
            readable = cap.read()[0]
            cap.release()
            if not readable:
                return device
            device += 1

    def __iter__(self) -> Iterator:
        produced = 0
        while self.max_num_frames is None or produced < self.max_num_frames:
            try:
                yield self.get_frame()
            except RuntimeError:
                return
            produced += 1


class SuppressStderr:
    """Context manager silencing OS-level stderr — OpenCV backends are noisy
    (reference: data/video_dataset.py:43)."""

    def __enter__(self):
        import sys

        self._devnull = open(os.devnull, "w")
        self._old_fd = os.dup(sys.stderr.fileno())
        self._stderr_fileno = sys.stderr.fileno()
        self._old_stderr = sys.stderr
        os.dup2(self._devnull.fileno(), self._stderr_fileno)
        sys.stderr = self._devnull
        return self

    def __exit__(self, *_):
        import sys

        os.dup2(self._old_fd, self._stderr_fileno)
        os.close(self._old_fd)
        sys.stderr = self._old_stderr
        self._devnull.close()


__all__ += ["SuppressStderr"]


def import_cv():
    """(Re-)import cv2 lazily — avoids webcam side effects at package import
    (reference: video_dataset.py:36)."""
    global cv2, has_cv2
    cv2, has_cv2 = optional_import("cv2")
