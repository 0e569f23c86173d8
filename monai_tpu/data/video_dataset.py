"""Video datasets backed by OpenCV (reference: monai/data/video_dataset.py:62
VideoDataset, :154 VideoFileDataset, :212 CameraDataset)."""
from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np

from ..utils.module import optional_import
from .iterable_dataset import IterableDataset

cv2, has_cv2 = optional_import("cv2")

__all__ = ["VideoDataset", "VideoFileDataset", "CameraDataset"]


class VideoDataset:
    """(reference: video_dataset.py:62)."""

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
        if not multiprocessing:
            self.cap = self.open_video(video_source)
        self.transform = transform
        self.max_num_frames = max_num_frames

    @staticmethod
    def open_video(video_source: str | int):
        if isinstance(video_source, str) and not os.path.isfile(video_source):
            raise RuntimeError("Video file does not exist: " + video_source)
        cap = cv2.VideoCapture(video_source)
        if not cap.isOpened():
            raise RuntimeError(f"Failed to open video: {video_source}")
        return cap

    def _get_cap(self):
        return self.open_video(self.video_source) if self.multiprocessing else self.cap

    def get_fps(self) -> float:
        return self._get_cap().get(cv2.CAP_PROP_FPS)

    def get_frame(self) -> Any:
        ret, frame = self._get_cap().read()
        if not ret:
            raise RuntimeError("Failed to read frame.")
        if self.color_order == "rgb":
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        frame = np.moveaxis(frame, -1, self.channel_dim)
        return self.transform(frame) if self.transform is not None else frame


class VideoFileDataset(VideoDataset):
    """Indexed access to the frames of a video file (reference: video_dataset.py:154)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        num_frames = self.get_num_frames()
        if self.max_num_frames is None or num_frames < self.max_num_frames:
            self.max_num_frames = num_frames

    @staticmethod
    def get_available_codecs() -> dict[str, str]:
        if not has_cv2:
            return {}
        all_codecs = {"mp4v": ".mp4", "X264": ".avi", "H264": ".mp4", "MP42": ".mp4",
                      "MJPG": ".mjpeg", "DIVX": ".avi"}
        codecs = {}
        with tempfile.TemporaryDirectory() as tmp:
            for codec, ext in all_codecs.items():
                writer = cv2.VideoWriter()
                fourcc = cv2.VideoWriter_fourcc(*codec)
                ok = writer.open(os.path.join(tmp, f"test{ext}"), fourcc, 1, (10, 10))
                if ok:
                    codecs[codec] = ext
                writer.release()
        return codecs

    def get_num_frames(self) -> int:
        n = int(self._get_cap().get(cv2.CAP_PROP_FRAME_COUNT))
        if n == 0:
            raise RuntimeError("0 frames found")
        return n

    def __len__(self):
        return self.max_num_frames

    def __getitem__(self, index: int):
        if self.max_num_frames is not None and index >= self.max_num_frames:
            raise IndexError
        self._get_cap().set(cv2.CAP_PROP_POS_FRAMES, index)
        return self.get_frame()


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
        if not has_cv2:
            return 0
        n = 0
        while True:
            cap = cv2.VideoCapture(n)
            if not cap.read()[0]:
                cap.release()
                break
            n += 1
            cap.release()
        return n

    def __iter__(self):
        frame_count = 0
        while True:
            if self.max_num_frames is not None and frame_count >= self.max_num_frames:
                return
            try:
                frame = self.get_frame()
            except RuntimeError:
                return
            frame_count += 1
            yield frame
