"""Animated-GIF TensorBoard summaries for 3D volumes
(reference: monai/visualize/img2tensorboard.py:42-210).

Torch-free: inputs are numpy/jax arrays; GIF frames are encoded with PIL and
wrapped in TensorBoard ``Summary`` protos directly.
"""
from __future__ import annotations

import numpy as np

from ..utils.module import optional_import

PIL, _has_pil = optional_import("PIL")
GifImage, _ = optional_import("PIL.GifImagePlugin", name="Image")
Summary, _has_tb = optional_import("tensorboard.compat.proto.summary_pb2", name="Summary")
SummaryX, _has_tbx_proto = optional_import("tensorboardX.proto.summary_pb2", name="Summary")
SummaryWriterX, has_tensorboardx = optional_import("tensorboardX", name="SummaryWriter")

__all__ = ["make_animated_gif_summary", "add_animated_gif", "plot_2d_or_3d_image"]


def _rescale(arr: np.ndarray, lo: float, hi: float) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float32)
    mn, mx = float(arr.min()), float(arr.max())
    if mx == mn:
        return np.full_like(arr, lo)
    return (arr - mn) / (mx - mn) * (hi - lo) + lo


def _encode_gif(frames: list[np.ndarray]) -> bytes:
    """Concatenate per-frame GIF blocks into one animated-GIF byte string
    (reference: img2tensorboard.py:_image3_animated_gif)."""
    ims = [GifImage.fromarray(f) for f in frames]
    img_str = b""
    for b_data in PIL.GifImagePlugin.getheader(ims[0])[0]:
        img_str += b_data
    # Netscape looping extension
    img_str += b"\x21\xff\x0b\x4e\x45\x54\x53\x43\x41\x50" b"\x45\x32\x2e\x30\x03\x01\x00\x00\x00"
    for im in ims:
        for b_data in PIL.GifImagePlugin.getdata(im):
            img_str += b_data
    return img_str + b"\x3b"


def _image3_animated_gif(tag: str, image, writer, frame_dim: int = 0,
                         scale_factor: float = 1.0):
    """3D `HWD` array -> one GIF Summary proto."""
    image_np = np.asarray(image)
    if image_np.ndim != 3:
        raise AssertionError("3D image tensors expected to be in `HWD` format")
    frames = [(f * scale_factor).astype(np.uint8, copy=False)
              for f in np.moveaxis(image_np, frame_dim, 0)]
    img_str = _encode_gif(frames)
    summary = SummaryX if has_tensorboardx and isinstance(writer, SummaryWriterX) else Summary
    img = summary.Image(height=10, width=10, colorspace=1, encoded_image_string=img_str)
    return summary(value=[summary.Value(tag=tag, image=img)])


def make_animated_gif_summary(tag: str, image, writer=None, max_out: int = 3,
                              frame_dim: int = -3, scale_factor: float = 1.0) -> list:
    """`CHWD` array -> list of per-channel GIF Summary protos
    (reference: img2tensorboard.py:80)."""
    suffix = "/image" if max_out == 1 else "/image/{}"
    frame_dim = frame_dim - 1 if frame_dim > 0 else frame_dim  # channel dim removed below
    image_np = np.asarray(image)
    return [
        _image3_animated_gif(tag + suffix.format(i), image_np[i], writer, frame_dim, scale_factor)
        for i in range(min(max_out, image_np.shape[0]))
    ]


def add_animated_gif(writer, tag: str, image_tensor, max_out: int = 3, frame_dim: int = -3,
                     scale_factor: float = 1.0, global_step: int | None = None) -> None:
    """Write an animated GIF of a `CHWD` array to a SummaryWriter
    (reference: img2tensorboard.py:116)."""
    for s in make_animated_gif_summary(tag, image_tensor, writer, max_out, frame_dim,
                                       scale_factor):
        writer._get_file_writer().add_summary(s, global_step)


def plot_2d_or_3d_image(data, step: int, writer, index: int = 0, max_channels: int = 1,
                        frame_dim: int = -3, max_frames: int = 24, tag: str = "output") -> None:
    """Plot `NCHW[D]` data (or list of `CHW[D]`): 2D as images, 3D as GIFs
    (reference: img2tensorboard.py:146)."""
    d = np.asarray(data[index])
    frame_dim = frame_dim - 1 if frame_dim > 0 else frame_dim

    if d.ndim == 2:
        writer.add_image(f"{tag}_HW", _rescale(d, 0, 1), step, dataformats="HW")
        return
    if d.ndim == 3:
        if d.shape[0] == 3 and max_channels == 3:  # RGB
            writer.add_image(f"{tag}_CHW", d, step, dataformats="CHW")
            return
        for j, d2 in enumerate(d[:max_channels]):
            writer.add_image(f"{tag}_HW_{j}", _rescale(d2, 0, 1), step, dataformats="HW")
        return
    # >= 4D: flatten leading dims onto channels, one GIF per channel
    spatial = d.shape[-3:]
    d = d.reshape([-1] + list(spatial))
    if d.shape[0] == 3 and max_channels == 3 and has_tensorboardx and \
            isinstance(writer, SummaryWriterX):  # RGB video
        d = np.moveaxis(d, frame_dim, -1)
        writer.add_video(tag, d[None], step, fps=max_frames, dataformats="NCHWT")
        return
    max_channels = min(max_channels, d.shape[0])
    d = np.stack([_rescale(i, 0, 255) for i in d[:max_channels]], axis=0)
    add_animated_gif(writer, f"{tag}_HWD", d, max_out=max_channels, frame_dim=frame_dim,
                     global_step=step)
