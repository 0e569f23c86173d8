"""Visualization helpers (reference: monai/visualize/utils.py blend_images, matshow3d)."""
from __future__ import annotations

from typing import Any

import numpy as np

from ..utils.backend import to_numpy

__all__ = ["blend_images", "matshow3d"]


def _hsv_to_rgb(h, s, v):
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(int) % 6
    out = np.zeros(h.shape + (3,), dtype=np.float32)
    conds = [(i == k) for k in range(6)]
    combos = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    for cond, (r_, g_, b_) in zip(conds, combos):
        out[..., 0] = np.where(cond, r_, out[..., 0])
        out[..., 1] = np.where(cond, g_, out[..., 1])
        out[..., 2] = np.where(cond, b_, out[..., 2])
    return out


def blend_images(image: Any, label: Any, alpha: float = 0.5, cmap: str = "hsv",
                 rescale_arrays: bool = True, transparent_background: bool = True):
    """Blend an image with a label map into an RGB overlay (reference: visualize/utils.py)."""
    image = to_numpy(image.data if hasattr(image, "data") and not isinstance(image, np.ndarray) else image)
    label = to_numpy(label.data if hasattr(label, "data") and not isinstance(label, np.ndarray) else label)
    if image.shape[0] not in (1, 3):
        raise ValueError("Image should be 1 or 3 channel.")
    if label.shape[0] != 1:
        raise ValueError("Label should be 1 channel.")
    if image.shape[1:] != label.shape[1:]:
        raise ValueError("image and label should have matching spatial sizes.")
    if rescale_arrays:
        rng_i = image.max() - image.min()
        image = (image - image.min()) / max(rng_i, 1e-12)
        rng_l = label.max() - label.min()
        label = (label - label.min()) / max(rng_l, 1e-12)
    if image.shape[0] == 1:
        image = np.repeat(image, 3, axis=0)
    if cmap == "hsv":
        label_rgb = np.moveaxis(_hsv_to_rgb(label[0], np.ones_like(label[0]), np.ones_like(label[0])),
                                -1, 0)
    else:
        label_rgb = np.repeat(label, 3, axis=0)
    w_label = np.where(label[0:1] > 0, alpha, 0.0 if transparent_background else alpha)
    return (1 - w_label) * image + w_label * label_rgb


def matshow3d(volume: Any, fig=None, title: str | None = None, figsize=(10, 10), frames_per_row=None,
              frame_dim: int = -3, channel_dim: int | None = None, vmin=None, vmax=None,
              every_n: int = 1, interpolation: str = "none", show: bool = False, fill_value=np.nan,
              margin: int = 1, dtype=np.float32, **kwargs):
    """Tile a 3D volume into a 2D montage (reference: visualize/utils.py matshow3d).

    Returns (fig, montage_array); fig is None when matplotlib is unavailable.
    """
    vol = to_numpy(volume.data if hasattr(volume, "data") and not isinstance(volume, np.ndarray)
                   else volume).astype(dtype)
    if channel_dim is not None:
        if channel_dim not in (0, 1) or vol.shape[channel_dim] not in (1, 3):
            raise ValueError("channel_dim must be: None, 0 or 1, and channels of 1 or 3.")
    if isinstance(vol, (list, tuple)):
        vol = np.concatenate([v[None] for v in vol], axis=0)
    while len(vol.shape) < 3:
        vol = np.expand_dims(vol, 0)
    if len(vol.shape) > 3:
        # move frame_dim to front, flatten leading dims
        vol = np.moveaxis(vol, frame_dim, 0)
        vol = vol.reshape((-1,) + vol.shape[-2:])
    vmin = np.nanmin(vol) if vmin is None else vmin
    vmax = np.nanmax(vol) if vmax is None else vmax
    vol = vol[::every_n]
    n = vol.shape[0]
    cols = frames_per_row or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = vol.shape[1:]
    montage = np.full((rows * (h + margin), cols * (w + margin)), fill_value, dtype=dtype)
    for i in range(n):
        r, c = divmod(i, cols)
        montage[r * (h + margin): r * (h + margin) + h, c * (w + margin): c * (w + margin) + w] = vol[i]
    fig_out = None
    try:
        import matplotlib.pyplot as plt

        fig_out = fig if fig is not None else plt.figure(figsize=figsize)
        ax = fig_out.gca()
        ax.matshow(montage, vmin=vmin, vmax=vmax, interpolation=interpolation, **kwargs)
        ax.axis("off")
        if title is not None:
            ax.set_title(title)
        if show:
            plt.show()
    except ImportError:
        pass
    return fig_out, montage
