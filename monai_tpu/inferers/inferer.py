"""Inferer classes (reference: monai/inferers/inferer.py:62 Inferer ABC, :373 SimpleInferer,
:399 SlidingWindowInferer, :555 SlidingWindowInfererAdapt, :691 SliceInferer)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Callable, Sequence
from typing import Any

import jax.numpy as jnp

from ..utils.enums import BlendMode
from .utils import sliding_window_inference

__all__ = ["Inferer", "SimpleInferer", "SlidingWindowInferer", "SlidingWindowInfererAdapt",
           "SliceInferer"]


class Inferer(ABC):
    """Inference execution strategy (reference: inferer.py:62)."""

    @abstractmethod
    def __call__(self, inputs: Any, network: Callable, *args, **kwargs):
        raise NotImplementedError(f"Subclass {self.__class__.__name__} must implement this method.")


class SimpleInferer(Inferer):
    """forward(inputs) (reference: inferer.py:373)."""

    def __call__(self, inputs: Any, network: Callable, *args, **kwargs):
        return network(inputs, *args, **kwargs)


class SlidingWindowInferer(Inferer):
    """Window-batched sliding-window inference (reference: inferer.py:399)."""

    def __init__(self, roi_size: Sequence[int] | int, sw_batch_size: int = 1,
                 overlap: Sequence[float] | float = 0.25, mode: str = BlendMode.CONSTANT,
                 sigma_scale: Sequence[float] | float = 0.125, padding_mode: str = "constant",
                 cval: float = 0.0, sw_device=None, device=None, progress: bool = False,
                 cache_roi_weight_map: bool = False, cpu_thresh: int | None = None,
                 buffer_steps: int | None = None, buffer_dim: int = -1):
        self.roi_size = roi_size
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.mode = mode
        self.sigma_scale = sigma_scale
        self.padding_mode = padding_mode
        self.cval = cval
        self.sw_device = sw_device
        self.device = device
        self.progress = progress
        self.roi_weight_map = None
        self.buffer_steps = buffer_steps
        self.buffer_dim = buffer_dim

    def __call__(self, inputs: Any, network: Callable, *args, **kwargs):
        # all named params passed POSITIONALLY so extra *args land in
        # sliding_window_inference's own *args instead of colliding with
        # `overlap` (the reference's inferer.py:507 does the same)
        return sliding_window_inference(
            inputs, self.roi_size, self.sw_batch_size, network,
            self.overlap, self.mode, self.sigma_scale, self.padding_mode, self.cval,
            self.sw_device, self.device, self.progress, self.roi_weight_map,
            None, self.buffer_steps, self.buffer_dim, *args, **kwargs)


def _is_oom(exc: BaseException) -> bool:
    msg = str(exc)
    return ("RESOURCE_EXHAUSTED" in msg or "Resource exhausted" in msg
            or "out of memory" in msg.lower() or "OutOfMemory" in msg)


class SlidingWindowInfererAdapt(SlidingWindowInferer):
    """OOM-adaptive sliding-window inference (reference: inferer.py:555
    SlidingWindowInfererAdapt auto-falls-back to CPU stitching on CUDA OOM).

    TPU analog: on RESOURCE_EXHAUSTED from the single-program stitch, halve
    ``sw_batch_size`` (smaller window batch = smaller live window/pred buffers and
    a smaller compiled program) and retry; once at ``sw_batch_size == 1`` a final
    failure falls back to host stitching — each window batch still runs on device,
    but the (potentially huge) stitched output accumulates in host RAM, the same
    memory trade the reference makes when it moves stitching to CPU.

    The adapted ``sw_batch_size`` persists on the instance so subsequent volumes
    skip the failed sizes (reference behavior; its CPU flag persists too).
    """

    def __call__(self, inputs: Any, network: Callable, *args, **kwargs):
        import jax

        from ..data.meta_image import MetaImage

        while True:
            try:
                out = super().__call__(inputs, network, *args, **kwargs)
                # JAX dispatch is asynchronous: a RESOURCE_EXHAUSTED from the
                # stitch program surfaces at block_until_ready, not at the call.
                # Force completion HERE so the adaptation loop actually sees the
                # OOM (the r3 bench failure mode: the error escaped to the
                # caller's first device_get and no halving ever happened).
                jax.block_until_ready(out.data if isinstance(out, MetaImage) else out)
                return out
            except Exception as e:  # jax errors don't share one base class
                if not _is_oom(e):
                    raise
                # drop compiled executables + dead buffers from the failed attempt
                # BEFORE retrying: a failed scan program's allocations otherwise
                # stay pinned by the jit cache and every retry inherits a nearly
                # full HBM arena (observed: device_put of a KB-sized constant
                # RESOURCE_EXHAUSTED-ing after one failed sw_batch=9 attempt).
                import gc

                jax.clear_caches()
                gc.collect()
                if self.sw_batch_size > 1:
                    self.sw_batch_size = max(1, self.sw_batch_size // 2)
                    continue
                return self._host_stitch(inputs, network, *args, **kwargs)

    def _host_stitch(self, inputs: Any, network: Callable, *args, **kwargs):
        """Device window forwards + numpy accumulation (single-array outputs)."""
        import jax
        import numpy as np
        from flax import nnx

        from ..data.meta_image import MetaImage
        from ..data.utils import compute_importance_map, dense_patch_slices
        from ..utils.backend import to_jax
        from ..utils.misc import ensure_tuple_rep, fall_back_tuple
        from .utils import compute_scan_interval

        is_meta = isinstance(inputs, MetaImage)
        x = to_jax(inputs.data if is_meta else inputs)
        nsd = x.ndim - 2
        roi = fall_back_tuple(self.roi_size, x.shape[2:])
        overlap = ensure_tuple_rep(self.overlap, nsd)
        image_size = x.shape[2:]
        if any(roi[d] > image_size[d] for d in range(nsd)):
            raise NotImplementedError("host-stitch fallback requires roi <= image size")
        interval = compute_scan_interval(image_size, roi, nsd, overlap)
        slices = dense_patch_slices(image_size, roi, interval)
        imp = np.asarray(compute_importance_map(roi, mode=self.mode,
                                                sigma_scale=self.sigma_scale,
                                                dtype=np.float32))
        if isinstance(network, nnx.Module):
            graphdef, state = nnx.split(network)
            fwd = jax.jit(lambda s, w: nnx.merge(graphdef, s)(w, *args, **kwargs))
            call = lambda w: fwd(state, w)  # noqa: E731
        else:
            fwd = jax.jit(lambda w: network(w, *args, **kwargs))
            call = fwd
        out_np = None
        count = np.zeros((1, 1) + tuple(image_size), np.float32)
        for sl in slices:
            win = jax.lax.slice(x, (0, 0) + tuple(s.start for s in sl),
                                (x.shape[0], x.shape[1]) + tuple(s.stop for s in sl))
            pred = np.asarray(call(win), dtype=np.float32)
            if pred.shape[2:] != tuple(roi):
                raise NotImplementedError("host-stitch fallback requires output roi == input roi")
            if out_np is None:
                out_np = np.zeros((x.shape[0], pred.shape[1]) + tuple(image_size), np.float32)
            idx = (slice(None), slice(None)) + tuple(sl)
            out_np[idx] += pred * imp[None, None]
            count[(slice(0, 1), slice(0, 1)) + tuple(sl)] += imp[None, None]
        out_np /= np.maximum(count, 1e-8)
        # host stitching means the stitched output LIVES on host — moving it back
        # to device here defeats the fallback (and OOMed in practice). Callers get
        # numpy; downstream post-transforms accept either backend.
        if is_meta:
            out_m = inputs.new_like(out_np)
            out_m.is_batch = inputs.is_batch
            return out_m
        return out_np


class SliceInferer(SlidingWindowInferer):
    """Run a 2D network over a 3D volume slice-wise (reference: inferer.py:691)."""

    def __init__(self, spatial_dim: int = 0, *args, **kwargs):
        self.spatial_dim = spatial_dim
        super().__init__(*args, **kwargs)
        self.orig_roi_size = self.roi_size
        self._wrapper_cache: dict = {}

    def __call__(self, inputs: Any, network: Callable, *args, **kwargs):
        if self.spatial_dim > 2:
            raise ValueError("`spatial_dim` can only be `0, 1, 2` with `[H, W, D]` respectively.")
        if inputs.ndim != 5:
            raise RuntimeError("SliceInferer is designed for 3D inputs with shape (B, C, H, W, D).")
        from ..utils.misc import ensure_tuple_rep

        self.orig_roi_size = ensure_tuple_rep(self.orig_roi_size, 2) if not isinstance(self.orig_roi_size, (list, tuple)) else self.orig_roi_size
        roi = list(self.orig_roi_size)
        roi.insert(self.spatial_dim, 1)
        self.roi_size = tuple(roi)

        # reuse the wrapper for a given network so sliding_window_inference's
        # id(predictor)-keyed jit cache can hit across calls
        wrap_key = (id(network), self.spatial_dim)
        network_wrapper = self._wrapper_cache.get(wrap_key)
        if network_wrapper is None:
            def network_wrapper(x, *a, **kw):
                xs = jnp.squeeze(x, axis=self.spatial_dim + 2)
                out = network(xs, *a, **kw)
                return jnp.expand_dims(out, axis=self.spatial_dim + 2)

            self._wrapper_cache.clear()
            self._wrapper_cache[wrap_key] = network_wrapper

        return super().__call__(inputs, network_wrapper, *args, **kwargs)


class SaliencyInferer(Inferer):
    """Inference producing class-activation maps (reference: inferer.py:644).

    In this framework CAMs are computed functionally (visualize/class_activation_maps.py)
    from a feature function and a head function rather than by hooking named layers.
    ``network`` passed at call time must expose ``feature_fn``/``head_fn`` attributes or
    be a (feature_fn, head_fn) tuple.
    """

    def __init__(self, cam_name: str, target_layers: str = "", class_idx: int | None = None,
                 *args, **kwargs):
        if cam_name.lower() not in ("cam", "gradcam", "gradcampp"):
            raise ValueError("cam_name should be: 'CAM', 'GradCAM' or 'GradCAMpp'.")
        self.cam_name = cam_name.lower()
        self.target_layers = target_layers
        self.class_idx = class_idx
        self.args = args
        self.kwargs = kwargs

    def __call__(self, inputs: Any, network: Any, *args, **kwargs):
        from ..visualize.class_activation_maps import CAM, GradCAM, GradCAMpp

        if isinstance(network, tuple):
            feature_fn, head_fn = network
        else:
            feature_fn, head_fn = network.feature_fn, network.head_fn
        cls = {"cam": CAM, "gradcam": GradCAM, "gradcampp": GradCAMpp}[self.cam_name]
        cam = cls(feature_fn, head_fn, *self.args, **self.kwargs)
        return cam(inputs, self.class_idx, *args, **kwargs)
