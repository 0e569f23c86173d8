"""Engine helpers (reference: monai/engines/utils.py:152-293 PrepareBatch*)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Callable, Mapping, Sequence
from typing import Any

import numpy as np

from ..data.meta_image import MetaImage
from ..utils.backend import to_jax
from ..utils.enums import CommonKeys

__all__ = ["IterationEvents", "get_devices_spec", "default_prepare_batch", "PrepareBatch",
           "PrepareBatchDefault", "PrepareBatchExtraInput", "DiffusionPrepareBatch",
           "VPredictionPrepareBatch", "default_metric_cmp_fn",
           "default_make_latent", "engine_apply_transform"]

from .events import IterationEvents  # noqa: F401 (re-export, reference keeps it here)


def get_devices_spec(devices=None) -> list:
    import jax

    return list(jax.devices()) if devices is None else list(devices)


def default_metric_cmp_fn(current_metric: float, prev_best: float) -> bool:
    return current_metric > prev_best


def default_prepare_batch(batchdata, device=None, non_blocking: bool = False, **kwargs):
    """Extract (image, label) and move to device (reference: engines/utils.py:172)."""
    if not isinstance(batchdata, dict):
        if isinstance(batchdata, (tuple, list)) and len(batchdata) >= 2:
            img, lab = batchdata[0], batchdata[1]
            return _to_dev(img, device), _to_dev(lab, device)
        return _to_dev(batchdata, device), None
    if CommonKeys.LABEL in batchdata:
        return _to_dev(batchdata[CommonKeys.IMAGE], device), _to_dev(batchdata[CommonKeys.LABEL], device)
    if GanKeys_REALS in batchdata:
        return _to_dev(batchdata[GanKeys_REALS], device), None
    return _to_dev(batchdata[CommonKeys.IMAGE], device), None


GanKeys_REALS = "reals"


def _to_dev(x, device):
    import jax

    if x is None:
        return None
    arr = x.data if isinstance(x, MetaImage) else x
    out = to_jax(arr)
    if device is not None:
        out = jax.device_put(out, device)
    if isinstance(x, MetaImage):
        # keep the metadata (affine + applied_operations) riding alongside the device
        # array: Invertd and SaveImaged downstream need the recorded transform trace
        # (the reference moves MetaTensors to device intact, trainer.py prepare_batch)
        return x.new_like(out)
    return out


class PrepareBatch(ABC):
    """Batch preparation protocol (reference: engines/utils.py:152)."""

    @abstractmethod
    def __call__(self, batchdata, device=None, non_blocking: bool = False, **kwargs):
        raise NotImplementedError


class PrepareBatchDefault(PrepareBatch):
    def __call__(self, batchdata, device=None, non_blocking: bool = False, **kwargs):
        return default_prepare_batch(batchdata, device, non_blocking, **kwargs)


class PrepareBatchExtraInput(PrepareBatch):
    """Pass extra keys as network args (reference: engines/utils.py:—)."""

    def __init__(self, extra_keys):
        self.extra_keys = extra_keys

    def __call__(self, batchdata, device=None, non_blocking: bool = False, **kwargs):
        image, label = default_prepare_batch(batchdata, device, non_blocking, **kwargs)
        args_, kwargs_ = [], {}
        if isinstance(self.extra_keys, (str,)):
            args_ = [_to_dev(batchdata[self.extra_keys], device)]
        elif isinstance(self.extra_keys, (list, tuple)):
            args_ = [_to_dev(batchdata[k], device) for k in self.extra_keys]
        elif isinstance(self.extra_keys, dict):
            kwargs_ = {k: _to_dev(batchdata[v], device) for k, v in self.extra_keys.items()}
        return image, label, tuple(args_), kwargs_


def default_make_latent(num_latents: int, latent_size: int, device=None, non_blocking: bool = False,
                        **kwargs):
    import jax

    return jax.random.normal(jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)),
                             (num_latents, latent_size))


def engine_apply_transform(batch: Any, output: Any, transform: Callable):
    """Apply transform to engine batch+output pairs (reference: engines/utils.py:—)."""
    from ..transforms.transform import apply_transform

    if isinstance(batch, dict) and isinstance(output, dict):
        data = dict(batch)
        data.update(output)
        transformed_data = apply_transform(transform, data, map_items=False)
        if not isinstance(transformed_data, dict):
            raise AssertionError("With a dict supplied to apply_transform a single dict return is expected.")
        for k, v in transformed_data.items():
            if k in batch:
                batch[k] = v
            if k in output:
                output[k] = v
    else:
        output = apply_transform(transform, output, map_items=False)
    return batch, output


class DiffusionPrepareBatch(PrepareBatch):
    """Generate (image, noise-target) pairs + "noise"/"timesteps" kwargs for diffusion
    training engines (reference: engines/utils.py:243)."""

    def __init__(self, num_train_timesteps: int, condition_name: str | None = None,
                 seed: int = 0):
        self.condition_name = condition_name
        self.num_train_timesteps = num_train_timesteps
        import jax

        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def get_noise(self, images):
        import jax

        return jax.random.normal(self._next_key(), images.shape, images.dtype)

    def get_timesteps(self, images):
        import jax

        return jax.random.randint(self._next_key(), (images.shape[0],), 0,
                                  self.num_train_timesteps)

    def get_target(self, images, noise, timesteps):
        return noise

    def __call__(self, batchdata: dict, device=None, non_blocking: bool = False, **kwargs):
        import jax.numpy as jnp

        from ..utils.backend import to_jax

        images = to_jax(batchdata["image"])
        noise = self.get_noise(images)
        timesteps = self.get_timesteps(images)
        target = self.get_target(images, noise, timesteps)
        infer_kwargs = {"noise": noise, "timesteps": timesteps}
        if self.condition_name is not None and isinstance(batchdata, dict):
            infer_kwargs["condition"] = to_jax(batchdata[self.condition_name])
        return images, target, (), infer_kwargs


class VPredictionPrepareBatch(DiffusionPrepareBatch):
    """v-prediction target variant (reference: engines/utils.py:293)."""

    def __init__(self, scheduler, num_train_timesteps: int,
                 condition_name: str | None = None, seed: int = 0):
        super().__init__(num_train_timesteps, condition_name, seed)
        self.scheduler = scheduler

    def get_target(self, images, noise, timesteps):
        return self.scheduler.get_velocity(images, noise, timesteps)
