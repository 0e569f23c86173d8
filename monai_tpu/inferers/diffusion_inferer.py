"""Diffusion inferers (reference: monai/inferers/inferer.py:774 DiffusionInferer,
:1102 LatentDiffusionInferer, :1324 ControlNetDiffusionInferer, :1920
VQVAETransformerInferer)."""
from __future__ import annotations

import math
from collections.abc import Callable, Sequence
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..networks.schedulers.scheduler import Scheduler
from .inferer import Inferer

__all__ = ["DiffusionInferer", "LatentDiffusionInferer", "ControlNetDiffusionInferer"]


class DiffusionInferer(Inferer):
    """Train-step noise prediction + sampling loops (reference: inferer.py:774)."""

    def __init__(self, scheduler: Scheduler):
        Inferer.__init__(self)
        self.scheduler = scheduler

    def __call__(self, inputs: jnp.ndarray, diffusion_model: Callable, noise: jnp.ndarray,
                 timesteps: jnp.ndarray, condition: jnp.ndarray | None = None, mode: str = "crossattn",
                 seg: jnp.ndarray | None = None):
        """Predict noise for a training step (reference: inferer.py __call__)."""
        if mode not in ["crossattn", "concat"]:
            raise NotImplementedError(f"{mode} condition is not supported")
        noisy_image = self.scheduler.add_noise(original_samples=inputs, noise=noise, timesteps=timesteps)
        if mode == "concat" and condition is not None:
            noisy_image = jnp.concatenate([noisy_image, condition], axis=1)
            condition = None
        return diffusion_model(noisy_image, timesteps=timesteps, context=condition)

    def sample(self, input_noise: jnp.ndarray, diffusion_model: Callable,
               scheduler: Scheduler | None = None, save_intermediates: bool = False,
               intermediate_steps: int = 100, conditioning: jnp.ndarray | None = None,
               mode: str = "crossattn", verbose: bool = False, seg: jnp.ndarray | None = None,
               key=None):
        """Full reverse-diffusion sampling loop (reference: inferer.py sample)."""
        if mode not in ["crossattn", "concat"]:
            raise NotImplementedError(f"{mode} condition is not supported")
        scheduler = scheduler or self.scheduler
        key = jax.random.PRNGKey(0) if key is None else key
        image = input_noise
        intermediates = []
        timesteps = np.asarray(scheduler.timesteps)
        for i, t in enumerate(timesteps):
            t_int = int(t)
            model_input = image
            ctx = conditioning
            if mode == "concat" and conditioning is not None:
                model_input = jnp.concatenate([image, conditioning], axis=1)
                ctx = None
            model_output = diffusion_model(model_input,
                                           timesteps=jnp.full((image.shape[0],), t_int), context=ctx)
            key, sub = jax.random.split(key)
            image, _ = scheduler.step(model_output, t_int, image, key=sub) \
                if "key" in scheduler.step.__code__.co_varnames else scheduler.step(model_output, t_int, image)
            if save_intermediates and i % intermediate_steps == 0:
                intermediates.append(image)
        if save_intermediates:
            return image, intermediates
        return image

    def get_likelihood(self, inputs: jnp.ndarray, diffusion_model: Callable,
                       scheduler: Scheduler | None = None, save_intermediates: bool = False,
                       conditioning: jnp.ndarray | None = None, mode: str = "crossattn",
                       original_input_range=(0, 255), scaled_input_range=(0, 1),
                       verbose: bool = False):
        """ELBO-style log-likelihood accumulation (reference: inferer.py get_likelihood)."""
        scheduler = scheduler or self.scheduler
        total_kl = jnp.zeros(inputs.shape[0])
        timesteps = np.asarray(scheduler.timesteps)
        key = jax.random.PRNGKey(0)
        for t in timesteps:
            t_int = int(t)
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, inputs.shape, dtype=inputs.dtype)
            ts = jnp.full((inputs.shape[0],), t_int)
            noisy = scheduler.add_noise(inputs, noise, ts)
            model_input = noisy
            ctx = conditioning
            if mode == "concat" and conditioning is not None:
                model_input = jnp.concatenate([noisy, conditioning], axis=1)
                ctx = None
            pred = diffusion_model(model_input, timesteps=ts, context=ctx)
            mse = jnp.mean((pred - noise) ** 2, axis=tuple(range(1, inputs.ndim)))
            total_kl = total_kl + mse
        return -total_kl  # higher is better


class LatentDiffusionInferer(DiffusionInferer):
    """Diffusion in a first-stage latent space (reference: inferer.py:1102)."""

    def __init__(self, scheduler: Scheduler, scale_factor: float = 1.0, ldm_latent_shape=None,
                 autoencoder_latent_shape=None):
        super().__init__(scheduler)
        self.scale_factor = scale_factor

    def __call__(self, inputs: jnp.ndarray, autoencoder_model, diffusion_model: Callable,
                 noise: jnp.ndarray, timesteps: jnp.ndarray, condition=None, mode: str = "crossattn",
                 seg=None):
        latent = autoencoder_model.encode_stage_2_inputs(inputs) * self.scale_factor
        return super().__call__(latent, diffusion_model, noise, timesteps, condition, mode, seg)

    def sample(self, input_noise: jnp.ndarray, autoencoder_model=None, diffusion_model: Callable = None,
               scheduler: Scheduler | None = None, save_intermediates: bool = False,
               intermediate_steps: int = 100, conditioning=None, mode: str = "crossattn",
               verbose: bool = False, seg=None, key=None):
        out = super().sample(input_noise, diffusion_model, scheduler, save_intermediates,
                             intermediate_steps, conditioning, mode, verbose, seg, key)
        if save_intermediates:
            latent, latent_intermediates = out
            image = autoencoder_model.decode_stage_2_outputs(latent / self.scale_factor)
            intermediates = [autoencoder_model.decode_stage_2_outputs(l / self.scale_factor)
                             for l in latent_intermediates]
            return image, intermediates
        return autoencoder_model.decode_stage_2_outputs(out / self.scale_factor)


class ControlNetDiffusionInferer(DiffusionInferer):
    """Diffusion conditioned through a ControlNet (reference: inferer.py:1324)."""

    def __call__(self, inputs: jnp.ndarray, diffusion_model: Callable, controlnet: Callable,
                 noise: jnp.ndarray, timesteps: jnp.ndarray, cn_cond: jnp.ndarray,
                 condition=None, mode: str = "crossattn", seg=None):
        noisy_image = self.scheduler.add_noise(inputs, noise, timesteps)
        down_res, mid_res = controlnet(noisy_image, timesteps=timesteps,
                                       controlnet_cond=cn_cond, context=condition)
        model_input = noisy_image
        ctx = condition
        if mode == "concat" and condition is not None:
            model_input = jnp.concatenate([noisy_image, condition], axis=1)
            ctx = None
        return diffusion_model(model_input, timesteps=timesteps, context=ctx,
                               down_block_additional_residuals=down_res,
                               mid_block_additional_residual=mid_res)

    def sample(self, input_noise: jnp.ndarray, diffusion_model: Callable, controlnet: Callable = None,
               cn_cond: jnp.ndarray = None, scheduler: Scheduler | None = None,
               save_intermediates: bool = False, intermediate_steps: int = 100, conditioning=None,
               mode: str = "crossattn", verbose: bool = False, seg=None, key=None):
        scheduler = scheduler or self.scheduler
        key = jax.random.PRNGKey(0) if key is None else key
        image = input_noise
        intermediates = []
        for i, t in enumerate(np.asarray(scheduler.timesteps)):
            t_int = int(t)
            ts = jnp.full((image.shape[0],), t_int)
            down_res, mid_res = controlnet(image, timesteps=ts, controlnet_cond=cn_cond,
                                           context=conditioning)
            model_output = diffusion_model(image, timesteps=ts, context=conditioning,
                                           down_block_additional_residuals=down_res,
                                           mid_block_additional_residual=mid_res)
            key, sub = jax.random.split(key)
            try:
                image, _ = scheduler.step(model_output, t_int, image, key=sub)
            except TypeError:
                image, _ = scheduler.step(model_output, t_int, image)
            if save_intermediates and i % intermediate_steps == 0:
                intermediates.append(image)
        return (image, intermediates) if save_intermediates else image
