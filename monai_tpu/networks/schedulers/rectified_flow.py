"""Rectified-flow scheduler (reference: monai/networks/schedulers/rectified_flow.py;
the MAISI 33x-faster sampling path, whatsnew_1_5.md:45)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .scheduler import Scheduler

__all__ = ["RFlowScheduler"]


def timestep_transform(t, input_img_size_numel: int, base_img_size_numel: int = 32 * 32 * 32,
                       scale: float = 1.0, num_train_timesteps: int = 1000,
                       spatial_dim: int = 3):
    """Resolution-aware timestep shift (reference: rectified_flow.py timestep_transform)."""
    t = t / num_train_timesteps
    ratio_space = (input_img_size_numel / base_img_size_numel) ** (1.0 / spatial_dim)
    ratio = ratio_space * scale
    new_t = ratio * t / (1 + (ratio - 1) * t)
    return new_t * num_train_timesteps


class RFlowScheduler(Scheduler):
    """Rectified flow: straight-line interpolation between noise and data
    (reference: rectified_flow.py)."""

    def __init__(self, num_train_timesteps: int = 1000, use_discrete_timesteps: bool = True,
                 sample_method: str = "uniform", loc: float = 0.0, scale: float = 1.0,
                 use_timestep_transform: bool = False, transform_scale: float = 1.0,
                 steps_offset: int = 0, **kwargs):
        self.num_train_timesteps = num_train_timesteps
        self.use_discrete_timesteps = use_discrete_timesteps
        self.sample_method = sample_method
        self.loc = loc
        self.scale = scale
        self.use_timestep_transform = use_timestep_transform
        self.transform_scale = transform_scale
        self.steps_offset = steps_offset
        self.num_inference_steps: int | None = None
        self.timesteps = jnp.arange(num_train_timesteps - 1, -1, -1)

    def add_noise(self, original_samples, noise, timesteps):
        """Linear interpolation x_t = t*noise + (1-t)*x0 (reference: rectified_flow.py)."""
        timepoints = timesteps.astype(jnp.float32) / self.num_train_timesteps
        timepoints = 1 - timepoints  # [1, 1/T]
        while timepoints.ndim < original_samples.ndim:
            timepoints = timepoints[..., None]
        return timepoints * original_samples + (1 - timepoints) * noise

    def sample_timesteps(self, x_start, key=None):
        """Draw training timesteps (uniform or logit-normal)."""
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)) if key is None else key
        b = x_start.shape[0]
        if self.sample_method == "uniform":
            t = jax.random.uniform(key, (b,)) * self.num_train_timesteps
        elif self.sample_method == "logit-normal":
            z = self.loc + self.scale * jax.random.normal(key, (b,))
            t = jax.nn.sigmoid(z) * self.num_train_timesteps
        else:
            raise ValueError(f"Unsupported sample_method: {self.sample_method}")
        if self.use_timestep_transform:
            t = timestep_transform(t, int(np.prod(x_start.shape[2:])),
                                   num_train_timesteps=self.num_train_timesteps,
                                   scale=self.transform_scale, spatial_dim=x_start.ndim - 2)
        if self.use_discrete_timesteps:
            t = t.astype(jnp.int32)
        return t

    def set_timesteps(self, num_inference_steps: int, device=None, input_img_size_numel: int | None = None,
                      spatial_dim: int = 3) -> None:
        if num_inference_steps > self.num_train_timesteps:
            raise ValueError(
                f"`num_inference_steps`: {num_inference_steps} cannot be larger than "
                f"`num_train_timesteps`: {self.num_train_timesteps}.")
        self.num_inference_steps = num_inference_steps
        steps = [(1.0 - i / num_inference_steps) * self.num_train_timesteps
                 for i in range(num_inference_steps)]
        if self.use_timestep_transform and input_img_size_numel is not None:
            steps = [float(timestep_transform(jnp.asarray(t), input_img_size_numel,
                                              num_train_timesteps=self.num_train_timesteps,
                                              scale=self.transform_scale, spatial_dim=spatial_dim))
                     for t in steps]
        self.timesteps = jnp.asarray(steps) + self.steps_offset

    def step(self, model_output, timestep, sample, next_timestep=None):
        """Euler step along the predicted velocity (reference: rectified_flow.py step).

        Returns (pred_prev_sample, pred_original_sample)."""
        v_pred = model_output
        if next_timestep is None:
            dt = 1.0 / self.num_inference_steps
        else:
            dt = (timestep - next_timestep) / self.num_train_timesteps
        pred_post_sample = sample + v_pred * dt
        pred_original_sample = sample + v_pred * timestep / self.num_train_timesteps
        return pred_post_sample, pred_original_sample


class RFlowPredictionType:
    """Valid ``prediction_type`` names for RFlowScheduler
    (reference: schedulers/rectified_flow.py:43) — velocity prediction only."""

    V_PREDICTION = "v_prediction"


__all__ += ["RFlowPredictionType"]
