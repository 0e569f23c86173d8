"""DDIM scheduler (reference: monai/networks/schedulers/ddim.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ddpm import DDPMPredictionType
from .scheduler import Scheduler

__all__ = ["DDIMScheduler", "DDIMPredictionType"]

DDIMPredictionType = DDPMPredictionType


class DDIMScheduler(Scheduler):
    """Denoising diffusion implicit models (reference: ddim.py)."""

    def __init__(self, num_train_timesteps: int = 1000, schedule: str = "linear_beta",
                 clip_sample: bool = True, set_alpha_to_one: bool = True, steps_offset: int = 0,
                 prediction_type: str = DDIMPredictionType.EPSILON, clip_sample_min: float = -1.0,
                 clip_sample_max: float = 1.0, **schedule_args):
        super().__init__(num_train_timesteps, schedule, **schedule_args)
        if prediction_type not in (DDIMPredictionType.EPSILON, DDIMPredictionType.SAMPLE,
                                   DDIMPredictionType.V_PREDICTION):
            raise ValueError("Argument `prediction_type` must be a member of DDIMPredictionType")
        self.final_alpha_cumprod = jnp.asarray(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        self.steps_offset = steps_offset
        self.clip_sample = clip_sample
        self.clip_sample_values = (clip_sample_min, clip_sample_max)
        self.prediction_type = prediction_type
        self.num_inference_steps: int | None = None
        self.set_timesteps(num_train_timesteps)

    def set_timesteps(self, num_inference_steps: int, device=None) -> None:
        if num_inference_steps > self.num_train_timesteps:
            raise ValueError(
                f"`num_inference_steps`: {num_inference_steps} cannot be larger than "
                f"`num_train_timesteps`: {self.num_train_timesteps}.")
        self.num_inference_steps = num_inference_steps
        step_ratio = self.num_train_timesteps // self.num_inference_steps
        self.timesteps = ((jnp.arange(0, num_inference_steps) * step_ratio).round()[::-1]
                          .astype(jnp.int32) + self.steps_offset)

    def _get_variance(self, timestep, prev_timestep):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(prev_timestep >= 0, self.alphas_cumprod[prev_timestep],
                                      self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)

    def step(self, model_output, timestep: int, sample, eta: float = 0.0, key=None, generator=None):
        """DDIM reverse step (reference: ddim.py step).

        Returns (pred_prev_sample, pred_original_sample)."""
        prev_timestep = timestep - self.num_train_timesteps // self.num_inference_steps
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(prev_timestep >= 0, self.alphas_cumprod[prev_timestep],
                                      self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t

        if self.prediction_type == DDIMPredictionType.EPSILON:
            pred_original_sample = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
            pred_epsilon = model_output
        elif self.prediction_type == DDIMPredictionType.SAMPLE:
            pred_original_sample = model_output
            pred_epsilon = (sample - jnp.sqrt(alpha_prod_t) * pred_original_sample) / jnp.sqrt(beta_prod_t)
        else:  # v_prediction
            pred_original_sample = jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(beta_prod_t) * model_output
            pred_epsilon = jnp.sqrt(alpha_prod_t) * model_output + jnp.sqrt(beta_prod_t) * sample

        if self.clip_sample:
            pred_original_sample = jnp.clip(pred_original_sample, self.clip_sample_values[0],
                                            self.clip_sample_values[1])

        variance = self._get_variance(timestep, prev_timestep)
        std_dev_t = eta * jnp.sqrt(variance)
        pred_sample_direction = jnp.sqrt(1 - alpha_prod_t_prev - std_dev_t**2) * pred_epsilon
        pred_prev_sample = jnp.sqrt(alpha_prod_t_prev) * pred_original_sample + pred_sample_direction
        if eta > 0 and key is not None:
            noise = jax.random.normal(key, model_output.shape, dtype=model_output.dtype)
            pred_prev_sample = pred_prev_sample + std_dev_t * noise
        return pred_prev_sample, pred_original_sample

    def reversed_step(self, model_output, timestep: int, sample):
        """Forward DDIM step x_t → x_{t+1} for encoding (reference: ddim.py reversed_step)."""
        prev_timestep = timestep
        timestep = min(timestep - self.num_train_timesteps // self.num_inference_steps,
                       self.num_train_timesteps - 1)
        alpha_prod_t = jnp.where(timestep >= 0, self.alphas_cumprod[timestep], self.final_alpha_cumprod)
        alpha_prod_t_prev = self.alphas_cumprod[prev_timestep]
        beta_prod_t = 1 - alpha_prod_t
        pred_original_sample = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
        pred_sample_direction = jnp.sqrt(1 - alpha_prod_t_prev) * model_output
        pred_post_sample = jnp.sqrt(alpha_prod_t_prev) * pred_original_sample + pred_sample_direction
        return pred_post_sample, pred_original_sample
