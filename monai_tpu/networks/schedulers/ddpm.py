"""DDPM scheduler (reference: monai/networks/schedulers/ddpm.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .scheduler import Scheduler

__all__ = ["DDPMScheduler", "DDPMPredictionType", "DDPMVarianceType"]


class DDPMPredictionType:
    EPSILON = "epsilon"
    SAMPLE = "sample"
    V_PREDICTION = "v_prediction"


class DDPMVarianceType:
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED = "learned"
    LEARNED_RANGE = "learned_range"


class DDPMScheduler(Scheduler):
    """Denoising diffusion probabilistic models (reference: ddpm.py)."""

    def __init__(self, num_train_timesteps: int = 1000, schedule: str = "linear_beta",
                 variance_type: str = DDPMVarianceType.FIXED_SMALL, clip_sample: bool = True,
                 prediction_type: str = DDPMPredictionType.EPSILON, clip_sample_min: float = -1.0,
                 clip_sample_max: float = 1.0, **schedule_args):
        super().__init__(num_train_timesteps, schedule, **schedule_args)
        if prediction_type not in (DDPMPredictionType.EPSILON, DDPMPredictionType.SAMPLE,
                                   DDPMPredictionType.V_PREDICTION):
            raise ValueError("Argument `prediction_type` must be a member of DDPMPredictionType")
        if variance_type not in (DDPMVarianceType.FIXED_SMALL, DDPMVarianceType.FIXED_LARGE,
                                 DDPMVarianceType.LEARNED, DDPMVarianceType.LEARNED_RANGE):
            raise ValueError("Argument `variance_type` must be a member of DDPMVarianceType")
        self.clip_sample = clip_sample
        self.clip_sample_values = (clip_sample_min, clip_sample_max)
        self.variance_type = variance_type
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
        self.timesteps = (jnp.arange(0, num_inference_steps) * step_ratio)[::-1].astype(jnp.int32)

    def _get_mean(self, timestep: int, x_0, x_t):
        alpha_t = self.alphas[timestep]
        alpha_prod_t_prev = jnp.where(timestep > 0, self.alphas_cumprod[timestep - 1], self.one)
        x_0_coef = jnp.sqrt(alpha_prod_t_prev) * self.betas[timestep] / (1 - self.alphas_cumprod[timestep])
        x_t_coef = jnp.sqrt(alpha_t) * (1 - alpha_prod_t_prev) / (1 - self.alphas_cumprod[timestep])
        return x_0_coef * x_0 + x_t_coef * x_t

    def _get_variance(self, timestep: int, predicted_variance=None):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(timestep > 0, self.alphas_cumprod[timestep - 1], self.one)
        variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * self.betas[timestep]
        if self.variance_type == DDPMVarianceType.FIXED_SMALL:
            return jnp.clip(variance, 1e-20, None)
        if self.variance_type == DDPMVarianceType.FIXED_LARGE:
            return self.betas[timestep]
        if self.variance_type == DDPMVarianceType.LEARNED and predicted_variance is not None:
            return predicted_variance
        if self.variance_type == DDPMVarianceType.LEARNED_RANGE and predicted_variance is not None:
            min_log = jnp.log(jnp.clip(variance, 1e-20, None))
            max_log = jnp.log(self.betas[timestep])
            frac = (predicted_variance + 1) / 2
            return jnp.exp(frac * max_log + (1 - frac) * min_log)
        return variance

    def step(self, model_output, timestep: int, sample, key=None, generator=None):
        """Reverse step x_t → x_{t-1} (reference: ddpm.py step).

        Returns (pred_prev_sample, pred_original_sample)."""
        predicted_variance = None
        if model_output.shape[1] == sample.shape[1] * 2 and self.variance_type in (
                DDPMVarianceType.LEARNED, DDPMVarianceType.LEARNED_RANGE):
            model_output, predicted_variance = jnp.split(model_output, 2, axis=1)

        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(timestep > 0, self.alphas_cumprod[timestep - 1], self.one)
        beta_prod_t = 1 - alpha_prod_t

        if self.prediction_type == DDPMPredictionType.EPSILON:
            pred_original_sample = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
        elif self.prediction_type == DDPMPredictionType.SAMPLE:
            pred_original_sample = model_output
        else:  # v_prediction
            pred_original_sample = jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(beta_prod_t) * model_output

        if self.clip_sample:
            pred_original_sample = jnp.clip(pred_original_sample, self.clip_sample_values[0],
                                            self.clip_sample_values[1])

        pred_prev_sample = self._get_mean(timestep, pred_original_sample, sample)
        variance = 0.0
        if key is not None:
            noise = jax.random.normal(key, model_output.shape, dtype=model_output.dtype)
            var = self._get_variance(timestep, predicted_variance)
            variance = jnp.where(timestep > 0, jnp.sqrt(var), 0.0) * noise
        pred_prev_sample = pred_prev_sample + variance
        return pred_prev_sample, pred_original_sample
