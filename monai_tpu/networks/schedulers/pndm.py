"""PNDM scheduler (reference: monai/networks/schedulers/pndm.py).

Pseudo-numerical methods: PLMS (linear multistep) with optional Runge-Kutta warmup.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scheduler import Scheduler

__all__ = ["PNDMScheduler", "PNDMPredictionType"]


class PNDMPredictionType:
    EPSILON = "epsilon"
    V_PREDICTION = "v_prediction"


class PNDMScheduler(Scheduler):
    """(reference: pndm.py)."""

    def __init__(self, num_train_timesteps: int = 1000, schedule: str = "linear_beta",
                 skip_prk_steps: bool = False, set_alpha_to_one: bool = False, steps_offset: int = 0,
                 prediction_type: str = PNDMPredictionType.EPSILON, **schedule_args):
        super().__init__(num_train_timesteps, schedule, **schedule_args)
        if prediction_type not in (PNDMPredictionType.EPSILON, PNDMPredictionType.V_PREDICTION):
            raise ValueError("Argument `prediction_type` must be a member of PNDMPredictionType")
        self.prediction_type = prediction_type
        self.final_alpha_cumprod = jnp.asarray(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        self.pndm_order = 4
        self.skip_prk_steps = skip_prk_steps
        self.steps_offset = steps_offset
        # running state
        self.cur_model_output = 0
        self.counter = 0
        self.cur_sample = None
        self.ets: list = []
        self.prk_timesteps = np.asarray([])
        self.plms_timesteps = np.asarray([])
        self.num_inference_steps: int | None = None
        self.set_timesteps(num_train_timesteps)

    def set_timesteps(self, num_inference_steps: int, device=None) -> None:
        if num_inference_steps > self.num_train_timesteps:
            raise ValueError(
                f"`num_inference_steps`: {num_inference_steps} cannot be larger than "
                f"`num_train_timesteps`: {self.num_train_timesteps}.")
        self.num_inference_steps = num_inference_steps
        step_ratio = self.num_train_timesteps // self.num_inference_steps
        _timesteps = (np.arange(0, num_inference_steps) * step_ratio).round() + self.steps_offset
        if self.skip_prk_steps:
            self.prk_timesteps = np.asarray([])
            self.plms_timesteps = np.concatenate(
                [_timesteps[:-1], _timesteps[-2:-1], _timesteps[-1:]])[::-1].copy()
        else:
            prk_timesteps = np.asarray(_timesteps[-self.pndm_order:]).repeat(2) + np.tile(
                np.asarray([0, self.num_train_timesteps // num_inference_steps // 2]), self.pndm_order)
            self.prk_timesteps = (prk_timesteps[:-1].repeat(2)[1:-1])[::-1].copy()
            self.plms_timesteps = _timesteps[:-3][::-1].copy()
        timesteps = np.concatenate([self.prk_timesteps, self.plms_timesteps]).astype(np.int64)
        self.timesteps = jnp.asarray(timesteps)
        self.ets = []
        self.counter = 0

    def step(self, model_output, timestep: int, sample):
        """Dispatch PRK/PLMS step. Returns (prev_sample, None)."""
        if self.counter < len(self.prk_timesteps) and not self.skip_prk_steps:
            return self.step_prk(model_output, timestep, sample), None
        return self.step_plms(model_output, timestep, sample), None

    def step_prk(self, model_output, timestep: int, sample):
        diff_to_prev = (0 if self.counter % 2 else
                        self.num_train_timesteps // self.num_inference_steps // 2)
        prev_timestep = timestep - diff_to_prev
        timestep = int(self.prk_timesteps[self.counter // 4 * 4])
        if self.counter % 4 == 0:
            self.cur_model_output = self.cur_model_output + 1 / 6 * model_output
            self.ets.append(model_output)
            self.cur_sample = sample
        elif (self.counter - 1) % 4 == 0:
            self.cur_model_output = self.cur_model_output + 1 / 3 * model_output
        elif (self.counter - 2) % 4 == 0:
            self.cur_model_output = self.cur_model_output + 1 / 3 * model_output
        elif (self.counter - 3) % 4 == 0:
            model_output = self.cur_model_output + 1 / 6 * model_output
            self.cur_model_output = 0
        cur_sample = self.cur_sample if self.cur_sample is not None else sample
        prev_sample = self._get_prev_sample(cur_sample, timestep, prev_timestep, model_output)
        self.counter += 1
        return prev_sample

    def step_plms(self, model_output, timestep: int, sample):
        if not self.skip_prk_steps and len(self.ets) < 3:
            raise ValueError(
                f"{self.__class__} can only be run AFTER scheduler has been run in 'prk' mode for at "
                "least 12 iterations.")
        prev_timestep = timestep - self.num_train_timesteps // self.num_inference_steps
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_timestep = timestep
            timestep = timestep + self.num_train_timesteps // self.num_inference_steps
        if len(self.ets) == 1 and self.counter == 0:
            model_output = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            model_output = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            model_output = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            model_output = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            model_output = (1 / 24) * (55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3]
                                       - 9 * self.ets[-4])
        prev_sample = self._get_prev_sample(sample, timestep, prev_timestep, model_output)
        self.counter += 1
        return prev_sample

    def _get_prev_sample(self, sample, timestep: int, prev_timestep: int, model_output):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(prev_timestep >= 0, self.alphas_cumprod[prev_timestep],
                                      self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        if self.prediction_type == PNDMPredictionType.V_PREDICTION:
            model_output = jnp.sqrt(alpha_prod_t) * model_output + jnp.sqrt(beta_prod_t) * sample
        sample_coeff = jnp.sqrt(alpha_prod_t_prev / alpha_prod_t)
        model_output_denom_coeff = alpha_prod_t * jnp.sqrt(beta_prod_t_prev) + jnp.sqrt(
            alpha_prod_t * beta_prod_t * alpha_prod_t_prev)
        return (sample_coeff * sample - (alpha_prod_t_prev - alpha_prod_t) * model_output
                / model_output_denom_coeff)
