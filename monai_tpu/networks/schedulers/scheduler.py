"""Diffusion noise-scheduler base (reference: monai/networks/schedulers/scheduler.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["NoiseSchedules", "Scheduler"]


class _Registry:
    def __init__(self):
        self.schedules = {}

    def add_def(self, name, desc=""):
        def wrap(fn):
            self.schedules[name] = fn
            return fn

        return wrap

    def __getitem__(self, name):
        return self.schedules[name]


NoiseSchedules = _Registry()


@NoiseSchedules.add_def("linear_beta", "Linear beta schedule")
def _linear_beta(num_train_timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2):
    return jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)


@NoiseSchedules.add_def("scaled_linear_beta", "Scaled-linear beta schedule")
def _scaled_linear_beta(num_train_timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2):
    return jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float32) ** 2


@NoiseSchedules.add_def("sigmoid_beta", "Sigmoid beta schedule")
def _sigmoid_beta(num_train_timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2,
                  sig_range: float = 6):
    betas = jnp.linspace(-sig_range, sig_range, num_train_timesteps, dtype=jnp.float32)
    return 1 / (1 + jnp.exp(-betas)) * (beta_end - beta_start) + beta_start


@NoiseSchedules.add_def("cosine", "Cosine schedule")
def _cosine_beta(num_train_timesteps: int, s: float = 8e-3):
    x = jnp.linspace(0, num_train_timesteps, num_train_timesteps + 1)
    alphas_cumprod = jnp.cos(((x / num_train_timesteps) + s) / (1 + s) * jnp.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - alphas_cumprod[1:] / alphas_cumprod[:-1]
    return jnp.clip(betas, 0.0, 0.999)


class Scheduler:
    """Base scheduler: beta/alpha bookkeeping + add_noise (reference: scheduler.py)."""

    def __init__(self, num_train_timesteps: int = 1000, schedule: str = "linear_beta", **schedule_args):
        self.num_train_timesteps = num_train_timesteps
        self.betas = NoiseSchedules[schedule](num_train_timesteps, **schedule_args)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = jnp.cumprod(self.alphas, axis=0)
        self.one = jnp.asarray(1.0)
        self.timesteps = jnp.arange(num_train_timesteps - 1, -1, -1)

    def add_noise(self, original_samples, noise, timesteps):
        """q(x_t | x_0) sampling (reference: scheduler.py add_noise)."""
        sqrt_alpha = jnp.sqrt(self.alphas_cumprod[timesteps]).astype(original_samples.dtype)
        sqrt_one_minus = jnp.sqrt(1 - self.alphas_cumprod[timesteps]).astype(original_samples.dtype)
        while sqrt_alpha.ndim < original_samples.ndim:
            sqrt_alpha = sqrt_alpha[..., None]
            sqrt_one_minus = sqrt_one_minus[..., None]
        return sqrt_alpha * original_samples + sqrt_one_minus * noise

    def get_velocity(self, sample, noise, timesteps):
        sqrt_alpha = jnp.sqrt(self.alphas_cumprod[timesteps]).astype(sample.dtype)
        sqrt_one_minus = jnp.sqrt(1 - self.alphas_cumprod[timesteps]).astype(sample.dtype)
        while sqrt_alpha.ndim < sample.ndim:
            sqrt_alpha = sqrt_alpha[..., None]
            sqrt_one_minus = sqrt_one_minus[..., None]
        return sqrt_alpha * noise - sqrt_one_minus * sample
