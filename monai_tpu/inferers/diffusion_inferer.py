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


class ControlNetLatentDiffusionInferer(ControlNetDiffusionInferer):
    """ControlNet-conditioned diffusion in a first-stage latent space
    (reference: inferer.py:1667)."""

    def __init__(self, scheduler: Scheduler, scale_factor: float = 1.0,
                 ldm_latent_shape=None, autoencoder_latent_shape=None):
        super().__init__(scheduler)
        self.scale_factor = scale_factor

    def __call__(self, inputs: jnp.ndarray, autoencoder_model, diffusion_model: Callable,
                 controlnet: Callable, noise: jnp.ndarray, timesteps: jnp.ndarray,
                 cn_cond: jnp.ndarray, condition=None, mode: str = "crossattn", seg=None):
        latent = autoencoder_model.encode_stage_2_inputs(inputs) * self.scale_factor
        return super().__call__(latent, diffusion_model, controlnet, noise, timesteps,
                                cn_cond, condition, mode)

    def sample(self, input_noise: jnp.ndarray, autoencoder_model=None,
               diffusion_model: Callable = None, controlnet: Callable = None,
               cn_cond: jnp.ndarray = None, scheduler: Scheduler | None = None,
               save_intermediates: bool = False, intermediate_steps: int = 100,
               conditioning=None, mode: str = "crossattn", verbose: bool = False,
               seg=None, key=None):
        out = super().sample(input_noise, diffusion_model, controlnet, cn_cond, scheduler,
                             save_intermediates, intermediate_steps, conditioning, mode,
                             verbose, key)
        if save_intermediates:
            latent, latent_intermediates = out
            image = autoencoder_model.decode_stage_2_outputs(latent / self.scale_factor)
            intermediates = [autoencoder_model.decode_stage_2_outputs(l / self.scale_factor)
                             for l in latent_intermediates]
            return image, intermediates
        return autoencoder_model.decode_stage_2_outputs(out / self.scale_factor)


class VQVAETransformerInferer(Inferer):
    """Autoregressive transformer over VQ-VAE token sequences
    (reference: inferer.py:1920)."""

    def __call__(self, inputs: jnp.ndarray, vqvae_model, transformer_model, ordering,
                 condition=None, return_latent: bool = False, key=None):
        """Teacher-forced logits for the quantized token sequence of ``inputs``."""
        import numpy as np

        latent = vqvae_model.index_quantize(inputs)
        latent_spatial_dim = tuple(latent.shape[1:])
        b = latent.shape[0]
        latent = latent.reshape(b, -1)
        latent = latent[:, ordering.get_sequence_ordering()]
        # prepend BOS (= num_embeddings) and drop the last token
        bos = vqvae_model.num_embeddings
        seq = jnp.concatenate([jnp.full((b, 1), bos, latent.dtype), latent[:, :-1]], axis=1)
        seq_len = seq.shape[1]
        max_seq_len = transformer_model.max_seq_len
        start = 0
        if max_seq_len < seq_len:
            if key is not None:
                start = int(jax.random.randint(key, (), 0, seq_len + 1 - max_seq_len))
            else:
                start = int(np.random.randint(0, seq_len + 1 - max_seq_len))
        prediction = transformer_model(seq[:, start:start + max_seq_len], context=condition)
        if return_latent:
            return prediction, latent[:, start:start + max_seq_len], latent_spatial_dim
        return prediction

    def sample(self, latent_spatial_dim, starting_tokens, vqvae_model, transformer_model,
               ordering, condition=None, temperature: float = 1.0, top_k: int | None = None,
               verbose: bool = False, key=None):
        """Autoregressively sample token-by-token then decode (reference: inferer.py:2003)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        seq_len = 1
        for s in latent_spatial_dim:
            seq_len *= s
        latent_seq = jnp.asarray(starting_tokens, jnp.int32)
        for _ in range(seq_len):
            if latent_seq.shape[1] <= transformer_model.max_seq_len:
                idx_cond = latent_seq
            else:
                idx_cond = latent_seq[:, -transformer_model.max_seq_len:]
            logits = transformer_model(idx_cond, context=condition)[:, -1, :] / temperature
            if top_k is not None:
                kth = jnp.sort(logits, axis=-1)[:, -min(top_k, logits.shape[-1])][:, None]
                logits = jnp.where(logits < kth, -jnp.inf, logits)
            # never sample the BOS token
            logits = logits.at[:, vqvae_model.num_embeddings:].set(-jnp.inf)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits, axis=-1)[:, None]
            latent_seq = jnp.concatenate([latent_seq, nxt], axis=1)
        latent_seq = latent_seq[:, 1:]  # drop BOS
        latent_seq = latent_seq[:, ordering.get_revert_sequence_ordering()]
        latent = latent_seq.reshape((latent_seq.shape[0],) + tuple(latent_spatial_dim))
        return vqvae_model.decode_samples(latent)

    def get_likelihood(self, inputs: jnp.ndarray, vqvae_model, transformer_model, ordering,
                       condition=None):
        """Per-token log-likelihood of the quantized sequence (reference: inferer.py:2073)."""
        logits, target, latent_spatial_dim = self(inputs, vqvae_model, transformer_model,
                                                  ordering, condition, return_latent=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        ll = ll[:, ordering.get_revert_sequence_ordering()]
        return ll.reshape((ll.shape[0],) + tuple(latent_spatial_dim))
