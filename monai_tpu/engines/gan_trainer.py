"""GAN and adversarial trainers (reference: monai/engines/trainer.py:281 GanTrainer,
:470 AdversarialTrainer)."""
from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from ..data.meta_image import MetaImage
from ..utils.backend import to_jax
from ..utils.enums import CommonKeys as Keys
from ..utils.enums import AdversarialKeys, GanKeys
from .events import IterationEvents
from .utils import default_make_latent, default_prepare_batch
from .workflow import Workflow

__all__ = ["GanTrainer", "AdversarialTrainer"]


class GanTrainer(Workflow):
    """Alternating D/G optimization (reference: trainer.py:281, Goodfellow-style)."""

    def __init__(self, device=None, max_epochs: int = 1, train_data_loader: Iterable | None = None,
                 g_network: Any = None, g_optimizer: Any = None, g_loss_function: Callable | None = None,
                 d_network: Any = None, d_optimizer: Any = None, d_loss_function: Callable | None = None,
                 epoch_length: int | None = None, g_inferer=None, d_inferer=None,
                 d_train_steps: int = 1, latent_shape: int = 64, non_blocking: bool = False,
                 d_prepare_batch: Callable = default_prepare_batch,
                 g_prepare_batch: Callable = default_make_latent,
                 g_update_latents: bool = True, iteration_update: Callable | None = None,
                 postprocessing=None, key_train_metric: dict | None = None,
                 additional_metrics: dict | None = None, metric_cmp_fn=lambda c, b: c > b,
                 train_handlers: Sequence | None = None, decollate: bool = True,
                 to_kwargs: dict | None = None, amp_kwargs: dict | None = None):
        super().__init__(device=device, max_epochs=max_epochs, data_loader=train_data_loader,
                         epoch_length=epoch_length, non_blocking=non_blocking,
                         prepare_batch=d_prepare_batch, iteration_update=iteration_update,
                         postprocessing=postprocessing, key_metric=key_train_metric,
                         additional_metrics=additional_metrics, metric_cmp_fn=metric_cmp_fn,
                         handlers=train_handlers, decollate=decollate)
        self.g_network = g_network
        self.g_optimizer = g_optimizer if isinstance(g_optimizer, nnx.Optimizer) or g_optimizer is None \
            else nnx.Optimizer(g_network, g_optimizer, wrt=nnx.Param)
        self.g_loss_function = g_loss_function
        self.d_network = d_network
        self.d_optimizer = d_optimizer if isinstance(d_optimizer, nnx.Optimizer) or d_optimizer is None \
            else nnx.Optimizer(d_network, d_optimizer, wrt=nnx.Param)
        self.d_loss_function = d_loss_function
        self.d_train_steps = d_train_steps
        self.latent_shape = latent_shape
        self.g_prepare_batch = g_prepare_batch
        self.g_update_latents = g_update_latents
        self._d_step = None
        self._g_step = None

    def _build_steps(self):
        d_loss_fn = self.d_loss_function
        g_loss_fn = self.g_loss_function

        @nnx.jit
        def d_step(g_net, d_net, d_opt, latents, reals):
            fakes = g_net(latents)

            def loss_of(d):
                return d_loss_fn(d, jax.lax.stop_gradient(fakes), reals)

            loss, grads = nnx.value_and_grad(loss_of)(d_net)
            d_opt.update(d_net, grads)
            return loss

        @nnx.jit
        def g_step(g_net, d_net, g_opt, latents):
            def loss_of(g):
                fakes = g(latents)
                return g_loss_fn(d_net, fakes)

            loss, grads = nnx.value_and_grad(loss_of)(g_net)
            g_opt.update(g_net, grads)
            return loss

        return d_step, g_step

    def _iteration(self, engine, batchdata) -> dict:
        if batchdata is None:
            raise ValueError("must provide batch data for current iteration.")
        batch = self.prepare_batch(batchdata, engine.state.device, engine.non_blocking)
        reals = batch[0] if isinstance(batch, tuple) else batch
        reals = to_jax(reals.data if isinstance(reals, MetaImage) else reals)
        batch_size = reals.shape[0]
        if self._d_step is None:
            self._d_step, self._g_step = self._build_steps()
        d_total_loss = jnp.zeros(())
        for _ in range(self.d_train_steps):
            latents = to_jax(self.g_prepare_batch(batch_size, self.latent_shape))
            d_total_loss = d_total_loss + self._d_step(self.g_network, self.d_network,
                                                       self.d_optimizer, latents, reals)
        latents = to_jax(self.g_prepare_batch(batch_size, self.latent_shape))
        g_loss = self._g_step(self.g_network, self.d_network, self.g_optimizer, latents)
        fakes = self.g_network(latents)
        return {GanKeys.REALS: reals, GanKeys.FAKES: fakes, GanKeys.LATENTS: latents,
                GanKeys.GLOSS: g_loss, GanKeys.DLOSS: d_total_loss}


class AdversarialTrainer(Workflow):
    """Supervised generator (e.g. autoencoder) + adversarial discriminator
    (reference: trainer.py:470)."""

    def __init__(self, device=None, max_epochs: int = 1, train_data_loader: Iterable | None = None,
                 g_network: Any = None, g_optimizer: Any = None, g_loss_function: Callable | None = None,
                 recon_loss_function: Callable | None = None, d_network: Any = None,
                 d_optimizer: Any = None, d_loss_function: Callable | None = None,
                 epoch_length: int | None = None, non_blocking: bool = False,
                 prepare_batch: Callable = default_prepare_batch, iteration_update=None,
                 g_inferer=None, d_inferer=None, postprocessing=None, key_train_metric=None,
                 additional_metrics=None, metric_cmp_fn=lambda c, b: c > b, train_handlers=None,
                 amp: bool = False, adversarial_weight: float = 0.01, decollate: bool = True,
                 to_kwargs=None, amp_kwargs=None):
        super().__init__(device=device, max_epochs=max_epochs, data_loader=train_data_loader,
                         epoch_length=epoch_length, non_blocking=non_blocking,
                         prepare_batch=prepare_batch, iteration_update=iteration_update,
                         postprocessing=postprocessing, key_metric=key_train_metric,
                         additional_metrics=additional_metrics, metric_cmp_fn=metric_cmp_fn,
                         handlers=train_handlers, amp=amp, decollate=decollate)
        self.g_network = g_network
        self.g_optimizer = g_optimizer if isinstance(g_optimizer, nnx.Optimizer) or g_optimizer is None \
            else nnx.Optimizer(g_network, g_optimizer, wrt=nnx.Param)
        self.g_loss_function = g_loss_function
        self.recon_loss_function = recon_loss_function
        self.d_network = d_network
        self.d_optimizer = d_optimizer if isinstance(d_optimizer, nnx.Optimizer) or d_optimizer is None \
            else nnx.Optimizer(d_network, d_optimizer, wrt=nnx.Param)
        self.d_loss_function = d_loss_function
        self.adversarial_weight = adversarial_weight
        self._steps = None

    def _build_steps(self):
        recon_loss = self.recon_loss_function
        g_adv_loss = self.g_loss_function
        d_loss_fn = self.d_loss_function
        w = self.adversarial_weight

        @nnx.jit
        def g_step(g_net, d_net, g_opt, inputs, targets):
            def loss_of(g):
                recon = g(inputs)
                recon_arr = recon[0] if isinstance(recon, tuple) else recon
                loss_r = recon_loss(recon_arr, targets)
                logits = d_net(recon_arr)
                logits_final = logits[-1] if isinstance(logits, (list, tuple)) else logits
                loss_a = g_adv_loss(logits_final, True, False) if g_adv_loss else 0.0
                return loss_r + w * loss_a, recon_arr

            (loss, recon_arr), grads = nnx.value_and_grad(loss_of, has_aux=True)(g_net)
            g_opt.update(g_net, grads)
            return loss, recon_arr

        @nnx.jit
        def d_step(d_net, d_opt, recon, targets):
            def loss_of(d):
                fake_logits = d(jax.lax.stop_gradient(recon))
                real_logits = d(targets)
                f = fake_logits[-1] if isinstance(fake_logits, (list, tuple)) else fake_logits
                r = real_logits[-1] if isinstance(real_logits, (list, tuple)) else real_logits
                return 0.5 * (d_loss_fn(f, False, True) + d_loss_fn(r, True, True))

            loss, grads = nnx.value_and_grad(loss_of)(d_net)
            d_opt.update(d_net, grads)
            return loss

        return g_step, d_step

    def _iteration(self, engine, batchdata) -> dict:
        batch = self.prepare_batch(batchdata, engine.state.device, engine.non_blocking)
        inputs, targets = batch if isinstance(batch, tuple) else (batch, batch)
        inputs = to_jax(inputs.data if isinstance(inputs, MetaImage) else inputs)
        targets = to_jax(targets.data if isinstance(targets, MetaImage) else targets) \
            if targets is not None else inputs
        if self._steps is None:
            self._steps = self._build_steps()
        g_step, d_step = self._steps
        g_loss, recon = g_step(self.g_network, self.d_network, self.g_optimizer, inputs, targets)
        d_loss = d_step(self.d_network, self.d_optimizer, recon, targets)
        return {Keys.IMAGE: inputs, Keys.LABEL: targets, Keys.PRED: recon,
                AdversarialKeys.GENERATOR_LOSS: g_loss,
                AdversarialKeys.DISCRIMINATOR_LOSS: d_loss,
                Keys.LOSS: g_loss}
