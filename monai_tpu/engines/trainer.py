"""Trainers (reference: monai/engines/trainer.py:80 SupervisedTrainer, :281 GanTrainer,
:470 AdversarialTrainer).

SupervisedTrainer._iteration (reference :194-278) becomes a jit-compiled nnx train step:
value_and_grad over the loss, optax update, donated buffers.  AMP = bfloat16 compute on
the forward path (TPU-native mixed precision; no loss scaling needed since bf16 has
f32-range exponent).
"""
from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from ..data.meta_image import MetaImage
from ..inferers.inferer import Inferer, SimpleInferer
from ..utils.backend import to_jax
from ..utils.enums import CommonKeys as Keys
from ..utils.enums import GanKeys
from .events import Events, IterationEvents
from .utils import default_prepare_batch
from .workflow import Workflow

__all__ = ["Trainer", "SupervisedTrainer"]


class Trainer(Workflow):
    """Base trainer (reference: trainer.py:—)."""

    def run(self) -> None:
        super().run()

    def get_stats(self, *vars_name: str) -> dict:
        return super().get_stats("output", "batch", *vars_name)


class SupervisedTrainer(Trainer):
    """Standard supervised training loop (reference: trainer.py:80).

    Everything per-step is one compiled XLA program: forward, loss, backward, optimizer
    update.  The engine-level hooks observe host-side scalars only.
    """

    def __init__(self, device=None, max_epochs: int = 1, train_data_loader: Iterable | None = None,
                 network: Any = None, optimizer: Any = None, loss_function: Callable | None = None,
                 epoch_length: int | None = None, non_blocking: bool = False,
                 prepare_batch: Callable = default_prepare_batch, iteration_update: Callable | None = None,
                 inferer: Inferer | None = None, postprocessing: Callable | None = None,
                 key_train_metric: dict | None = None, additional_metrics: dict | None = None,
                 metric_cmp_fn: Callable = lambda cur, best: cur > best, train_handlers: Sequence | None = None,
                 amp: bool = False, event_names: list | None = None, event_to_attr: dict | None = None,
                 decollate: bool = True, optim_set_to_none: bool = False, to_kwargs: dict | None = None,
                 amp_kwargs: dict | None = None, compile: bool = True, compile_kwargs: dict | None = None):
        super().__init__(device=device, max_epochs=max_epochs, data_loader=train_data_loader,
                         epoch_length=epoch_length, non_blocking=non_blocking, prepare_batch=prepare_batch,
                         iteration_update=iteration_update, postprocessing=postprocessing,
                         key_metric=key_train_metric, additional_metrics=additional_metrics,
                         metric_cmp_fn=metric_cmp_fn, handlers=train_handlers, amp=amp,
                         event_names=event_names, event_to_attr=event_to_attr, decollate=decollate,
                         to_kwargs=to_kwargs, amp_kwargs=amp_kwargs)
        self.network = network
        if optimizer is not None and not isinstance(optimizer, nnx.Optimizer):
            optimizer = nnx.Optimizer(network, optimizer, wrt=nnx.Param)
        self.optimizer = optimizer
        self.loss_function = loss_function
        self.inferer = SimpleInferer() if inferer is None else inferer
        self.compile = compile
        self._compiled_step = None
        self.state.output = None

    def _build_step(self):
        loss_function = self.loss_function
        inferer = self.inferer
        amp = self.amp

        def train_step(model, optimizer, inputs, targets):
            def loss_fn(m):
                # real AMP: params AND activations must be bf16 — casting only
                # the input silently promotes back to f32 at the first conv
                # (see networks/utils.py:cast_params_to_compute)
                if amp:
                    from ..networks.utils import amp_model_view

                    m = amp_model_view(m)
                x = inputs.astype(jnp.bfloat16) if amp else inputs
                preds = inferer(x, m)
                preds = preds.astype(jnp.float32)
                loss = loss_function(preds, targets)
                return loss, preds

            (loss, preds), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
            optimizer.update(model, grads)
            return loss, preds

        return nnx.jit(train_step, donate_argnames=()) if self.compile else train_step

    def _iteration(self, engine, batchdata: dict) -> dict:
        """One optimization step (reference: trainer.py:194-278)."""
        if batchdata is None:
            raise ValueError("Must provide batch data for current iteration.")
        batch = self.prepare_batch(batchdata, engine.state.device, engine.non_blocking)
        if len(batch) == 2:
            inputs, targets = batch
            args: tuple = ()
            kwargs: dict = {}
        else:
            inputs, targets, args, kwargs = batch
        inputs = to_jax(inputs.data if isinstance(inputs, MetaImage) else inputs)
        targets_j = to_jax(targets.data if isinstance(targets, MetaImage) else targets)

        if self._compiled_step is None:
            self._compiled_step = self._build_step()
        engine.fire_event(IterationEvents.FORWARD_COMPLETED)
        loss, preds = self._compiled_step(self.network, self.optimizer, inputs, targets_j)
        engine.fire_event(IterationEvents.LOSS_COMPLETED)
        engine.fire_event(IterationEvents.BACKWARD_COMPLETED)
        engine.fire_event(IterationEvents.MODEL_COMPLETED)
        return {Keys.IMAGE: inputs, Keys.LABEL: targets, Keys.PRED: preds, Keys.LOSS: loss}
