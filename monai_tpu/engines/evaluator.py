"""Evaluators (reference: monai/engines/evaluator.py:44 Evaluator, :278
SupervisedEvaluator, :350 EnsembleEvaluator)."""
from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import jax.numpy as jnp
from flax import nnx

from ..data.meta_image import MetaImage
from ..inferers.inferer import Inferer, SimpleInferer
from ..utils.backend import to_jax
from ..utils.enums import CommonKeys as Keys
from ..utils.misc import ensure_tuple
from .events import Events, IterationEvents
from .utils import default_prepare_batch
from .workflow import Workflow

__all__ = ["Evaluator", "SupervisedEvaluator", "EnsembleEvaluator"]


class Evaluator(Workflow):
    """One-epoch evaluation run (reference: evaluator.py:44)."""

    def __init__(self, device=None, val_data_loader: Iterable | None = None, epoch_length: int | None = None,
                 non_blocking: bool = False, prepare_batch: Callable = default_prepare_batch,
                 iteration_update: Callable | None = None, postprocessing: Callable | None = None,
                 key_val_metric: dict | None = None, additional_metrics: dict | None = None,
                 metric_cmp_fn: Callable = lambda cur, best: cur > best, val_handlers: Sequence | None = None,
                 amp: bool = False, mode: str = "eval", event_names: list | None = None,
                 event_to_attr: dict | None = None, decollate: bool = True, to_kwargs: dict | None = None,
                 amp_kwargs: dict | None = None):
        super().__init__(device=device, max_epochs=1, data_loader=val_data_loader,
                         epoch_length=epoch_length, non_blocking=non_blocking, prepare_batch=prepare_batch,
                         iteration_update=iteration_update, postprocessing=postprocessing,
                         key_metric=key_val_metric, additional_metrics=additional_metrics,
                         metric_cmp_fn=metric_cmp_fn, handlers=val_handlers, amp=amp,
                         event_names=event_names, event_to_attr=event_to_attr, decollate=decollate,
                         to_kwargs=to_kwargs, amp_kwargs=amp_kwargs)
        self.mode = mode

    def run(self, global_epoch: int = 1) -> None:
        """Reset and evaluate (reference: evaluator.py:—)."""
        self.state.max_epochs = max(self.state.epoch + 1, 1)
        self.state.epoch = max(self.state.epoch, 0)
        # reference parity: network.eval()/train() around the evaluation run
        # (evaluator.py mode handling) — in nnx this freezes dropout and makes
        # BatchNorm read running stats instead of mutating them under jit
        net = getattr(self, "network", None)
        if isinstance(net, nnx.Module):
            net.eval() if self.mode == "eval" else net.train()
        try:
            super().run()
        finally:
            if isinstance(net, nnx.Module):
                net.train()

    def get_stats(self, *vars_name: str):
        return super().get_stats("output", "batch", *vars_name)


class SupervisedEvaluator(Evaluator):
    """Standard evaluation with an inferer (reference: evaluator.py:278)."""

    def __init__(self, device=None, val_data_loader: Iterable | None = None, network: Any = None,
                 epoch_length: int | None = None, non_blocking: bool = False,
                 prepare_batch: Callable = default_prepare_batch, iteration_update: Callable | None = None,
                 inferer: Inferer | None = None, postprocessing: Callable | None = None,
                 key_val_metric: dict | None = None, additional_metrics: dict | None = None,
                 metric_cmp_fn: Callable = lambda cur, best: cur > best, val_handlers: Sequence | None = None,
                 amp: bool = False, mode: str = "eval", event_names: list | None = None,
                 event_to_attr: dict | None = None, decollate: bool = True, to_kwargs: dict | None = None,
                 amp_kwargs: dict | None = None, compile: bool = False, compile_kwargs: dict | None = None):
        super().__init__(device=device, val_data_loader=val_data_loader, epoch_length=epoch_length,
                         non_blocking=non_blocking, prepare_batch=prepare_batch,
                         iteration_update=iteration_update, postprocessing=postprocessing,
                         key_val_metric=key_val_metric, additional_metrics=additional_metrics,
                         metric_cmp_fn=metric_cmp_fn, val_handlers=val_handlers, amp=amp, mode=mode,
                         event_names=event_names, event_to_attr=event_to_attr, decollate=decollate,
                         to_kwargs=to_kwargs, amp_kwargs=amp_kwargs)
        self.network = network
        self.inferer = SimpleInferer() if inferer is None else inferer
        self._fwd = None
        self._predictor = None

    def _iteration(self, engine, batchdata: dict) -> dict:
        if batchdata is None:
            raise ValueError("Must provide batch data for current iteration.")
        batch = self.prepare_batch(batchdata, engine.state.device, engine.non_blocking)
        if len(batch) == 2:
            inputs, targets = batch
            args: tuple = ()
            kwargs: dict = {}
        else:
            inputs, targets, args, kwargs = batch
        inputs_j = to_jax(inputs.data if isinstance(inputs, MetaImage) else inputs)
        if self.amp:
            inputs_j = inputs_j.astype(jnp.bfloat16)
        if self._predictor is None:
            # built ONCE: a stable predictor identity lets sliding_window_inference's
            # jit cache hit across iterations. An nnx.Module network is passed to
            # non-Simple inferers as-is — sliding_window_inference splits it and
            # passes the weights as jit arguments (updates between validations are
            # picked up; the predictor also works under jax.eval_shape). For
            # SimpleInferer an nnx.jit wrapper provides the compiled forward.
            if isinstance(self.network, nnx.Module) and not isinstance(self.inferer, SimpleInferer):
                self._predictor = self.network
            else:
                @nnx.jit
                def _fwd(model, x):
                    return model(x)

                self._fwd = _fwd
                self._predictor = lambda x, *a, **kw: self._fwd(self.network, x)
        preds = self.inferer(inputs_j, self._predictor, *args, **kwargs)
        preds = preds.astype(jnp.float32) if hasattr(preds, "astype") else preds
        engine.fire_event(IterationEvents.FORWARD_COMPLETED)
        engine.fire_event(IterationEvents.MODEL_COMPLETED)
        return {Keys.IMAGE: inputs, Keys.LABEL: targets, Keys.PRED: preds}


class EnsembleEvaluator(Evaluator):
    """Evaluate several networks per batch (reference: evaluator.py:350)."""

    def __init__(self, device=None, val_data_loader: Iterable | None = None, networks: Sequence | None = None,
                 pred_keys: Sequence[str] | None = None, epoch_length: int | None = None,
                 non_blocking: bool = False, prepare_batch: Callable = default_prepare_batch,
                 iteration_update: Callable | None = None, inferer: Inferer | None = None,
                 postprocessing: Callable | None = None, key_val_metric: dict | None = None,
                 additional_metrics: dict | None = None, metric_cmp_fn: Callable = lambda c, b: c > b,
                 val_handlers: Sequence | None = None, amp: bool = False, mode: str = "eval",
                 event_names: list | None = None, event_to_attr: dict | None = None,
                 decollate: bool = True, to_kwargs: dict | None = None, amp_kwargs: dict | None = None):
        super().__init__(device=device, val_data_loader=val_data_loader, epoch_length=epoch_length,
                         non_blocking=non_blocking, prepare_batch=prepare_batch,
                         iteration_update=iteration_update, postprocessing=postprocessing,
                         key_val_metric=key_val_metric, additional_metrics=additional_metrics,
                         metric_cmp_fn=metric_cmp_fn, val_handlers=val_handlers, amp=amp, mode=mode,
                         event_names=event_names, event_to_attr=event_to_attr, decollate=decollate,
                         to_kwargs=to_kwargs, amp_kwargs=amp_kwargs)
        self.networks = ensure_tuple(networks)
        self.pred_keys = ([f"{Keys.PRED}_{i}" for i in range(len(self.networks))]
                          if pred_keys is None else list(ensure_tuple(pred_keys)))
        if len(self.pred_keys) != len(self.networks):
            raise ValueError("length of `pred_keys` must be same as `networks`.")
        self.inferer = SimpleInferer() if inferer is None else inferer

    def _iteration(self, engine, batchdata: dict) -> dict:
        batch = self.prepare_batch(batchdata, engine.state.device, engine.non_blocking)
        if len(batch) == 2:
            inputs, targets = batch
            args, kwargs = (), {}
        else:
            inputs, targets, args, kwargs = batch
        inputs_j = to_jax(inputs.data if isinstance(inputs, MetaImage) else inputs)
        predictions = {Keys.IMAGE: inputs, Keys.LABEL: targets}
        for idx, network in enumerate(self.networks):
            predictions[self.pred_keys[idx]] = self.inferer(inputs_j, network, *args, **kwargs)
        engine.fire_event(IterationEvents.FORWARD_COMPLETED)
        engine.fire_event(IterationEvents.MODEL_COMPLETED)
        return predictions
