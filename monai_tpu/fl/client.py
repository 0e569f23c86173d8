"""FL client algorithms.

Parity targets: monai/fl/client/client_algo.py:17-91 (ClientAlgo/ClientAlgoStats ABC),
monai/fl/client/monai_algo.py:311 (MonaiAlgo bundle-driven client, compute_weight_diff:56,
MonaiAlgoStats:85).
"""
from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Any

import numpy as np

from ..bundle.workflows import ConfigWorkflow
from ..utils.backend import to_numpy
from .utils.constants import ExtraItems, FlPhase, FlStatistics, ModelType, WeightType
from .utils.exchange_object import ExchangeObject

__all__ = ["ClientAlgo", "ClientAlgoStats", "MonaiAlgo", "MonaiAlgoStats", "compute_weight_diff"]


class ClientAlgoStats(ABC):
    def initialize(self, extra: dict | None = None) -> None:
        pass

    def finalize(self, extra: dict | None = None) -> None:
        pass

    @abstractmethod
    def get_data_stats(self, extra: dict | None = None) -> ExchangeObject:
        raise NotImplementedError


class ClientAlgo(ClientAlgoStats):
    """FL client lifecycle: initialize/train/get_weights/evaluate/abort/finalize
    (reference: client_algo.py:91)."""

    def abort(self, extra: dict | None = None) -> None:
        pass

    @abstractmethod
    def train(self, data: ExchangeObject, extra: dict | None = None) -> None:
        raise NotImplementedError

    @abstractmethod
    def get_weights(self, extra: dict | None = None) -> ExchangeObject:
        raise NotImplementedError

    @abstractmethod
    def evaluate(self, data: ExchangeObject, extra: dict | None = None) -> ExchangeObject:
        raise NotImplementedError


def compute_weight_diff(global_weights: dict, local_weights: dict) -> dict:
    """Per-leaf weight delta (reference: monai_algo.py:56)."""
    out = {}
    for k, g in global_weights.items():
        if isinstance(g, dict):
            out[k] = compute_weight_diff(g, local_weights[k])
        else:
            out[k] = np.asarray(to_numpy(local_weights[k])) - np.asarray(to_numpy(g))
    return out


def _tree_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(to_numpy(x)) if hasattr(x, "shape") else x, tree)


class MonaiAlgoStats(ClientAlgoStats):
    """Bundle-driven statistics provider (reference: monai_algo.py:85)."""

    def __init__(self, bundle_root: str, config_train_filename: str = "configs/train.json",
                 config_filters_filename=None, train_data_key: str = "train",
                 eval_data_key: str = "eval", data_stats_transform_list=None, workflow=None):
        self.bundle_root = bundle_root
        self.config_train_filename = config_train_filename
        self.train_data_key = train_data_key
        self.eval_data_key = eval_data_key
        self.client_name = "site-0"

    def initialize(self, extra: dict | None = None) -> None:
        extra = extra or {}
        self.client_name = extra.get(ExtraItems.CLIENT_NAME, "site-0")

    def get_data_stats(self, extra: dict | None = None) -> ExchangeObject:
        stats = {FlStatistics.DATA_STATS: {}, FlStatistics.DATA_COUNT: 0}
        return ExchangeObject(statistics=stats)


class MonaiAlgo(ClientAlgo, MonaiAlgoStats):
    """Bundle-driven FL client: runs a ConfigWorkflow trainer/evaluator per round
    (reference: monai_algo.py:311)."""

    def __init__(self, bundle_root: str, local_epochs: int = 1, send_weight_diff: bool = True,
                 config_train_filename: str = "configs/train.json",
                 train_kwargs: dict | None = None,
                 config_evaluate_filename: str = "configs/evaluate.json",
                 eval_kwargs: dict | None = None, config_filters_filename=None,
                 disable_ckpt_loading: bool = True, best_model_filepath: str = "models/model.pt",
                 final_model_filepath: str = "models/model_final.pt", save_dict_key: str = "model",
                 data_stats_transform_list=None, eval_workflow_name: str = "train",
                 train_workflow=None, eval_workflow=None):
        self.bundle_root = bundle_root
        self.local_epochs = local_epochs
        self.send_weight_diff = send_weight_diff
        self.config_train_filename = config_train_filename
        self.config_evaluate_filename = config_evaluate_filename
        self.train_kwargs = train_kwargs or {}
        self.eval_kwargs = eval_kwargs or {}
        self.train_workflow = train_workflow
        self.eval_workflow = eval_workflow
        self.phase = FlPhase.IDLE
        self.client_name = "site-0"
        self.global_weights: dict | None = None
        self._abort = False

    def initialize(self, extra: dict | None = None) -> None:
        extra = extra or {}
        self.client_name = extra.get(ExtraItems.CLIENT_NAME, "site-0")
        if self.train_workflow is None and self.config_train_filename:
            cfg = os.path.join(self.bundle_root, self.config_train_filename)
            if os.path.exists(cfg):
                self.train_workflow = ConfigWorkflow(config_file=cfg, workflow_type="train",
                                                     bundle_root=self.bundle_root, **self.train_kwargs)
        if self.eval_workflow is None and self.config_evaluate_filename:
            cfg = os.path.join(self.bundle_root, self.config_evaluate_filename)
            if os.path.exists(cfg):
                self.eval_workflow = ConfigWorkflow(config_file=cfg, workflow_type="infer",
                                                    bundle_root=self.bundle_root, **self.eval_kwargs)

    def _get_network(self, workflow):
        try:
            return workflow.parser.get_parsed_content("network")
        except Exception:
            return workflow.parser.get_parsed_content("network_def")

    def train(self, data: ExchangeObject, extra: dict | None = None) -> None:
        if self.train_workflow is None:
            raise RuntimeError("train workflow is not initialized; call initialize() with a valid bundle.")
        self.phase = FlPhase.TRAIN
        self.train_workflow.initialize()
        net = self._get_network(self.train_workflow)
        if data.weights is not None:
            from ..handlers.checkpoint import _state_of
            from flax import nnx

            state = nnx.state(net)
            try:
                if hasattr(nnx, "replace_by_pure_dict"):
                    nnx.replace_by_pure_dict(state, data.weights)
                state_obj = state
                nnx.update(net, state_obj)
            except Exception:
                pass
            self.global_weights = _tree_to_numpy(data.weights)
        self.train_workflow.run()
        self.train_workflow.finalize()

    def get_weights(self, extra: dict | None = None) -> ExchangeObject:
        self.phase = FlPhase.GET_WEIGHTS
        if self.train_workflow is None:
            raise RuntimeError("train workflow is not initialized.")
        from flax import nnx

        net = self._get_network(self.train_workflow)
        # exchange trainable parameters only: the full nnx state also carries RNG
        # keys and batch stats, which are not part of the FL weight exchange
        # (reference exchanges state_dict tensors, monai_algo.py get_weights)
        state = nnx.state(net, nnx.Param)
        pure = nnx.to_pure_dict(state) if hasattr(nnx, "to_pure_dict") else state.to_pure_dict()
        local = _tree_to_numpy(pure)
        if self.send_weight_diff and self.global_weights is not None:
            diff = compute_weight_diff(self.global_weights, local)
            return ExchangeObject(weights=diff, weight_type=WeightType.WEIGHT_DIFF)
        return ExchangeObject(weights=local, weight_type=WeightType.WEIGHTS)

    def evaluate(self, data: ExchangeObject, extra: dict | None = None) -> ExchangeObject:
        if self.eval_workflow is None:
            raise RuntimeError("eval workflow is not initialized.")
        self.phase = FlPhase.EVALUATE
        self.eval_workflow.initialize()
        self.eval_workflow.run()
        self.eval_workflow.finalize()
        metrics = {}
        try:
            ev = self.eval_workflow.parser.get_parsed_content("evaluator")
            metrics = dict(ev.state.metrics)
        except Exception:
            pass
        return ExchangeObject(metrics=metrics)

    def abort(self, extra: dict | None = None) -> None:
        self._abort = True
        for wf in (self.train_workflow, self.eval_workflow):
            try:
                trainer = wf.parser.get_parsed_content("train::trainer") if wf else None
                if trainer is not None:
                    trainer.state.terminate = True
            except Exception:
                pass

    def finalize(self, extra: dict | None = None) -> None:
        for wf in (self.train_workflow, self.eval_workflow):
            if wf is not None:
                try:
                    wf.finalize()
                except Exception:
                    pass


BaseClient = ClientAlgo  # ABC alias (reference: fl/client BaseClient)


def convert_global_weights(global_weights, local_var_dict):
    """Reshape FL-server global weights into the local state-dict's shapes
    (reference: monai_algo.py:37). Returns (updated_dict, n_converted)."""
    import numpy as np

    model_keys = set(global_weights.keys())
    n_converted = 0
    for var_name in local_var_dict:
        if var_name in model_keys:
            try:
                weights = np.reshape(np.asarray(global_weights[var_name]),
                                     np.shape(local_var_dict[var_name]))
                local_var_dict[var_name] = weights
                n_converted += 1
            except Exception as e:
                raise ValueError(f"Convert weight from {var_name} failed.") from e
    return local_var_dict, n_converted


def disable_ckpt_loaders(parser) -> None:
    """Disable CheckpointLoader handlers in a bundle validate config (reference:
    monai_algo.py:77)."""
    from ..bundle.config_item import ConfigComponent

    if "validate#handlers" in parser:
        for h in parser["validate#handlers"]:
            if ConfigComponent.is_instantiable(h) and "CheckpointLoader" in h.get("_target_", ""):
                h["_disabled_"] = True
