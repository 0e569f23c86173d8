"""Checkpoint save/load handlers backed by orbax.

Parity targets: monai/handlers/checkpoint_saver.py:33 (key-metric N-best, interval,
final, save-on-exception, resume) and checkpoint_loader.py:31 (strict/partial load).
"""
from __future__ import annotations

import os
import warnings
from collections.abc import Mapping
from pathlib import Path
from typing import Any

import numpy as np

from ..engines.events import Events

__all__ = ["CheckpointSaver", "CheckpointLoader", "save_checkpoint", "load_checkpoint"]


def _state_of(obj: Any):
    """Extract a savable pytree from an nnx module / optimizer / engine / raw pytree."""
    try:
        from flax import nnx

        if isinstance(obj, nnx.Module) or isinstance(obj, nnx.Optimizer):
            return nnx.state(obj)
    except Exception:
        pass
    state = getattr(obj, "state", None)
    if state is not None and hasattr(state, "epoch") and hasattr(state, "iteration"):
        # an engine/Workflow: save the ignite-style state_dict (epoch/iteration/max)
        return {"epoch": np.int64(state.epoch), "iteration": np.int64(state.iteration),
                "max_epochs": np.int64(state.max_epochs)}
    return obj


def _np_leaf(x):
    """numpy-ify a leaf; typed PRNG keys are stored as their raw uint32 key data."""
    import jax

    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(x))
    return np.asarray(x)


def save_checkpoint(save_dict: Mapping[str, Any], path: str) -> None:
    """Write a checkpoint directory with one orbax item per key."""
    import orbax.checkpoint as ocp

    path_p = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    import jax

    tree = {k: jax.tree_util.tree_map(_np_leaf, _tree_of(_state_of(v))) for k, v in save_dict.items()}
    ckptr.save(path_p, tree, force=True)


def _tree_of(state):
    try:
        from flax import nnx

        if isinstance(state, nnx.State):
            return nnx.to_pure_dict(state) if hasattr(nnx, "to_pure_dict") else state.to_pure_dict()
    except Exception:
        pass
    return state


def load_checkpoint(load_dict: Mapping[str, Any], path: str, strict: bool = True) -> None:
    """Restore checkpoint contents into live objects (in place for nnx modules)."""
    import orbax.checkpoint as ocp
    from flax import nnx

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(Path(path).absolute())
    for k, obj in load_dict.items():
        if k not in restored:
            if strict:
                raise KeyError(f"checkpoint missing key {k}")
            continue
        data = restored[k]
        if isinstance(obj, (nnx.Module, nnx.Optimizer)):
            state = nnx.state(obj)
            # re-wrap raw uint32 key data where the live leaf is a typed PRNG key
            import jax
            import jax.numpy as jnp

            def _rewrap(r, live):
                if hasattr(live, "dtype") and jax.dtypes.issubdtype(live.dtype, jax.dtypes.prng_key):
                    return jax.random.wrap_key_data(jnp.asarray(r, dtype=jnp.uint32))
                return r

            try:
                data = jax.tree_util.tree_map(_rewrap, data, _tree_of(state))
            except Exception:
                pass
            try:
                if hasattr(nnx, "replace_by_pure_dict"):
                    nnx.replace_by_pure_dict(state, data)
                else:
                    state.replace_by_pure_dict(data)
                nnx.update(obj, state)
            except Exception as e:
                if strict:
                    raise
                warnings.warn(f"partial restore for {k}: {e}")
        elif isinstance(obj, dict):
            obj.update(data)
        elif (getattr(obj, "state", None) is not None and hasattr(obj.state, "epoch")
              and isinstance(data, Mapping) and "epoch" in data):
            # an engine/Workflow: restore epoch/iteration so training resumes in place
            obj.state.epoch = int(data["epoch"])
            obj.state.iteration = int(data["iteration"])


class CheckpointSaver:
    """Save checkpoints on key-metric improvement / every N epochs / final / exception
    (reference: checkpoint_saver.py:33)."""

    def __init__(self, save_dir: str, save_dict: Mapping[str, Any], name: str | None = None,
                 file_prefix: str = "", save_final: bool = False, final_filename: str | None = None,
                 save_key_metric: bool = False, key_metric_name: str | None = None,
                 key_metric_n_saved: int = 1, key_metric_filename: str | None = None,
                 key_metric_save_state: bool = False, key_metric_greater_or_equal: bool = False,
                 key_metric_negative_sign: bool = False, epoch_level: bool = True,
                 save_interval: int = 0, n_saved: int | None = None):
        if save_dir is None:
            raise AssertionError("must provide directory to save the checkpoints.")
        if key_metric_filename is not None and key_metric_n_saved > 1:
            # a fixed filename cannot hold N distinct best checkpoints: every save
            # would overwrite the same path and eviction would delete the survivors
            # (reference: checkpoint_saver.py:33 raises the same)
            raise ValueError("if using fixed filename to save the best metric model, we should only save 1 model.")
        self.save_dir = save_dir
        self.save_dict = save_dict
        self.file_prefix = file_prefix
        self.save_final = save_final
        self.final_filename = final_filename
        self.save_key_metric = save_key_metric
        self.key_metric_name = key_metric_name
        self.key_metric_n_saved = key_metric_n_saved
        self.key_metric_filename = key_metric_filename
        self.key_metric_greater_or_equal = key_metric_greater_or_equal
        self.key_metric_negative_sign = key_metric_negative_sign
        self.epoch_level = epoch_level
        self.save_interval = save_interval
        self.n_saved = n_saved
        self._key_saved: list[tuple[float, str]] = []
        self._interval_saved: list[str] = []

    def attach(self, engine) -> None:
        if self.save_final:
            engine.add_event_handler(Events.COMPLETED, self.completed)
            engine.add_event_handler(Events.EXCEPTION_RAISED, self.exception_raised)
        if self.save_key_metric:
            engine.add_event_handler(Events.EPOCH_COMPLETED, self.metrics_completed)
        if self.save_interval > 0:
            event = Events.EPOCH_COMPLETED if self.epoch_level else Events.ITERATION_COMPLETED
            engine.add_event_handler(event, self.interval_completed, every=self.save_interval)

    def _path(self, name: str) -> str:
        prefix = f"{self.file_prefix}_" if self.file_prefix else ""
        return os.path.join(self.save_dir, f"{prefix}{name}")

    def completed(self, engine) -> None:
        name = self.final_filename or f"checkpoint_final_iteration={engine.state.iteration}.ckpt"
        save_checkpoint(self.save_dict, self._path(name))

    def exception_raised(self, engine, e: Exception | None = None) -> None:
        name = self.final_filename or f"checkpoint_final_iteration={engine.state.iteration}.ckpt"
        save_checkpoint(self.save_dict, self._path(name))
        if e is not None:
            raise e

    def metrics_completed(self, engine) -> None:
        key_name = self.key_metric_name or engine.state.key_metric_name
        if key_name is None or key_name not in engine.state.metrics:
            return
        metric = float(engine.state.metrics[key_name])
        if self.key_metric_negative_sign:
            metric = -metric
        if len(self._key_saved) < self.key_metric_n_saved or metric > self._key_saved[-1][0] or (
                self.key_metric_greater_or_equal and metric >= self._key_saved[-1][0]):
            name = self.key_metric_filename or f"{key_name}={metric:.4f}_epoch={engine.state.epoch}.ckpt"
            path = self._path(name)
            save_checkpoint(self.save_dict, path)
            self._key_saved.append((metric, path))
            self._key_saved.sort(key=lambda t: -t[0])
            while len(self._key_saved) > self.key_metric_n_saved:
                _, old = self._key_saved.pop()
                _remove_path(old)

    def interval_completed(self, engine) -> None:
        tag = f"epoch={engine.state.epoch}" if self.epoch_level else f"iteration={engine.state.iteration}"
        path = self._path(f"checkpoint_{tag}.ckpt")
        save_checkpoint(self.save_dict, path)
        self._interval_saved.append(path)
        if self.n_saved is not None:
            while len(self._interval_saved) > self.n_saved:
                _remove_path(self._interval_saved.pop(0))


def _remove_path(path: str) -> None:
    import shutil

    try:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
    except OSError:
        pass


class CheckpointLoader:
    """Load a checkpoint at engine start (reference: checkpoint_loader.py:31)."""

    def __init__(self, load_path: str, load_dict: Mapping[str, Any], name: str | None = None,
                 map_location=None, strict: bool = True, strict_shape: bool = True):
        if load_path is None:
            raise AssertionError("must provide clear path to load checkpoint.")
        self.load_path = load_path
        self.load_dict = load_dict
        self.strict = strict

    def attach(self, engine) -> None:
        engine.add_event_handler(Events.STARTED, self)

    def __call__(self, engine) -> None:
        load_checkpoint(self.load_dict, self.load_path, strict=self.strict)
