"""Tensor parallelism: shard parameter channels / attention heads over a 'model'
mesh axis.

The reference has NO tensor parallelism (SURVEY §2.13 marks it optional — it is a
single-node DDP library); this is the TPU-native extension needed for MAISI-scale
diffusion nets: annotate parameter shardings over a ('data', 'model') mesh and let
XLA GSPMD partition the matmuls/convs and insert the all-reduces on ICI.

Design (jax-idiomatic, "How to Scale Your Model" recipe):
- a RULES list of (path-regex, PartitionSpec-builder) pairs decides each parameter's
  placement; defaults shard attention qkv/out projections and MLP kernels on their
  feature dims and conv kernels on the output-channel dim when divisible;
- ``shard_module_tp`` device_puts every parameter with its NamedSharding;
- the train/forward step itself needs NO changes: batch stays sharded on 'data',
  XLA propagates the param shardings through the graph (Megatron-style column/row
  parallel falls out of the annotations).
"""
from __future__ import annotations

import re
from typing import Any, Callable, Sequence

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["default_tp_rules", "tp_spec_for", "shard_module_tp", "make_tp_train_step"]


def default_tp_rules(model_axis: str = "model"):
    """(path-regex, spec_fn(shape, axis_size) -> PartitionSpec|None) pairs, first hit
    wins. spec_fn returns None to fall through to the next rule."""

    def _last_dim(shape, n):
        if len(shape) >= 1 and shape[-1] % n == 0 and shape[-1] >= n:
            return P(*([None] * (len(shape) - 1) + [model_axis]))
        return None

    def _first_dim(shape, n):
        if len(shape) >= 1 and shape[0] % n == 0 and shape[0] >= n:
            return P(*([model_axis] + [None] * (len(shape) - 1)))
        return None

    return [
        # attention projections: qkv column-parallel (heads live in the last dim),
        # output projection row-parallel
        (re.compile(r"(qkv|query|key|value|to_q|to_k|to_v)"), _last_dim),
        (re.compile(r"(out_proj|proj_out|to_out)"), _first_dim),
        # MLP: first linear column-parallel, second row-parallel
        (re.compile(r"(mlp.*(fc1|linear1|gate|up)|fc1|linear1)"), _last_dim),
        (re.compile(r"(mlp.*(fc2|linear2|down)|fc2|linear2)"), _first_dim),
        # conv kernels (nnx.Conv: (*window, in, out)): shard output channels
        (re.compile(r"(conv|Conv).*kernel"), _last_dim),
        # generic large linears: column-parallel
        (re.compile(r"kernel$"), _last_dim),
    ]


def tp_spec_for(path: str, shape: Sequence[int], mesh: Mesh, model_axis: str = "model",
                rules=None) -> P:
    """Resolve the PartitionSpec for one parameter; replicated when nothing matches."""
    if model_axis not in mesh.axis_names:
        return P()
    n = mesh.shape[model_axis]
    for pattern, spec_fn in (rules if rules is not None else default_tp_rules(model_axis)):
        if pattern.search(path):
            spec = spec_fn(tuple(shape), n)
            if spec is not None:
                return spec
    return P()


def shard_module_tp(model: nnx.Module, mesh: Mesh, model_axis: str = "model",
                    rules=None) -> nnx.Module:
    """Place every parameter according to the TP rules (replicate non-matching ones
    and all non-param state). Returns the same module, updated in place."""
    state = nnx.state(model)
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    new_leaves = []
    for path, leaf in flat:
        if not hasattr(leaf, "ndim"):
            new_leaves.append(leaf)
            continue
        path_str = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        spec = tp_spec_for(path_str, np.shape(leaf), mesh, model_axis, rules)
        new_leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    nnx.update(model, jax.tree_util.tree_unflatten(treedef, new_leaves))
    return model


def make_tp_train_step(loss_function: Callable, mesh: Mesh, data_axis: str = "data",
                       amp: bool = False):
    """DP×TP train step over a ('data', 'model') mesh: the batch is sharded on
    'data', parameters keep whatever (TP) shardings they carry, and XLA inserts
    both the TP all-reduces and the DP gradient reduction."""
    batch_sharding = NamedSharding(mesh, P(data_axis))

    @nnx.jit
    def train_step(model, optimizer, inputs, targets):
        import jax.numpy as jnp

        inputs = jax.lax.with_sharding_constraint(inputs, batch_sharding)
        targets = jax.lax.with_sharding_constraint(targets, batch_sharding)

        def loss_fn(m):
            x = inputs.astype(jnp.bfloat16) if amp else inputs
            preds = m(x).astype(jnp.float32)
            return loss_function(preds, targets)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    return train_step
