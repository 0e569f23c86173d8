"""Network-related utilities.

Parity targets: monai/networks/utils.py (one_hot:170, normalize_transform:—, pixelshuffle:370,
copy_model_state:542, eval_mode/train_mode:458,493, meshgrid_ij:1071).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.backend import is_jax, xp

__all__ = ["one_hot", "pixelshuffle", "meshgrid_ij", "normal_init", "copy_model_state", "count_params",
           "cast_params_to_compute", "amp_model_view"]


def one_hot(labels: Any, num_classes: int, dtype=jnp.float32, dim: int = 1) -> Any:
    """One-hot encode along ``dim`` assuming the current ``dim`` is singleton
    (reference: monai/networks/utils.py:170)."""
    ns = xp(labels)
    if labels.ndim < dim + 1:
        # scalar/low-rank labels (e.g. classification class indices): add singleton
        # dims at the end, as the reference does (networks/utils.py:207)
        labels = labels.reshape(list(labels.shape) + [1] * (dim + 1 - labels.ndim))
    shape = list(labels.shape)
    if shape[dim] != 1:
        raise AssertionError("labels should have a channel with length equal to one.")
    labels_int = labels.astype(ns.int32)
    squeezed = ns.squeeze(labels_int, axis=dim)
    if ns is jnp:
        oh = jax.nn.one_hot(squeezed, num_classes, axis=dim, dtype=dtype)
    else:
        eye = np.eye(num_classes, dtype=dtype)
        oh = eye[squeezed]  # (..., num_classes) at the end
        oh = np.moveaxis(oh, -1, dim)
    return oh


def pixelshuffle(x: Any, spatial_dims: int, scale_factor: int) -> Any:
    """Depth-to-space upscaling for N-D (reference: monai/networks/utils.py:370)."""
    dim, factor = spatial_dims, scale_factor
    input_size = list(x.shape)
    batch_size, channels = input_size[:2]
    scale_divisor = factor**dim
    if channels % scale_divisor != 0:
        raise ValueError(f"Number of input channels ({channels}) must be evenly divisible by scale_factor ** dimensions ({factor}**{dim}={scale_divisor}).")
    org_channels = channels // scale_divisor
    output_size = [batch_size, org_channels] + [d * factor for d in input_size[2:]]
    ns = xp(x)
    indices = list(range(2, 2 + 2 * dim))
    indices = indices[dim:] + indices[:dim]
    permute_indices = [0, 1]
    for idx in range(dim):
        permute_indices.extend([indices[idx], indices[idx + dim]])
    x = x.reshape([batch_size, org_channels] + [factor] * dim + input_size[2:])
    x = ns.transpose(x, permute_indices[:2] + [i for pair in zip(range(2 + dim, 2 + 2 * dim), range(2, 2 + dim)) for i in pair])
    return x.reshape(output_size)


def meshgrid_ij(*tensors):
    ns = jnp if any(is_jax(t) for t in tensors) else np
    return ns.meshgrid(*tensors, indexing="ij")


def normal_init(key, shape, std: float = 0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def copy_model_state(dst_params: dict, src_params: dict, exclude_vars: str = "",
                     inplace: bool = True) -> tuple[dict, list, list]:
    """Copy matching-named, matching-shaped leaves between parameter pytrees
    (reference: monai/networks/utils.py:542)."""
    import re

    flat_src = _flatten_dict(src_params)
    flat_dst = _flatten_dict(dst_params)
    to_skip = {k for k in flat_dst if exclude_vars and re.compile(exclude_vars).search(k)}
    updated, unchanged = [], []
    out = dict(flat_dst)
    for k, v in flat_dst.items():
        if k in to_skip or k not in flat_src:
            unchanged.append(k)
            continue
        s = flat_src[k]
        if hasattr(s, "shape") and hasattr(v, "shape") and tuple(s.shape) == tuple(v.shape):
            out[k] = s
            updated.append(k)
        else:
            unchanged.append(k)
    return _unflatten_dict(out), updated, unchanged


def _flatten_dict(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_dict(v, key))
        else:
            out[key] = v
    return out


def _unflatten_dict(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params) if hasattr(p, "shape"))


def pixelunshuffle(x: Any, spatial_dims: int, scale_factor: int) -> Any:
    """Inverse of pixelshuffle: fold (f, ...) spatial blocks into channels
    (reference: networks/utils.py:415)."""
    f = scale_factor
    b, c = x.shape[:2]
    spatial = x.shape[2:]
    if any(s % f != 0 for s in spatial):
        raise ValueError(f"spatial shape {spatial} not divisible by {f}.")
    # (B, C, h, f, w, f, ...) -> (B, C, f, f, ..., h, w, ...)
    new_shape = [b, c]
    for s in spatial:
        new_shape.extend([s // f, f])
    y = jnp.reshape(x, new_shape)
    perm = [0, 1] + [3 + 2 * d for d in range(spatial_dims)] + [2 + 2 * d for d in range(spatial_dims)]
    y = jnp.transpose(y, perm)
    return jnp.reshape(y, (b, c * f ** spatial_dims) + tuple(s // f for s in spatial))


def meshgrid_xy(*tensors):
    """'xy'-indexed meshgrid (reference: networks/utils.py meshgrid_xy)."""
    return jnp.meshgrid(*tensors, indexing="xy")


def predict_segmentation(logits: Any, mutually_exclusive: bool = False,
                         threshold: float = 0.0) -> Any:
    """Discrete labels from logits: threshold (multi-label) or channel argmax
    (multi-class) (reference: networks/utils.py predict_segmentation)."""
    import warnings

    if not mutually_exclusive:
        return (logits >= threshold).astype(jnp.int32)
    if logits.shape[1] == 1:
        warnings.warn("single channel prediction, `mutually_exclusive=True` ignored, "
                      "use threshold instead.")
        return (logits >= threshold).astype(jnp.int32)
    return jnp.argmax(logits, axis=1, keepdims=True)


class eval_mode:
    """Context manager putting nnx modules in eval mode and restoring after
    (reference: networks/utils.py:458 eval_mode; no_grad is implicit in jax)."""

    def __init__(self, *modules):
        self.modules = modules

    def __enter__(self):
        for m in self.modules:
            if hasattr(m, "eval"):
                m.eval()
        return self.modules

    def __exit__(self, *exc):
        for m in self.modules:
            if hasattr(m, "train"):
                m.train()
        return False


class train_mode:
    """Context manager putting nnx modules in train mode and restoring after
    (reference: networks/utils.py:493 train_mode)."""

    def __init__(self, *modules):
        self.modules = modules

    def __enter__(self):
        for m in self.modules:
            if hasattr(m, "train"):
                m.train()
        return self.modules

    def __exit__(self, *exc):
        for m in self.modules:
            if hasattr(m, "eval"):
                m.eval()
        return False


def get_state_dict(obj):
    """Flat {path: array} state of an nnx module or pytree
    (reference: networks/utils.py get_state_dict)."""
    from flax import nnx as _nnx

    if isinstance(obj, _nnx.Module):
        state = _nnx.state(obj)
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.to_pure_dict())[0]:
            key = ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            flat[key] = leaf
        return flat
    return obj


def save_state(src, path, **kwargs):
    """Save a module/state dict to ``path`` via numpy .npz
    (reference: networks/utils.py save_state; torch.save -> npz here)."""
    import numpy as _np

    flat = get_state_dict(src)
    _np.savez(path, **{k: _np.asarray(v) for k, v in flat.items()})


def look_up_named_module(name: str, mod, print_all_options: bool = False):
    """Fetch a submodule by dotted path, None if absent
    (reference: networks/utils.py look_up_named_module)."""
    obj = mod
    for part in name.split("."):
        if not part:
            continue
        if part.isdigit():
            try:
                obj = obj[int(part)]
                continue
            except Exception:
                return None
        if not hasattr(obj, part):
            return None
        obj = getattr(obj, part)
    return obj


def set_named_module(mod, name: str, new_layer):
    """Replace the submodule at dotted path ``name`` with ``new_layer``
    (reference: networks/utils.py set_named_module)."""
    *parents, last = name.split(".")
    obj = mod
    for part in parents:
        obj = obj[int(part)] if part.isdigit() else getattr(obj, part)
    if last.isdigit():
        obj[int(last)] = new_layer
    else:
        setattr(obj, last, new_layer)
    return mod


def replace_modules_by_type(parent, match_type, constructor) -> list:
    """Replace every child module of ``match_type`` with ``constructor(old)``;
    returns (path, old) pairs (reference: networks/utils.py replace_modules)."""
    from flax import nnx as _nnx

    replaced = []

    def _walk(mod, prefix):
        for attr in list(vars(mod)):
            child = getattr(mod, attr)
            if isinstance(child, match_type):
                setattr(mod, attr, constructor(child))
                replaced.append((f"{prefix}{attr}", child))
            elif isinstance(child, _nnx.Module):
                _walk(child, f"{prefix}{attr}.")
            elif isinstance(child, (list, _nnx.List)):
                for i, item in enumerate(child):
                    if isinstance(item, match_type):
                        child[i] = constructor(item)
                        replaced.append((f"{prefix}{attr}.{i}", item))
                    elif isinstance(item, _nnx.Module):
                        _walk(item, f"{prefix}{attr}.{i}.")

    _walk(parent, "")
    return replaced


replace_modules = replace_modules_by_type


def freeze_layers(model, freeze_vars=None, exclude_vars=None):
    """Mark matching parameters as frozen by converting nnx.Param leaves whose
    path matches to non-trainable Variables is not supported in-place; instead
    this returns an `optax.multi_transform`-style mask pytree: True = trainable
    (reference: networks/utils.py freeze_layers — torch sets requires_grad).

    Use with `optax.masked(optimizer, mask)` in the training step.
    """
    import re
    from flax import nnx as _nnx

    state = _nnx.state(model, _nnx.Param)
    flat, treedef = jax.tree_util.tree_flatten_with_path(state.to_pure_dict())
    mask_leaves = []
    for path, _ in flat:
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        trainable = True
        if freeze_vars is not None and re.compile(freeze_vars).search(name):
            trainable = False
        if exclude_vars is not None and not re.compile(exclude_vars).search(name):
            trainable = False
        mask_leaves.append(trainable)
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def convert_to_onnx(*args, **kwargs):
    """Not applicable on TPU: export with `jax.export` / StableHLO instead
    (reference: networks/utils.py:661 convert_to_onnx)."""
    raise NotImplementedError(
        "ONNX export is a torch workflow; on TPU use jax.export (StableHLO) or "
        "jax.jit(...).lower(...).compile() AOT artifacts.")


def convert_to_torchscript(*args, **kwargs):
    """Not applicable on TPU (reference: networks/utils.py:788)."""
    raise NotImplementedError(
        "TorchScript export is a torch workflow; on TPU use jax.export or AOT "
        "lowering via jax.jit(...).lower(...).")


def convert_to_trt(*args, **kwargs):
    """Not applicable on TPU: XLA is the ahead-of-time compiler here
    (reference: networks/utils.py:932)."""
    raise NotImplementedError(
        "TensorRT is CUDA-only; XLA compiles the TPU program — use "
        "jax.jit(...).lower(...).compile() for AOT compilation.")


def cast_params_to_compute(params, dtype=jnp.bfloat16):
    """Cast every floating-point leaf of a parameter pytree to ``dtype``,
    leaving integer/PRNG leaves untouched.

    The TPU mixed-precision training contract (reference analog: torch.autocast
    in engines, monai/engines/trainer.py:194-278 with amp=True): keep the f32
    master copy OUTSIDE the jitted step, cast to bf16 INSIDE the loss so the MXU
    runs bf16 convolutions, and let autodiff deliver f32 gradients to the
    optimizer through the cast.  Casting only the *input* does nothing — JAX
    type promotion silently widens bf16 activations back to f32 at the first
    f32-weight convolution (an 8x MXU throughput cliff, measured in
    scripts/perf_train_bisect.py)."""
    return jax.tree_util.tree_map(
        lambda t: t.astype(dtype)
        if hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jnp.floating) else t,
        params)


def amp_model_view(model, dtype=jnp.bfloat16):
    """Return a compute-dtype view of an nnx model: same graph, floating params
    cast to ``dtype``.  Use inside a loss closure so gradients flow to the f32
    master parameters held by the caller/optimizer (see cast_params_to_compute)."""
    from flax import nnx

    graphdef, state = nnx.split(model)
    return nnx.merge(graphdef, cast_params_to_compute(state, dtype))


def cast_tensor(x, from_dtype=jnp.float16, to_dtype=jnp.float32):
    """Cast arrays of ``from_dtype`` to ``to_dtype``, recursively through pytrees
    (reference: networks/utils.py cast_tensor)."""
    return jax.tree_util.tree_map(
        lambda t: t.astype(to_dtype) if hasattr(t, "dtype") and t.dtype == jnp.dtype(from_dtype) else t, x)


def cast_all(x, from_dtype=jnp.float16, to_dtype=jnp.float32):
    """Alias of cast_tensor over arbitrary containers (reference: networks/utils.py
    cast_all)."""
    return cast_tensor(x, from_dtype, to_dtype)


class CastTempType:
    """Wrap a module: cast input to a temporary dtype for the submodule, cast the
    output back (reference: networks/utils.py:1228 CastTempType)."""

    def __init__(self, initial_type, temporary_type, submodule):
        self.initial_type = jnp.dtype(initial_type)
        self.temporary_type = jnp.dtype(temporary_type)
        self.submodule = submodule

    def __call__(self, x, *args, **kwargs):
        dtype = x.dtype
        if dtype == self.initial_type:
            x = x.astype(self.temporary_type)
        out = self.submodule(x, *args, **kwargs)
        if hasattr(out, "dtype") and out.dtype == self.temporary_type and dtype == self.initial_type:
            out = out.astype(self.initial_type)
        return out


# the reference exports these from monai.networks.utils as well; the implementations
# live with the layers they serve
def __getattr__(name):
    if name in ("normalize_transform", "to_norm_affine"):
        from .layers.spatial_transforms import normalize_transform, to_norm_affine

        return {"normalize_transform": normalize_transform, "to_norm_affine": to_norm_affine}[name]
    if name == "icnr_init":
        from .layers.weight_init import icnr_init

        return icnr_init
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


class replace_modules_temp:
    """Context manager: temporarily replace matching child modules, restoring them
    on exit (reference: networks/utils.py replace_modules_temp)."""

    def __init__(self, parent, match_type, constructor):
        self.parent = parent
        self.match_type = match_type
        self.constructor = constructor
        self._replaced: list = []

    def __enter__(self):
        self._replaced = replace_modules_by_type(self.parent, self.match_type, self.constructor)
        return self._replaced

    def __exit__(self, *exc):
        from .utils import set_named_module

        for path, old in self._replaced:
            set_named_module(self.parent, path, old)
        return False


class CastToFloat:
    """Wrapper module running its inner module in float32 and casting the result back
    to the input dtype (reference: networks/utils.py CastToFloat)."""

    def __init__(self, mod):
        self.mod = mod

    def __call__(self, x, *args, **kwargs):
        y = self.mod(x.astype(jnp.float32), *args, **kwargs)
        return y.astype(x.dtype)


def add_casts_around_norms(parent) -> int:
    """Wrap every normalisation layer in CastToFloat so it computes in float32 under
    a bf16 forward — the AMP-safety recipe (reference: networks/utils.py
    add_casts_around_norms, there for fp16 autocast). Returns the number wrapped."""
    from flax import nnx as _nnx

    norm_types = (_nnx.BatchNorm, _nnx.LayerNorm, _nnx.GroupNorm, _nnx.RMSNorm)
    replaced = replace_modules_by_type(parent, norm_types, CastToFloat)
    return len(replaced)


def trt_compile(model, base_path: str, args=None, submodule=None, logger=None):
    """TensorRT is CUDA-only; the TPU analog is XLA AOT compilation — returns the
    model unchanged so reference training scripts keep running
    (reference: networks/trt_compiler.py trt_compile, which also no-ops without TRT)."""
    import warnings

    warnings.warn("trt_compile is a no-op on TPU: XLA compiles jitted programs "
                  "ahead-of-time; see bundle ckpt_export for StableHLO artifacts.")
    return model


class CastToFloatAll(CastToFloat):
    """CastToFloat for modules with multiple return values: every output is cast
    back to the input dtype (reference: networks/utils.py:1289 CastToFloatAll)."""

    def __call__(self, x, *args, **kwargs):
        ys = self.mod(x.astype(jnp.float32), *args, **kwargs)
        if isinstance(ys, tuple):
            return tuple(y.astype(x.dtype) for y in ys)
        return ys.astype(x.dtype)


def get_profile_shapes(input_shape, dynamic_batchsize):
    """Given a sample input shape and a (min, opt, max) dynamic batch triple,
    build the min/opt/max profile shapes (reference: networks/utils.py:76; used
    there for TRT profiles, kept here as a generic shape utility)."""
    def scale_batch_size(shape, scale_num: int):
        scale_shape = list(shape)
        scale_shape[0] = scale_num
        return scale_shape

    if dynamic_batchsize is None:
        return None
    if len(dynamic_batchsize) != 3:
        raise ValueError("dynamic_batchsize needs to be a 3-element sequence (MIN, OPT, MAX)")
    min_input_shape = scale_batch_size(input_shape, dynamic_batchsize[0])
    opt_input_shape = scale_batch_size(input_shape, dynamic_batchsize[1])
    max_input_shape = scale_batch_size(input_shape, dynamic_batchsize[2])
    return min_input_shape, opt_input_shape, max_input_shape


def has_nvfuser_instance_norm() -> bool:
    """Whether the CUDA nvfuser InstanceNorm3dNVFuser extension is usable
    (reference: networks/utils.py:96). Always False on TPU — the fused
    two-moment instance norm in layers/fast_norm.py is the fast path here."""
    return False


def wrap_module(base_t, dest_t):
    """Generator of a swap function that wraps ``base_t`` instances in ``dest_t``
    (reference: networks/utils.py:1306)."""
    def expansion_fn(mod):
        return dest_t(mod)

    return expansion_fn


def simple_replace(base_t, dest_t):
    """Generator of a swap function replacing ``base_t`` modules by ``dest_t``
    built from the module's declared constants; no weights copied (reference:
    networks/utils.py:1323)."""
    def expansion_fn(mod):
        if not isinstance(mod, base_t):
            return None
        constants = getattr(mod, "__constants__", ())
        args = [getattr(mod, name, None) for name in constants]
        return dest_t(*args)

    return expansion_fn
