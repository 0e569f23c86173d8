"""Layer factories: dimension-parametrized layer construction.

Parity targets: monai/networks/layers/factories.py (LayerFactory:76, Conv/Norm/Act/
Pool/Dropout factories :198-204, split_args:—).

Networks in this framework are flax NNX modules.  Public net APIs take channel-first
(B, C, *spatial) arrays (reference convention); internally everything is channel-last —
the TPU-native layout where channels ride the 128-wide lane dimension.
"""
from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep

__all__ = ["LayerFactory", "Conv", "ConvTrans", "Norm", "Act", "Pool", "Dropout", "split_args",
           "get_act_fn", "get_norm_layer", "get_act_layer", "get_dropout_layer", "get_pool_layer"]


class LayerFactory:
    """Name → constructor registry with dimension argument (reference: factories.py:76)."""

    def __init__(self, name: str):
        self.name = name
        self.factories: dict[str, Callable] = {}

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(self.factories)

    def add_factory_callable(self, name: str, func: Callable) -> None:
        self.factories[name.upper()] = func

    def factory_function(self, name: str) -> Callable:
        def _add(func: Callable) -> Callable:
            self.add_factory_callable(name, func)
            return func

        return _add

    def get_constructor(self, factory_name: str, *args) -> Any:
        if not isinstance(factory_name, str):
            raise TypeError(f"factory_name must a str but is {type(factory_name).__name__}.")
        func = self.factories[factory_name.upper()]
        return func(*args)

    def __getitem__(self, args) -> Any:
        if callable(args):
            return args
        if isinstance(args, str):
            name_obj, args = args, ()
        else:
            name_obj, *args = args
        return self.get_constructor(name_obj, *args)

    def __getattr__(self, key):
        if key.upper() in self.factories:
            return key.upper()
        raise AttributeError(f"{self.name} has no factory {key}")


def split_args(args):
    """Split ("name", {kwargs}) specs (reference: factories.py:—)."""
    if isinstance(args, str) or callable(args):
        return args, {}
    name_obj, name_args = args
    if not (isinstance(name_obj, str) or callable(name_obj)) or not isinstance(name_args, dict):
        raise TypeError("Layer specifiers must be single strings or pairs of the form (name/object-types, argument dict)")
    return name_obj, name_args


Conv = LayerFactory("Conv")
ConvTrans = LayerFactory("ConvTrans")
Norm = LayerFactory("Norm")
Act = LayerFactory("Act")
Pool = LayerFactory("Pool")
Dropout = LayerFactory("Dropout")


def use_packed_conv() -> bool:
    """Space-to-depth packed conv for small-channel 3D convs — OPT-IN via
    MONAI_TPU_PACKED_CONV=1.

    Measured on v5e (scripts/perf_packed_ab.py, batch-18 UNet window forward,
    two-K slope timing): packed 61.0 ms vs plain XLA 32.7 ms. The dense-128-lane
    conv itself wins, but each conv pays two full-activation s2d/d2s transposes
    and 8x MACs, which nets out ~2x slower at UNet shapes. Default is therefore
    OFF; the kernel is kept for a future layout-resident variant (pack once per
    level, not per conv)."""
    return os.environ.get("MONAI_TPU_PACKED_CONV", "0") == "1"


class PallasConv(nnx.Conv):
    """nnx.Conv that routes qualifying 3D 3x3x3 stride-1 SAME convs through the
    space-to-depth packed conv (ops/packed_conv.py; fills the 128-lane MXU at
    small channel counts) or, opt-in, the Pallas TPU kernel (ops/pallas_conv3d.py).
    Identical numerics and gradients either way."""

    def __call__(self, x):
        if (len(self.kernel_size) == 3 and tuple(self.kernel_size) == (3, 3, 3)
                and tuple(self.strides) == (1, 1, 1)
                and tuple(self.kernel_dilation) == (1, 1, 1)
                and self.feature_group_count == 1
                and (self.padding == "SAME"
                     or (isinstance(self.padding, (list, tuple))
                         and tuple(map(tuple, self.padding)) == ((1, 1),) * 3))):
            if use_packed_conv() and x.ndim == 5:
                from ...ops.packed_conv import pack_factors, packed_conv3x3

                pack = pack_factors(self.in_features, self.out_features, x.shape[1:4])
                if pack is not None:
                    bias = (self.bias.value if self.use_bias and self.bias is not None
                            else None)
                    return packed_conv3x3(x, self.kernel.value.astype(x.dtype), bias, pack)
            from ...ops.pallas_conv3d import conv3d_3x3_same, use_pallas_conv

            if use_pallas_conv() and x.ndim == 5:
                y = conv3d_3x3_same(x, self.kernel.value.astype(x.dtype))
                if self.use_bias and self.bias is not None:
                    y = y + self.bias.value.astype(y.dtype)
                return y
            from ...ops.conv_vjp import wgrad_wants_swap

            if x.ndim == 5 and wgrad_wants_swap(self.in_features, self.out_features):
                # lane-aware weight grad for CO<<CI convs (identical forward;
                # see ops/conv_vjp.py — 16.3 ms/step on the CO=2 UNet tail)
                from ...ops.conv_vjp import conv3x3_lane_wgrad
                from ...ops.layout import conv_layout_barrier

                y = conv3x3_lane_wgrad(x, self.kernel.value.astype(x.dtype))
                if self.use_bias and self.bias is not None:
                    y = y + self.bias.value.astype(y.dtype)
                return conv_layout_barrier(y)
        from ...ops.layout import conv_layout_barrier

        return conv_layout_barrier(super().__call__(x))


class BarrierConvTranspose(nnx.ConvTranspose):
    """nnx.ConvTranspose + post-op layout barrier (see ops/layout.py)."""

    def __call__(self, x):
        from ...ops.layout import conv_layout_barrier

        return conv_layout_barrier(super().__call__(x))


@Conv.factory_function("conv")
def conv_factory(dim: int):
    def make(in_channels, out_channels, kernel_size=3, strides=1, dilation=1, groups=1, bias=True,
             padding="SAME", rngs=None, **kw):
        ks = ensure_tuple_rep(kernel_size, dim)
        st = ensure_tuple_rep(strides, dim)
        dl = ensure_tuple_rep(dilation, dim)
        if isinstance(padding, int):
            padding = [(padding, padding)] * dim
        cls = PallasConv if dim == 3 else nnx.Conv
        return cls(in_channels, out_channels, kernel_size=ks, strides=st,
                   kernel_dilation=dl, feature_group_count=groups, use_bias=bias,
                   padding=padding, rngs=rngs or nnx.Rngs(0), **kw)

    return make


@Conv.factory_function("convtrans")
@ConvTrans.factory_function("convtrans")
def convtrans_factory(dim: int):
    def make(in_channels, out_channels, kernel_size=3, strides=1, bias=True, padding="SAME",
             rngs=None, **kw):
        ks = ensure_tuple_rep(kernel_size, dim)
        st = ensure_tuple_rep(strides, dim)
        if isinstance(padding, int):
            padding = [(padding, padding)] * dim
        cls = BarrierConvTranspose if dim == 3 else nnx.ConvTranspose
        return cls(in_channels, out_channels, kernel_size=ks, strides=st,
                                 use_bias=bias, padding=padding, rngs=rngs or nnx.Rngs(0), **kw)

    return make


@Norm.factory_function("instance")
def instance_factory(dim: int):
    # affine defaults to False to match the reference's torch InstanceNorm{n}d
    # default (monai Norm.INSTANCE -> nn.InstanceNorm3d(num_features)), so copied
    # reference checkpoints have the same parameter set. InstanceNormTPU computes
    # the same stats with a fused two-moment f32 reduce, measured == or faster
    # than nnx.GroupNorm at every UNet norm site (layers/fast_norm.py table).
    def make(num_features, affine: bool = False, eps: float = 1e-5, rngs=None, **kw):
        from .fast_norm import InstanceNormTPU

        return InstanceNormTPU(num_features, affine=affine, eps=eps, rngs=rngs)

    return make


@Norm.factory_function("batch")
def batch_factory(dim: int):
    def make(num_features, eps: float = 1e-5, momentum: float = 0.9, rngs=None, **kw):
        return nnx.BatchNorm(num_features=num_features, epsilon=eps, momentum=momentum,
                             rngs=rngs or nnx.Rngs(0))

    return make


@Norm.factory_function("group")
def group_factory(dim: int):
    def make(num_features=None, num_groups: int = 8, num_channels: int | None = None, eps: float = 1e-5,
             affine: bool = True, rngs=None, **kw):
        nf = num_channels if num_channels is not None else num_features
        g = num_groups
        while nf % g != 0:  # clamp to the largest divisor ≤ requested groups
            g -= 1
        return nnx.GroupNorm(num_features=nf, num_groups=g, epsilon=eps,
                             use_bias=affine, use_scale=affine, rngs=rngs or nnx.Rngs(0))

    return make


@Norm.factory_function("layer")
def layer_factory(dim: int):
    def make(num_features, eps: float = 1e-6, rngs=None, **kw):
        return nnx.LayerNorm(num_features=num_features, epsilon=eps, rngs=rngs or nnx.Rngs(0))

    return make


class _ActModule(nnx.Module):
    """Stateless activation wrapper so activations compose like layers."""

    def __init__(self, fn: Callable, **kwargs):
        self.fn = fn
        self.kwargs = kwargs

    def __call__(self, x):
        return self.fn(x, **self.kwargs)


class PReLU(nnx.Module):
    """Learnable PReLU: y = x if x >= 0 else alpha * x, with `alpha` a trained
    parameter (init 0.25 like torch.nn.PReLU; reference nets use Act.PRELU by
    default). Channel-last: a per-channel alpha broadcasts over the trailing axis."""

    def __init__(self, num_parameters: int = 1, init: float = 0.25, rngs=None, **kw):
        self.alpha = nnx.Param(jnp.full((num_parameters,), init, dtype=jnp.float32))

    def __call__(self, x):
        a = self.alpha.value.astype(x.dtype)
        if a.shape[0] != 1:
            a = a.reshape((1,) * (x.ndim - 1) + (-1,))
        return jnp.where(x >= 0, x, a * x)


_ACTS: dict[str, Callable] = {
    "RELU": jax.nn.relu,
    "LEAKYRELU": jax.nn.leaky_relu,
    "PRELU": lambda x: jax.nn.leaky_relu(x, 0.25),  # plain-fn contexts: fixed slope at the PReLU init value
    "ELU": jax.nn.elu,
    "GELU": jax.nn.gelu,
    "SIGMOID": jax.nn.sigmoid,
    "TANH": jnp.tanh,
    "SOFTMAX": jax.nn.softmax,
    "LOGSOFTMAX": jax.nn.log_softmax,
    "SWISH": jax.nn.swish,
    "SILU": jax.nn.silu,
    "MISH": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "RELU6": jax.nn.relu6,
    "SELU": jax.nn.selu,
    "CELU": jax.nn.celu,
    "HARDSWISH": jax.nn.hard_swish,
    "SOFTPLUS": jax.nn.softplus,
    "IDENTITY": lambda x: x,
}

for _name, _fn in _ACTS.items():
    def _act_closure(fn=_fn):
        def make(negative_slope=None, alpha=None, inplace=None, approximate=None, **kwargs):
            kw = {}
            if negative_slope is not None:
                kw["negative_slope"] = negative_slope
            if alpha is not None and fn in (jax.nn.elu, jax.nn.celu):
                kw["alpha"] = alpha
            return _ActModule(fn, **kw)

        return make

    Act.add_factory_callable(_name, _act_closure())

# layer-context PRELU is the learnable module (overrides the plain-fn registration)
Act.add_factory_callable(
    "PRELU", lambda num_parameters=1, init=0.25, rngs=None, **kw: PReLU(num_parameters, init))


def get_act_fn(name) -> Callable:
    """Resolve an activation spec to a plain function."""
    if callable(name):
        return name
    name_obj, args = split_args(name)
    return Act.factories[str(name_obj).upper()](**args)


class _PoolModule(nnx.Module):
    def __init__(self, fn: Callable, window: tuple, strides: tuple, padding="VALID"):
        self.fn = fn
        self.window = window
        self.strides = strides
        self.padding = padding

    def __call__(self, x):
        return self.fn(x, self.window, strides=self.strides, padding=self.padding)


class _AdaptivePool(nnx.Module):
    """Adaptive avg/max pool to a target output size (channel-last)."""

    def __init__(self, output_size: tuple, mode: str = "avg"):
        self.output_size = output_size
        self.mode = mode

    def __call__(self, x):
        spatial = x.shape[1:-1]
        if all(o == 1 for o in self.output_size):
            red = jnp.mean if self.mode == "avg" else jnp.max
            return red(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        win = tuple(s // o for s, o in zip(spatial, self.output_size))
        fn = nnx.avg_pool if self.mode == "avg" else nnx.max_pool
        return fn(x, win, strides=win, padding="VALID")


@Pool.factory_function("max")
def maxpool_factory(dim: int):
    def make(kernel_size, stride=None, padding=0, rngs=None, **kw):
        ks = ensure_tuple_rep(kernel_size, dim)
        st = ensure_tuple_rep(stride if stride is not None else kernel_size, dim)
        pad = "VALID" if padding in (0, None) else [(padding, padding)] * dim
        return _PoolModule(nnx.max_pool, ks, st, pad)

    return make


@Pool.factory_function("avg")
def avgpool_factory(dim: int):
    def make(kernel_size, stride=None, padding=0, rngs=None, **kw):
        ks = ensure_tuple_rep(kernel_size, dim)
        st = ensure_tuple_rep(stride if stride is not None else kernel_size, dim)
        pad = "VALID" if padding in (0, None) else [(padding, padding)] * dim
        return _PoolModule(nnx.avg_pool, ks, st, pad)

    return make


@Pool.factory_function("adaptiveavg")
def adaptive_avgpool_factory(dim: int):
    def make(output_size, rngs=None, **kw):
        return _AdaptivePool(ensure_tuple_rep(output_size, dim), mode="avg")

    return make


@Pool.factory_function("adaptivemax")
def adaptive_maxpool_factory(dim: int):
    def make(output_size, rngs=None, **kw):
        return _AdaptivePool(ensure_tuple_rep(output_size, dim), mode="max")

    return make


@Dropout.factory_function("dropout")
def dropout_factory(dim: int):
    def make(p: float = 0.5, rngs=None, **kw):
        return nnx.Dropout(rate=p, rngs=rngs or nnx.Rngs(0))

    return make


@Dropout.factory_function("alphadropout")
def alpha_dropout_factory(dim: int):
    def make(p: float = 0.5, rngs=None, **kw):
        return nnx.Dropout(rate=p, rngs=rngs or nnx.Rngs(0))

    return make


def get_norm_layer(name, spatial_dims: int = 1, channels: int | None = None, rngs=None):
    """Create a norm layer from a spec (reference: utils.py get_norm_layer)."""
    if name == "":
        return _ActModule(lambda x: x)
    norm_name, norm_args = split_args(name)
    kw = dict(norm_args)
    if channels is not None and "num_features" not in kw and "num_channels" not in kw:
        kw["num_features"] = channels
    return Norm[norm_name, spatial_dims](rngs=rngs, **kw)


def get_act_layer(name):
    if name in ("", None):
        return _ActModule(lambda x: x)
    if callable(name) and not isinstance(name, str):
        return _ActModule(name)
    act_name, act_args = split_args(name)
    return Act.factories[str(act_name).upper()](**act_args)


def get_dropout_layer(name, dropout_dim: int = 1, rngs=None):
    if name in ("", None):
        return _ActModule(lambda x: x)
    if isinstance(name, (int, float)):
        return Dropout["dropout", dropout_dim](p=float(name), rngs=rngs)
    drop_name, drop_args = split_args(name)
    return Dropout[drop_name, dropout_dim](rngs=rngs, **drop_args)


def get_pool_layer(name, spatial_dims: int = 1, rngs=None):
    pool_name, pool_args = split_args(name)
    return Pool[pool_name, spatial_dims](rngs=rngs, **pool_args)


# --- Pad factory (reference: factories.py constant_pad_factory / replication_pad_factory)
Pad = LayerFactory("Pad")


class _PadModule(nnx.Module):
    """Channel-first spatial padding module."""

    def __init__(self, padding, mode: str, value: float = 0.0, spatial_dims: int = 1):
        self.padding = ensure_tuple_rep(padding, spatial_dims) if isinstance(padding, int) else padding
        self.mode = mode
        self.value = value

    def __call__(self, x):
        pads = [(0, 0), (0, 0)] + [(p, p) if isinstance(p, int) else tuple(p) for p in self.padding]
        if self.mode == "constant":
            return jnp.pad(x, pads, mode="constant", constant_values=self.value)
        return jnp.pad(x, pads, mode=self.mode)


@Pad.factory_function("constantpad")
def constant_pad_factory(dim: int):
    def make(padding, value: float = 0.0, rngs=None):
        return _PadModule(padding, "constant", value, spatial_dims=dim)
    return make


@Pad.factory_function("replicationpad")
def replication_pad_factory(dim: int):
    def make(padding, rngs=None):
        return _PadModule(padding, "edge", spatial_dims=dim)
    return make


# --- relative positional embedding factory (reference: factories.py RelPosEmbedding,
# layers/utils.py:131 get_rel_pos_embedding_layer)
RelPosEmbedding = LayerFactory("RelPosEmbedding")


@RelPosEmbedding.factory_function("decomposed")
def decomposed_rel_pos_embedding(_dim: int = 1):
    from ..blocks.attention_utils import DecomposedRelativePosEmbedding

    return DecomposedRelativePosEmbedding


def get_rel_pos_embedding_layer(name, s_input_dims, c_dim: int, num_heads: int, rngs=None):
    """Instantiate a relative positional embedding block by factory name
    (reference: layers/utils.py:131)."""
    embedding_name, embedding_args = split_args(name)
    cls = RelPosEmbedding.factories[str(embedding_name).upper()](1)
    return cls(s_input_dims=s_input_dims, c_dim=c_dim, num_heads=num_heads,
               rngs=rngs or nnx.Rngs(0), **embedding_args)


def get_pad_layer(name, spatial_dims: int = 1, rngs=None):
    """Instantiate a padding layer by factory name."""
    pad_name, pad_args = split_args(name)
    return Pad[pad_name, spatial_dims](rngs=rngs, **pad_args)


# reference-named factory functions (reference: layers/factories.py:281-357 —
# the reference exposes its registered factory callables at module level under
# these names; ours above use the short names, aliased/wrapped here).
def swish_factory():
    """Swish activation layer factory (reference: factories.py:306)."""
    from .simplelayers import Swish

    return Swish


def memswish_factory():
    """Memory-efficient swish factory (reference: factories.py:319)."""
    from .simplelayers import MemoryEfficientSwish

    return MemoryEfficientSwish


def mish_factory():
    """Mish activation factory (reference: factories.py:332)."""
    from .simplelayers import Mish

    return Mish


def geglu_factory():
    """GEGLU activation factory (reference: factories.py:345)."""
    from .simplelayers import GEGLU

    return GEGLU


def instance_nvfuser_factory(dim: int):
    """The reference's nvfuser-accelerated instance norm is CUDA-only and falls
    back to plain InstanceNorm3d elsewhere (reference: factories.py:272
    instance_nvfuser_factory); on TPU the fused two-moment instance norm IS the
    fast path, so this always returns it."""
    import warnings

    warnings.warn("`INSTANCE_NVFUSER` is CUDA-specific; using the TPU fused instance norm.")
    return instance_factory(dim)


maxpooling_factory = maxpool_factory
avgpooling_factory = avgpool_factory
adaptive_maxpooling_factory = adaptive_maxpool_factory
adaptive_avgpooling_factory = adaptive_avgpool_factory
