"""EfficientNet B0-L2 for 2D/3D classification and feature extraction
(reference: monai/networks/nets/efficientnet.py:75 MBConvBlock, :230 EfficientNet,
:476 EfficientNetBN, :563 EfficientNetBNFeatures).

TPU-native layout: channel-last internals (lane dimension), nnx.Conv with
``feature_group_count`` for the depthwise convolutions, swish activations fused by XLA.
Pretrained torch weights are not loadable in this environment; ``pretrained`` is accepted
for API parity and ignored.
"""
from __future__ import annotations

import math
import re
from collections.abc import Sequence
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.factories import get_norm_layer

__all__ = [
    "EfficientNet",
    "EfficientNetBN",
    "EfficientNetBNFeatures",
    "EfficientNetEncoder",
    "BlockArgs",
    "get_efficientnet_image_size",
    "drop_connect",
    "efficientnet_params",
]

# model_name: (width_coeff, depth_coeff, image_size, dropout_rate, dropconnect_rate)
# (reference: efficientnet.py:39)
efficientnet_params = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3, 0.2),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3, 0.2),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4, 0.2),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4, 0.2),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5, 0.2),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5, 0.2),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5, 0.2),
    "efficientnet-l2": (4.3, 5.3, 800, 0.5, 0.2),
}

_DEFAULT_BLOCKS = [
    "r1_k3_s11_e1_i32_o16_se0.25",
    "r2_k3_s22_e6_i16_o24_se0.25",
    "r2_k5_s22_e6_i24_o40_se0.25",
    "r3_k3_s22_e6_i40_o80_se0.25",
    "r3_k5_s11_e6_i80_o112_se0.25",
    "r4_k5_s22_e6_i112_o192_se0.25",
    "r1_k3_s11_e6_i192_o320_se0.25",
]


@dataclass
class BlockArgs:
    """One MBConv stage spec, decodable from the compact string form
    (reference: efficientnet.py:944)."""

    num_repeat: int
    kernel_size: int
    stride: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    id_skip: bool = True
    se_ratio: float | None = None

    @staticmethod
    def from_string(block_string: str) -> "BlockArgs":
        parts = re.split(r"_", block_string)
        opts = {}
        for p in parts:
            m = re.match(r"([a-z]+)([\d.]+)", p)
            if m:
                opts[m.group(1)] = m.group(2)
        if "s" not in opts or len(opts["s"]) == 0:
            raise ValueError(f"invalid stride in block string: {block_string}")
        return BlockArgs(
            num_repeat=int(opts["r"]), kernel_size=int(opts["k"]), stride=int(opts["s"][0]),
            expand_ratio=int(opts["e"]), input_filters=int(opts["i"]),
            output_filters=int(opts["o"]), id_skip="noskip" not in block_string,
            se_ratio=float(opts["se"]) if "se" in opts else None)

    def to_string(self) -> str:
        s = (f"r{self.num_repeat}_k{self.kernel_size}_s{self.stride}{self.stride}"
             f"_e{self.expand_ratio}_i{self.input_filters}_o{self.output_filters}")
        if self.se_ratio is not None:
            s += f"_se{self.se_ratio}"
        if not self.id_skip:
            s += "_noskip"
        return s


def _round_filters(filters: int, width_coeff: float, depth_divisor: float = 8.0) -> int:
    """Scale and quantize channel counts (reference: efficientnet.py:772)."""
    if not width_coeff:
        return filters
    filters *= width_coeff
    new_filters = max(depth_divisor, int(filters + depth_divisor / 2) // depth_divisor * depth_divisor)
    if new_filters < 0.9 * filters:  # don't round down by more than 10%
        new_filters += depth_divisor
    return int(new_filters)


def _round_repeats(repeats: int, depth_coeff: float) -> int:
    if not depth_coeff:
        return repeats
    return int(math.ceil(depth_coeff * repeats))


def get_efficientnet_image_size(model_name: str) -> int:
    """(reference: efficientnet.py:717)."""
    if model_name not in efficientnet_params:
        raise ValueError(f"invalid model_name {model_name}, must be one of "
                         f"{', '.join(efficientnet_params)}")
    return efficientnet_params[model_name][2]


def drop_connect(inputs: jnp.ndarray, p: float, training: bool, key=None) -> jnp.ndarray:
    """Stochastic depth on the residual branch (reference: efficientnet.py:741)."""
    if p < 0.0 or p > 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    if not training or p == 0.0 or key is None:
        return inputs
    keep = 1.0 - p
    mask_shape = (inputs.shape[0],) + (1,) * (inputs.ndim - 1)
    mask = jax.random.bernoulli(key, keep, mask_shape).astype(inputs.dtype)
    return inputs / keep * mask


class MBConvBlock(nnx.Module):
    """Mobile inverted bottleneck with squeeze-excitation (reference: efficientnet.py:75).

    Channel-last: expand 1x1 -> depthwise kxk (feature_group_count) -> SE -> project 1x1.
    """

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int, expand_ratio: int, se_ratio: float | None,
                 id_skip: bool = True, norm=("batch", {"eps": 1e-3, "momentum": 0.01}),
                 drop_connect_rate: float = 0.2, *, rngs: nnx.Rngs):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.stride = stride
        self.id_skip = id_skip
        self.drop_connect_rate = drop_connect_rate
        inp = in_channels
        oup = in_channels * expand_ratio
        self.has_expand = expand_ratio != 1
        if self.has_expand:
            self.expand_conv = nnx.Conv(inp, oup, kernel_size=(1,) * spatial_dims,
                                        use_bias=False, rngs=rngs)
            self.bn0 = get_norm_layer(norm, spatial_dims, oup, rngs=rngs)
        self.depthwise_conv = nnx.Conv(oup, oup, kernel_size=(kernel_size,) * spatial_dims,
                                       strides=(stride,) * spatial_dims, padding="SAME",
                                       feature_group_count=oup, use_bias=False, rngs=rngs)
        self.bn1 = get_norm_layer(norm, spatial_dims, oup, rngs=rngs)
        self.has_se = se_ratio is not None and 0 < se_ratio <= 1
        if self.has_se:
            n_squeezed = max(1, int(in_channels * se_ratio))
            self.se_reduce = nnx.Conv(oup, n_squeezed, kernel_size=(1,) * spatial_dims, rngs=rngs)
            self.se_expand = nnx.Conv(n_squeezed, oup, kernel_size=(1,) * spatial_dims, rngs=rngs)
        self.project_conv = nnx.Conv(oup, out_channels, kernel_size=(1,) * spatial_dims,
                                     use_bias=False, rngs=rngs)
        self.bn2 = get_norm_layer(norm, spatial_dims, out_channels, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inputs = x
        if self.has_expand:
            x = jax.nn.silu(self.bn0(self.expand_conv(x)))
        x = jax.nn.silu(self.bn1(self.depthwise_conv(x)))
        if self.has_se:
            se = x.mean(axis=tuple(range(1, x.ndim - 1)), keepdims=True)
            se = self.se_expand(jax.nn.silu(self.se_reduce(se)))
            x = jax.nn.sigmoid(se) * x
        x = self.bn2(self.project_conv(x))
        if self.id_skip and self.stride == 1 and self.in_channels == self.out_channels:
            x = x + inputs
        return x


class EfficientNet(nnx.Module):
    """Generic EfficientNet (reference: efficientnet.py:230). Channel-first public API."""

    def __init__(self, blocks_args_str: list[str] | None = None, spatial_dims: int = 2,
                 in_channels: int = 3, num_classes: int = 1000, width_coefficient: float = 1.0,
                 depth_coefficient: float = 1.0, dropout_rate: float = 0.2,
                 image_size: int = 224, norm=("batch", {"eps": 1e-3, "momentum": 0.01}),
                 drop_connect_rate: float = 0.2, depth_divisor: int = 8, *, rngs: nnx.Rngs):
        if spatial_dims not in (1, 2, 3):
            raise ValueError("spatial_dims can only be 1, 2 or 3.")
        blocks_args = [BlockArgs.from_string(s) for s in (blocks_args_str or _DEFAULT_BLOCKS)]
        if len(blocks_args) == 0:
            raise ValueError("block args must be non-empty")
        self.spatial_dims = spatial_dims
        self.num_classes = num_classes
        self.drop_connect_rate = drop_connect_rate

        out_stem = _round_filters(32, width_coefficient, depth_divisor)
        self._conv_stem = nnx.Conv(in_channels, out_stem, kernel_size=(3,) * spatial_dims,
                                   strides=(2,) * spatial_dims, padding="SAME",
                                   use_bias=False, rngs=rngs)
        self._bn0 = get_norm_layer(norm, spatial_dims, out_stem, rngs=rngs)

        blocks = []
        stage_strides: list[int] = []
        num_blocks_total = sum(_round_repeats(a.num_repeat, depth_coefficient) for a in blocks_args)
        idx = 0
        for args in blocks_args:
            in_f = _round_filters(args.input_filters, width_coefficient, depth_divisor)
            out_f = _round_filters(args.output_filters, width_coefficient, depth_divisor)
            reps = _round_repeats(args.num_repeat, depth_coefficient)
            stage = []
            for r in range(reps):
                stage.append(MBConvBlock(
                    spatial_dims, in_f if r == 0 else out_f, out_f, args.kernel_size,
                    args.stride if r == 0 else 1, args.expand_ratio, args.se_ratio,
                    args.id_skip, norm,
                    drop_connect_rate * idx / max(1, num_blocks_total), rngs=rngs))
                idx += 1
            blocks.append(nnx.List(stage))
            stage_strides.append(args.stride)
        self._blocks = nnx.List(blocks)
        # feature-extraction points: stages followed by a stride-2 stage, plus the last
        # (reference: efficientnet.py extract_stacks for EfficientNetBNFeatures)
        self.extract_stacks = [i + 1 for i in range(len(stage_strides) - 1)
                               if stage_strides[i + 1] == 2] + [len(stage_strides)]

        head_in = _round_filters(blocks_args[-1].output_filters, width_coefficient, depth_divisor)
        out_head = _round_filters(1280, width_coefficient, depth_divisor)
        self._conv_head = nnx.Conv(head_in, out_head, kernel_size=(1,) * spatial_dims,
                                   use_bias=False, rngs=rngs)
        self._bn1 = get_norm_layer(norm, spatial_dims, out_head, rngs=rngs)
        self._dropout = nnx.Dropout(rate=dropout_rate, rngs=rngs)
        self._fc = nnx.Linear(out_head, num_classes, rngs=rngs)

    def _features(self, x_cl: jnp.ndarray) -> list[jnp.ndarray]:
        """Stem + blocks on a channel-last input; returns per-stage features."""
        x = jax.nn.silu(self._bn0(self._conv_stem(x_cl)))
        feats = []
        if 0 in self.extract_stacks:
            feats.append(x)
        for i, stage in enumerate(self._blocks):
            for block in stage:
                x = block(x)
            if i + 1 in self.extract_stacks:
                feats.append(x)
        return feats

    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, inputs.ndim)) + (1,)
        x = jnp.transpose(inputs, perm_in)
        x = jax.nn.silu(self._bn0(self._conv_stem(x)))
        for stage in self._blocks:
            for block in stage:
                x = block(x)
        x = jax.nn.silu(self._bn1(self._conv_head(x)))
        x = x.mean(axis=tuple(range(1, x.ndim - 1)))  # global average pool
        x = self._dropout(x)
        return self._fc(x)


class EfficientNetBN(EfficientNet):
    """Named-variant constructor (reference: efficientnet.py:476)."""

    def __init__(self, model_name: str = "efficientnet-b0", pretrained: bool = False,
                 progress: bool = True, spatial_dims: int = 2, in_channels: int = 3,
                 num_classes: int = 1000, norm=("batch", {"eps": 1e-3, "momentum": 0.01}),
                 adv_prop: bool = False, *, rngs: nnx.Rngs):
        if model_name not in efficientnet_params:
            raise ValueError(f"invalid model_name {model_name} found, must be one of "
                             f"{', '.join(efficientnet_params)}")
        w, d, size, drop, dropconnect = efficientnet_params[model_name]
        super().__init__(blocks_args_str=_DEFAULT_BLOCKS, spatial_dims=spatial_dims,
                         in_channels=in_channels, num_classes=num_classes,
                         width_coefficient=w, depth_coefficient=d, dropout_rate=drop,
                         image_size=size, norm=norm, drop_connect_rate=dropconnect, rngs=rngs)
        self.model_name = model_name


class EfficientNetBNFeatures(EfficientNetBN):
    """Named variant returning multi-scale feature maps, channel-first
    (reference: efficientnet.py:563)."""

    def __call__(self, inputs: jnp.ndarray) -> list[jnp.ndarray]:
        perm_in = (0,) + tuple(range(2, inputs.ndim)) + (1,)
        feats = self._features(jnp.transpose(inputs, perm_in))
        def to_cf(t):
            return jnp.transpose(t, (0, t.ndim - 1) + tuple(range(1, t.ndim - 1)))
        return [to_cf(f) for f in feats]


class EfficientNetEncoder(EfficientNetBNFeatures):
    """FlexibleUNet backbone wrapper (reference: efficientnet.py:643)."""

    backbone_names = [f"efficientnet-b{i}" for i in range(9)] + ["efficientnet-l2"]

    @classmethod
    def get_encoder_parameters(cls) -> list[dict]:
        return [{"model_name": n, "pretrained": False, "spatial_dims": 2, "in_channels": 3}
                for n in cls.backbone_names]

    @classmethod
    def num_channels_per_output(cls) -> list[tuple[int, ...]]:
        out = []
        for name in cls.backbone_names:
            w = efficientnet_params[name][0]
            out.append(tuple(_round_filters(c, w) for c in (16, 24, 40, 112, 320)))
        return out

    @classmethod
    def num_outputs(cls) -> list[int]:
        return [5] * len(cls.backbone_names)

    @classmethod
    def get_encoder_names(cls) -> list[str]:
        return list(cls.backbone_names)
