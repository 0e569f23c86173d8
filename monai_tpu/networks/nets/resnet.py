"""ResNet 10-200 for 2D/3D (reference: monai/networks/nets/resnet.py)."""
from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import partial

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..layers.factories import Conv, Pool, get_act_layer, get_norm_layer

__all__ = ["ResNet", "ResNetBlock", "ResNetBottleneck", "ResNetFeatures", "ResNetEncoder",
           "resnet10", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152", "resnet200"]


def _conv(spatial_dims, in_planes, out_planes, kernel_size=3, stride=1, bias=False, *, rngs):
    ks = ensure_tuple_rep(kernel_size, spatial_dims)
    pad = [(k // 2, k // 2) for k in ks]
    return Conv["conv", spatial_dims](in_planes, out_planes, kernel_size=ks, strides=stride, bias=bias,
                                      padding=pad, rngs=rngs)


class ResNetBlock(nnx.Module):
    expansion = 1

    def __init__(self, in_planes: int, planes: int, spatial_dims: int = 3, stride: int = 1,
                 downsample=None, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        self.conv1 = _conv(spatial_dims, in_planes, planes, 3, stride, rngs=rngs)
        self.bn1 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.act = get_act_layer(act)
        self.conv2 = _conv(spatial_dims, planes, planes, 3, 1, rngs=rngs)
        self.bn2 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x):
        residual = x
        out = self.act(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.act(out + residual)


class ResNetBottleneck(nnx.Module):
    expansion = 4

    def __init__(self, in_planes: int, planes: int, spatial_dims: int = 3, stride: int = 1,
                 downsample=None, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        self.conv1 = _conv(spatial_dims, in_planes, planes, 1, 1, rngs=rngs)
        self.bn1 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.conv2 = _conv(spatial_dims, planes, planes, 3, stride, rngs=rngs)
        self.bn2 = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)
        self.conv3 = _conv(spatial_dims, planes, planes * self.expansion, 1, 1, rngs=rngs)
        self.bn3 = get_norm_layer(norm, spatial_dims, planes * self.expansion, rngs=rngs)
        self.act = get_act_layer(act)
        self.downsample = downsample

    def __call__(self, x):
        residual = x
        out = self.act(self.bn1(self.conv1(x)))
        out = self.act(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.act(out + residual)


class _Downsample(nnx.Module):
    def __init__(self, spatial_dims, in_planes, planes, stride, norm, *, rngs):
        self.conv = _conv(spatial_dims, in_planes, planes, 1, stride, rngs=rngs)
        self.bn = get_norm_layer(norm, spatial_dims, planes, rngs=rngs)

    def __call__(self, x):
        return self.bn(self.conv(x))


class ResNet(nnx.Module):
    """(reference: resnet.py ResNet)."""

    def __init__(self, block, layers: Sequence[int], block_inplanes: Sequence[int],
                 spatial_dims: int = 3, n_input_channels: int = 3, conv1_t_size: int = 7,
                 conv1_t_stride: int = 1, no_max_pool: bool = False, shortcut_type: str = "B",
                 widen_factor: float = 1.0, num_classes: int = 400, feed_forward: bool = True,
                 bias_downsample: bool = True, act=("relu", {}), norm="batch", *, rngs: nnx.Rngs):
        if isinstance(block, str):
            block = ResNetBlock if block == "basic" else ResNetBottleneck
        block_inplanes = [int(x * widen_factor) for x in block_inplanes]
        self.in_planes = block_inplanes[0]
        self.no_max_pool = no_max_pool
        self.spatial_dims = spatial_dims
        conv1_ks = ensure_tuple_rep(conv1_t_size, spatial_dims)
        self.conv1 = Conv["conv", spatial_dims](n_input_channels, self.in_planes, kernel_size=conv1_ks,
                                                strides=conv1_t_stride if spatial_dims == 2 else
                                                ensure_tuple_rep(conv1_t_stride, spatial_dims),
                                                bias=False, padding=[(k // 2, k // 2) for k in conv1_ks],
                                                rngs=rngs)
        self.bn1 = get_norm_layer(norm, spatial_dims, self.in_planes, rngs=rngs)
        self.act = get_act_layer(act)
        self.maxpool = Pool["max", spatial_dims](kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, block_inplanes[0], layers[0], spatial_dims, 1, norm, act, rngs)
        self.layer2 = self._make_layer(block, block_inplanes[1], layers[1], spatial_dims, 2, norm, act, rngs)
        self.layer3 = self._make_layer(block, block_inplanes[2], layers[2], spatial_dims, 2, norm, act, rngs)
        self.layer4 = self._make_layer(block, block_inplanes[3], layers[3], spatial_dims, 2, norm, act, rngs)
        self.fc = nnx.Linear(block_inplanes[3] * block.expansion, num_classes, rngs=rngs) if feed_forward else None

    def _make_layer(self, block, planes, blocks, spatial_dims, stride, norm, act, rngs):
        downsample = None
        if stride != 1 or self.in_planes != planes * block.expansion:
            downsample = _Downsample(spatial_dims, self.in_planes, planes * block.expansion, stride,
                                     norm, rngs=rngs)
        layers = [block(self.in_planes, planes, spatial_dims, stride, downsample, act, norm, rngs=rngs)]
        self.in_planes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.in_planes, planes, spatial_dims, act=act, norm=norm, rngs=rngs))
        return nnx.List(layers)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x = self.act(self.bn1(self.conv1(x)))
        if not self.no_max_pool:
            x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            for blk in layer:
                x = blk(x)
        x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        if self.fc is not None:
            x = self.fc(x)
        return x


# model_name -> (block, layers, shortcut_type, bias_downsample)
# (reference: resnet.py resnet_params; the datasets23 flag only selects MedicalNet
#  weight URLs, which zero-egress makes inapplicable here)
resnet_params = {
    "resnet10": ("basic", [1, 1, 1, 1], "B", False),
    "resnet18": ("basic", [2, 2, 2, 2], "A", True),
    "resnet34": ("basic", [3, 4, 6, 3], "A", True),
    "resnet50": ("bottleneck", [3, 4, 6, 3], "B", True),
    "resnet101": ("bottleneck", [3, 4, 23, 3], "B", False),
    "resnet152": ("bottleneck", [3, 8, 36, 3], "B", False),
    "resnet200": ("bottleneck", [3, 24, 36, 3], "B", False),
}


class ResNetFeatures(ResNet):
    """ResNet backbone returning the multi-scale feature pyramid
    (reference: resnet.py:367 ResNetFeatures)."""

    def __init__(self, model_name: str, pretrained: bool = False, spatial_dims: int = 3,
                 in_channels: int = 1, *, rngs: nnx.Rngs):
        if model_name not in resnet_params:
            raise ValueError(f"invalid model_name {model_name}, must be one of "
                             f"{', '.join(resnet_params)}")
        if pretrained:
            raise ValueError("pretrained MedicalNet weights require network access, "
                             "which is unavailable; load weights explicitly instead.")
        block, layers, shortcut_type, bias_downsample = resnet_params[model_name]
        super().__init__(block=block, layers=layers, block_inplanes=[64, 128, 256, 512],
                         spatial_dims=spatial_dims, n_input_channels=in_channels,
                         conv1_t_stride=2, shortcut_type=shortcut_type, feed_forward=False,
                         bias_downsample=bias_downsample, rngs=rngs)

    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """Channels-last input -> list of 5 channels-last feature maps."""
        x = self.act(self.bn1(self.conv1(x)))
        features = [x]
        if not self.no_max_pool:
            x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            for blk in layer:
                x = blk(x)
            features.append(x)
        return features

    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """Channel-first input -> list of 5 channel-first feature maps."""
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        feats = self._features(jnp.transpose(x, perm_in))
        return [jnp.transpose(f, (0, f.ndim - 1) + tuple(range(1, f.ndim - 1))) for f in feats]


class ResNetEncoder(ResNetFeatures):
    """FlexibleUNet backbone adapter (reference: resnet.py:439 ResNetEncoder)."""

    backbone_names = ["resnet10", "resnet18", "resnet34", "resnet50",
                      "resnet101", "resnet152", "resnet200"]

    @classmethod
    def get_encoder_parameters(cls) -> list[dict]:
        return [{"model_name": n, "pretrained": False, "spatial_dims": 3, "in_channels": 1}
                for n in cls.backbone_names]

    @classmethod
    def num_channels_per_output(cls) -> list[tuple[int, ...]]:
        return [(64, 64, 128, 256, 512)] * 3 + [(64, 256, 512, 1024, 2048)] * 4

    @classmethod
    def num_outputs(cls) -> list[int]:
        return [5] * len(cls.backbone_names)

    @classmethod
    def get_encoder_names(cls) -> list[str]:
        return list(cls.backbone_names)


def _resnet(block, layers, block_inplanes, **kwargs):
    return ResNet(block, layers, block_inplanes, **kwargs)


def resnet10(**kwargs):
    return _resnet(ResNetBlock, [1, 1, 1, 1], [64, 128, 256, 512], **kwargs)


def resnet18(**kwargs):
    return _resnet(ResNetBlock, [2, 2, 2, 2], [64, 128, 256, 512], **kwargs)


def resnet34(**kwargs):
    return _resnet(ResNetBlock, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)


def resnet50(**kwargs):
    return _resnet(ResNetBottleneck, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)


def resnet101(**kwargs):
    return _resnet(ResNetBottleneck, [3, 4, 23, 3], [64, 128, 256, 512], **kwargs)


def resnet152(**kwargs):
    return _resnet(ResNetBottleneck, [3, 8, 36, 3], [64, 128, 256, 512], **kwargs)


def resnet200(**kwargs):
    return _resnet(ResNetBottleneck, [3, 24, 36, 3], [64, 128, 256, 512], **kwargs)


def get_inplanes():
    """Stage widths of the MedicalNet ResNet family (reference: resnet.py:63)."""
    return [64, 128, 256, 512]


def get_avgpool():
    """Per-spatial-dims adaptive-avgpool output sizes (reference: resnet.py:67)."""
    return [0, 1, (1, 1), (1, 1, 1)]


def get_medicalnet_pretrained_resnet_args(resnet_depth: int):
    """shortcut_type / bias_downsample matching released MedicalNet weights
    (reference: resnet.py:675)."""
    bias_downsample = resnet_depth in (18, 34)
    shortcut_type = "A" if resnet_depth in [18, 34] else "B"
    return bias_downsample, shortcut_type


def get_pretrained_resnet_medicalnet(resnet_depth: int, device: str = "cpu", datasets23: bool = True):
    """Download MedicalNet pretrained weights from Hugging Face (reference:
    resnet.py:620). Gated on MONAI_TPU_ALLOW_DOWNLOADS (no-egress default)."""
    import os

    if os.environ.get("MONAI_TPU_ALLOW_DOWNLOADS", "0") != "1":
        raise RuntimeError(
            "get_pretrained_resnet_medicalnet downloads from huggingface.co; set "
            "MONAI_TPU_ALLOW_DOWNLOADS=1 in an egress-enabled environment.")
    from huggingface_hub import hf_hub_download
    import torch

    if resnet_depth not in (10, 18, 34, 50, 101, 152, 200):
        raise NotImplementedError(f"Supported resnet_depth: 10/18/34/50/101/152/200, got {resnet_depth}")
    repo = f"TencentMedicalNet/MedicalNet-Resnet{resnet_depth}"
    filename = f"resnet_{resnet_depth}{'_23dataset' if datasets23 else ''}.pth"
    path = hf_hub_download(repo_id=repo, filename=filename)
    checkpoint = torch.load(path, map_location=device, weights_only=True)
    return checkpoint.get("state_dict")
