"""SENet family: SENet154, SE-ResNet50/101/152, SE-ResNeXt50/101
(reference: monai/networks/nets/senet.py:50 SENet, :336-520 named variants).

Channel-last internals; grouped 3x3 convolutions map to XLA's grouped convolution
(feature_group_count) which tiles onto the MXU. Pretrained 2D torch weights are not
loadable here; ``pretrained`` is accepted for API parity and ignored.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution
from ..blocks.squeeze_and_excitation import SEBottleneck, SEResNetBottleneck, SEResNeXtBottleneck

__all__ = ["SENet", "SENet154", "SEResNet50", "SEResNet101", "SEResNet152",
           "SEResNext50", "SEResNext101", "SEresnet50", "SEresnext50"]

_BLOCKS = {
    "se_bottleneck": SEBottleneck,
    "se_resnet_bottleneck": SEResNetBottleneck,
    "se_resnetxt_bottleneck": SEResNeXtBottleneck,
}


def _ceil_max_pool(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """MaxPool with ceil_mode=True semantics: pad the high side so the last window fits."""
    ndim = x.ndim - 2
    pads = []
    for d in range(1, 1 + ndim):
        n = x.shape[d]
        out = -(-(n - kernel) // stride) + 1  # ceil
        need = (out - 1) * stride + kernel - n
        pads.append((0, max(0, need)))
    return nnx.max_pool(x, (kernel,) * ndim, strides=(stride,) * ndim, padding=pads)


class SENet(nnx.Module):
    """Squeeze-and-Excitation network (reference: senet.py:50). Channel-first public API."""

    def __init__(self, spatial_dims: int, in_channels: int, block, layers: Sequence[int],
                 groups: int, reduction: int, dropout_prob: float | None = 0.2,
                 dropout_dim: int = 1, inplanes: int = 128,
                 downsample_kernel_size: int = 3, input_3x3: bool = True,
                 num_classes: int = 1000, *, rngs: nnx.Rngs):
        if isinstance(block, str):
            if block not in _BLOCKS:
                raise ValueError(f"Unknown block '{block}', use one of {list(_BLOCKS)}")
            block = _BLOCKS[block]
        self.spatial_dims = spatial_dims
        self.inplanes = inplanes
        if input_3x3:
            self.layer0 = nnx.List([
                Convolution(spatial_dims, in_channels, 64, kernel_size=3, strides=2,
                            act=("relu", {}), norm="batch", bias=False, rngs=rngs),
                Convolution(spatial_dims, 64, 64, kernel_size=3, act=("relu", {}),
                            norm="batch", bias=False, rngs=rngs),
                Convolution(spatial_dims, 64, inplanes, kernel_size=3, act=("relu", {}),
                            norm="batch", bias=False, rngs=rngs),
            ])
        else:
            self.layer0 = nnx.List([
                Convolution(spatial_dims, in_channels, inplanes, kernel_size=7, strides=2,
                            act=("relu", {}), norm="batch", bias=False, rngs=rngs),
            ])
        self.layer1 = self._make_layer(block, 64, layers[0], groups, reduction, 1, 1, rngs)
        self.layer2 = self._make_layer(block, 128, layers[1], groups, reduction, 2,
                                       downsample_kernel_size, rngs)
        self.layer3 = self._make_layer(block, 256, layers[2], groups, reduction, 2,
                                       downsample_kernel_size, rngs)
        self.layer4 = self._make_layer(block, 512, layers[3], groups, reduction, 2,
                                       downsample_kernel_size, rngs)
        self.dropout = nnx.Dropout(rate=dropout_prob, rngs=rngs) if dropout_prob else None
        self.last_linear = nnx.Linear(512 * block.expansion, num_classes, rngs=rngs)

    def _make_layer(self, block, planes: int, blocks: int, groups: int, reduction: int,
                    stride: int, downsample_kernel_size: int, rngs) -> nnx.List:
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = Convolution(self.spatial_dims, self.inplanes, planes * block.expansion,
                                     strides=stride, kernel_size=downsample_kernel_size,
                                     act=None, norm="batch", bias=False, rngs=rngs)
        layers = [block(self.spatial_dims, self.inplanes, planes, groups, reduction,
                        stride=stride, downsample=downsample, rngs=rngs)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.spatial_dims, self.inplanes, planes, groups, reduction,
                                rngs=rngs))
        return nnx.List(layers)

    def features(self, x_cl: jnp.ndarray) -> jnp.ndarray:
        """Channel-last backbone features (reference: senet.py:264)."""
        for m in self.layer0:
            x_cl = m(x_cl)
        x_cl = _ceil_max_pool(x_cl, 3, 2)
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            for blk in stage:
                x_cl = blk(x_cl)
        return x_cl

    def logits(self, x_cl: jnp.ndarray) -> jnp.ndarray:
        x = x_cl.mean(axis=tuple(range(1, x_cl.ndim - 1)))
        if self.dropout is not None:
            x = self.dropout(x)
        return self.last_linear(x)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = self.features(jnp.transpose(x, perm_in))
        return self.logits(h)


class SENet154(SENet):
    """(reference: senet.py:336)."""

    def __init__(self, layers: Sequence[int] = (3, 8, 36, 3), groups: int = 64,
                 reduction: int = 16, pretrained: bool = False, progress: bool = True,
                 **kwargs):
        super().__init__(block=SEBottleneck, layers=layers, groups=groups,
                         reduction=reduction, **kwargs)


class SEResNet50(SENet):
    """(reference: senet.py:354)."""

    def __init__(self, layers: Sequence[int] = (3, 4, 6, 3), groups: int = 1,
                 reduction: int = 16, dropout_prob: float | None = None, inplanes: int = 64,
                 downsample_kernel_size: int = 1, input_3x3: bool = False,
                 pretrained: bool = False, progress: bool = True, **kwargs):
        super().__init__(block=SEResNetBottleneck, layers=layers, groups=groups,
                         reduction=reduction, dropout_prob=dropout_prob, inplanes=inplanes,
                         downsample_kernel_size=downsample_kernel_size, input_3x3=input_3x3,
                         **kwargs)


class SEResNet101(SEResNet50):
    """(reference: senet.py:386)."""

    def __init__(self, layers: Sequence[int] = (3, 4, 23, 3), **kwargs):
        super().__init__(layers=layers, **kwargs)


class SEResNet152(SEResNet50):
    """(reference: senet.py:418)."""

    def __init__(self, layers: Sequence[int] = (3, 8, 36, 3), **kwargs):
        super().__init__(layers=layers, **kwargs)


class SEResNext50(SENet):
    """(reference: senet.py:450)."""

    def __init__(self, layers: Sequence[int] = (3, 4, 6, 3), groups: int = 32,
                 reduction: int = 16, dropout_prob: float | None = None, inplanes: int = 64,
                 downsample_kernel_size: int = 1, input_3x3: bool = False,
                 pretrained: bool = False, progress: bool = True, **kwargs):
        super().__init__(block=SEResNeXtBottleneck, layers=layers, groups=groups,
                         reduction=reduction, dropout_prob=dropout_prob, inplanes=inplanes,
                         downsample_kernel_size=downsample_kernel_size, input_3x3=input_3x3,
                         **kwargs)


class SEResNext101(SEResNext50):
    """(reference: senet.py:484)."""

    def __init__(self, layers: Sequence[int] = (3, 4, 23, 3), **kwargs):
        super().__init__(layers=layers, **kwargs)


# lowercase familiarity aliases (reference exports SEnet, SEresnet50, ...)
SEnet = Senet = senet = SENet
SEnet154 = Senet154 = senet154 = SENet154
SEresnet50 = Seresnet50 = seresnet50 = SEResNet50
SEresnet101 = Seresnet101 = seresnet101 = SEResNet101
SEresnet152 = Seresnet152 = seresnet152 = SEResNet152
SEresnext50 = Seresnext50 = seresnext50 = SEResNext50
SEresnext101 = Seresnext101 = seresnext101 = SEResNext101
