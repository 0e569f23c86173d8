"""Feature pyramid network (reference: monai/networks/blocks/feature_pyramid_network.py
FeaturePyramidNetwork, LastLevelMaxPool; backbone_fpn_utils.py BackboneWithFPN).

Channel-last internals; top-down pathway upsamples with nearest `jax.image.resize`.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["FeaturePyramidNetwork", "LastLevelMaxPool", "BackboneWithFPN"]


class LastLevelMaxPool(nnx.Module):
    """Extra stride-2 max pool level appended to the pyramid
    (reference: feature_pyramid_network.py LastLevelMaxPool)."""

    def __call__(self, results: list, names: list):
        names.append("pool")
        sd = results[-1].ndim - 2
        pooled = nnx.max_pool(results[-1], (1,) * sd, strides=(2,) * sd, padding="VALID")
        results.append(pooled)
        return results, names


class FeaturePyramidNetwork(nnx.Module):
    """Lateral 1x1 + top-down sum + 3x3 smoothing convs
    (reference: feature_pyramid_network.py FeaturePyramidNetwork)."""

    def __init__(self, spatial_dims: int, in_channels_list: Sequence[int],
                 out_channels: int, extra_blocks: LastLevelMaxPool | None = None,
                 *, rngs: nnx.Rngs):
        if any(c == 0 for c in in_channels_list):
            raise ValueError("in_channels=0 is not supported")
        self.inner_blocks = nnx.List([
            nnx.Conv(c, out_channels, kernel_size=(1,) * spatial_dims, rngs=rngs)
            for c in in_channels_list])
        self.layer_blocks = nnx.List([
            nnx.Conv(out_channels, out_channels, kernel_size=(3,) * spatial_dims,
                     padding="SAME", rngs=rngs)
            for _ in in_channels_list])
        self.extra_blocks = extra_blocks

    def __call__(self, x: dict) -> dict:
        names = list(x.keys())
        feats = list(x.values())
        last_inner = self.inner_blocks[-1](feats[-1])
        results = [self.layer_blocks[-1](last_inner)]
        for idx in range(len(feats) - 2, -1, -1):
            lateral = self.inner_blocks[idx](feats[idx])
            target = (lateral.shape[0],) + lateral.shape[1:-1] + (last_inner.shape[-1],)
            top_down = jax.image.resize(last_inner, target, method="nearest")
            last_inner = lateral + top_down
            results.insert(0, self.layer_blocks[idx](last_inner))
        if self.extra_blocks is not None:
            results, names = self.extra_blocks(results, names)
        return dict(zip(names, results))


class BackboneWithFPN(nnx.Module):
    """Backbone feature extractor + FPN (reference: backbone_fpn_utils.py BackboneWithFPN).

    ``backbone`` must return a list of channel-last feature maps when called on a
    channel-last input (e.g. Daf3dBackbone)."""

    def __init__(self, backbone, return_layers: dict, in_channels_list: Sequence[int],
                 out_channels: int, spatial_dims: int, extra_blocks=None, *, rngs: nnx.Rngs):
        self.body = backbone
        self.return_layers = return_layers
        self.fpn = FeaturePyramidNetwork(spatial_dims, in_channels_list, out_channels,
                                         extra_blocks, rngs=rngs)
        self.out_channels = out_channels

    def __call__(self, x: jnp.ndarray) -> dict:
        feats = self.body(x)
        if isinstance(feats, dict):
            named = feats
        else:
            names = list(self.return_layers.values()) if self.return_layers else [
                f"feat{i}" for i in range(len(feats))]
            named = dict(zip(names, feats))
        return self.fpn(named)


class ExtraFPNBlock(nnx.Module):
    """Base class for extra FPN levels (reference: feature_pyramid_network.py
    ExtraFPNBlock)."""

    def __call__(self, results: list, names: list):
        raise NotImplementedError


class LastLevelP6P7(nnx.Module):
    """P6/P7 levels from strided convs on the last map (RetinaNet-style)
    (reference: feature_pyramid_network.py LastLevelP6P7)."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 *, rngs: nnx.Rngs):
        self.p6 = nnx.Conv(in_channels, out_channels, kernel_size=(3,) * spatial_dims,
                           strides=(2,) * spatial_dims, padding=(1,) * spatial_dims,
                           rngs=rngs)
        self.p7 = nnx.Conv(out_channels, out_channels, kernel_size=(3,) * spatial_dims,
                           strides=(2,) * spatial_dims, padding=(1,) * spatial_dims,
                           rngs=rngs)
        self.use_P5 = in_channels == out_channels

    def __call__(self, results: list, names: list):
        import jax

        last = results[-1]
        p6 = self.p6(last)
        p7 = self.p7(jax.nn.relu(p6))
        results.extend([p6, p7])
        names.extend(["p6", "p7"])
        return results, names
