"""NetAdapter: swap a classification model's head for a new FC/conv layer
(reference: monai/networks/nets/netadapter.py:26 NetAdapter,
monai/networks/nets/torchvision_fc.py TorchVisionFCModel analog).

Unlike the torch version (which slices ``children()[:-1]``), nnx modules expose no
ordered child list, so the wrapped model must provide features without its head: either
a ``features(x)``/``forward_features(x)`` method, or a ``no_head=True`` call argument, or
it was constructed with ``feed_forward=False`` (resnet-style). The adapter pools and
applies a fresh Linear (or 1x1 conv when ``use_conv``).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import nnx

__all__ = ["NetAdapter", "TorchVisionFCModel"]


class NetAdapter(nnx.Module):
    """(reference: netadapter.py:26)."""

    def __init__(self, model: Any, num_classes: int = 1, dim: int = 2,
                 in_channels: int | None = None, use_conv: bool = False,
                 pool: tuple | str | None = ("avg", {}), bias: bool = True,
                 fc_name: str = "fc", node_name: str = "", *, rngs: nnx.Rngs):
        self.features = model
        self.dim = dim
        self.use_conv = use_conv
        self.pool = pool
        if in_channels is None:
            orig_fc = getattr(model, fc_name, None)
            if orig_fc is not None and hasattr(orig_fc, "in_features"):
                in_channels = orig_fc.in_features
            elif orig_fc is not None and hasattr(orig_fc, "kernel"):
                in_channels = orig_fc.kernel.value.shape[0]
            else:
                raise ValueError("in_channels must be provided when the model has no "
                                 f"'{fc_name}' layer to infer it from.")
        if hasattr(model, fc_name):
            # detach the original head so it is not used or trained
            setattr(model, fc_name, None)
        if use_conv:
            self.fc = nnx.Conv(in_channels, num_classes, kernel_size=(1,) * dim, use_bias=bias,
                               rngs=rngs)
        else:
            self.fc = nnx.Linear(in_channels, num_classes, use_bias=bias, rngs=rngs)

    def _extract(self, x: jnp.ndarray) -> jnp.ndarray:
        m = self.features
        if hasattr(m, "forward_features"):
            return m.forward_features(x)
        if hasattr(m, "features"):
            feat = m.features
            if callable(feat):
                # channel-last backbones (e.g. SENet.features) expect channel-last input
                perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
                h = feat(jnp.transpose(x, perm_in))
                return jnp.transpose(h, (0, h.ndim - 1) + tuple(range(1, h.ndim - 1)))
        try:
            return m(x, no_head=True)
        except TypeError:
            return m(x)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self._extract(x)
        if h.ndim > 2 and self.pool is not None:
            # global average pool over spatial dims (channel-first feature map)
            h = h.mean(axis=tuple(range(2, h.ndim)))
        if self.use_conv:
            if h.ndim == 2:
                h = h.reshape(h.shape + (1,) * self.dim)
            perm_in = (0,) + tuple(range(2, h.ndim)) + (1,)
            out = self.fc(jnp.transpose(h, perm_in))
            return jnp.transpose(out, (0, out.ndim - 1) + tuple(range(1, out.ndim - 1)))
        if h.ndim > 2:
            h = h.reshape(h.shape[0], -1)
        return self.fc(h)


class TorchVisionFCModel(NetAdapter):
    """API-parity adapter (reference: torchvision_fc.py TorchVisionFCModel). Since
    torchvision pretrained weights are not loadable here, pass a constructed 2D
    backbone model explicitly; string model names are not supported."""

    def __init__(self, model: Any = "resnet18", num_classes: int = 1,
                 dim: int = 2, in_channels: int | None = None, use_conv: bool = False,
                 pool: tuple | str | None = ("avg", {}), bias: bool = True,
                 pretrained: bool = False, fc_name: str = "fc", node_name: str = "",
                 weights=None, *, rngs: nnx.Rngs):
        if isinstance(model, str):
            from . import resnet

            factories = {n: getattr(resnet, n) for n in
                         ("resnet10", "resnet18", "resnet34", "resnet50", "resnet101",
                          "resnet152", "resnet200")}
            if model not in factories:
                raise ValueError(f"unsupported torchvision-style model name: {model}; "
                                 f"supported: {sorted(factories)}")
            model = factories[model](spatial_dims=2, n_input_channels=3, num_classes=1000,
                                     rngs=rngs)
        super().__init__(model, num_classes, dim, in_channels, use_conv, pool, bias,
                         fc_name, node_name, rngs=rngs)
