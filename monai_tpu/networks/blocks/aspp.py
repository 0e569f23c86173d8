"""Atrous spatial pyramid pooling (reference: monai/networks/blocks/aspp.py:25 SimpleASPP).

Channel-last internals; dilated convs map directly to XLA `conv_general_dilated`.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from .convolutions import Convolution

__all__ = ["SimpleASPP"]


class SimpleASPP(nnx.Module):
    """Parallel dilated conv branches concatenated then projected
    (reference: aspp.py:25)."""

    def __init__(self, spatial_dims: int, in_channels: int, conv_out_channels: int,
                 kernel_sizes: Sequence[int] = (1, 3, 3, 3),
                 dilations: Sequence = (1, 2, 4, 6),
                 norm_type="BATCH", acti_type="LEAKYRELU", bias: bool = False,
                 *, rngs: nnx.Rngs):
        if len(kernel_sizes) != len(dilations):
            raise ValueError("kernel_sizes and dilations must have the same length, got "
                             f"{len(kernel_sizes)} and {len(dilations)}.")
        convs = []
        for k, d in zip(kernel_sizes, dilations):
            convs.append(Convolution(spatial_dims, in_channels, conv_out_channels,
                                     kernel_size=k, dilation=d, conv_only=True, bias=bias,
                                     rngs=rngs))
        self.convs = nnx.List(convs)
        out_ch = conv_out_channels * len(kernel_sizes)
        self.conv_k1 = Convolution(spatial_dims, out_ch, out_ch, kernel_size=1,
                                   norm=norm_type, act=acti_type, bias=bias, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = jnp.concatenate([c(x) for c in self.convs], axis=-1)
        return self.conv_k1(feats)
