"""PatchGAN discriminator(s) (reference: monai/networks/nets/patchgan_discriminator.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution

__all__ = ["PatchDiscriminator", "MultiScalePatchDiscriminator"]


class PatchDiscriminator(nnx.Module):
    """70x70-style patch discriminator (reference: patchgan_discriminator.py PatchDiscriminator).

    Returns the list of intermediate features + final logits (for feature-matching
    losses), matching the reference's output contract.
    """

    def __init__(self, spatial_dims: int, channels: int, in_channels: int = 1, out_channels: int = 1,
                 num_layers_d: int = 3, kernel_size: int = 4,
                 activation=("LEAKYRELU", {"negative_slope": 0.2}), norm="BATCH", bias: bool = False,
                 padding: int = 1, dropout: float = 0.0, last_conv_kernel_size: int | None = None,
                 *, rngs: nnx.Rngs):
        last_conv_kernel_size = last_conv_kernel_size or kernel_size
        layers = [Convolution(spatial_dims, in_channels, channels, strides=2, kernel_size=kernel_size,
                              act=activation, norm=None, bias=True, padding=padding, rngs=rngs)]
        ch = channels
        for i in range(num_layers_d - 1):
            stride = 2 if i < num_layers_d - 2 else 1
            layers.append(Convolution(spatial_dims, ch, ch * 2, strides=stride, kernel_size=kernel_size,
                                      act=activation, norm=norm, bias=bias, dropout=dropout,
                                      padding=padding, rngs=rngs))
            ch = ch * 2
        layers.append(Convolution(spatial_dims, ch, out_channels, strides=1,
                                  kernel_size=last_conv_kernel_size, act=None, norm=None, bias=True,
                                  conv_only=True, padding=last_conv_kernel_size // 2, rngs=rngs))
        self.layers = nnx.List(layers)

    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        outs = []
        for layer in self.layers:
            h = layer(h)
            perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
            outs.append(jnp.transpose(h, perm_out))
        return outs


class MultiScalePatchDiscriminator(nnx.Module):
    """Several patch discriminators at decreasing resolutions
    (reference: patchgan_discriminator.py MultiScalePatchDiscriminator)."""

    def __init__(self, num_d: int, spatial_dims: int, channels: int, in_channels: int = 1,
                 out_channels: int = 1, num_layers_d: int = 3, kernel_size: int = 4,
                 activation=("LEAKYRELU", {"negative_slope": 0.2}), norm="BATCH", bias: bool = False,
                 dropout: float = 0.0, minimum_size_im: int = 256,
                 last_conv_kernel_size: int = 1, *, rngs: nnx.Rngs):
        self.num_d = num_d
        self.spatial_dims = spatial_dims
        discs = []
        for i in range(num_d):
            discs.append(PatchDiscriminator(spatial_dims, channels, in_channels, out_channels,
                                            num_layers_d, kernel_size, activation, norm, bias,
                                            kernel_size // 2, dropout, last_conv_kernel_size, rngs=rngs))
        self.discriminators = nnx.List(discs)

    def __call__(self, x: jnp.ndarray):
        """Returns (list of final logits, list of per-D feature lists)."""
        import jax

        outs, feats = [], []
        cur = x
        for d in self.discriminators:
            o = d(cur)
            outs.append(o[-1])
            feats.append(o[:-1])
            # downsample for the next discriminator
            window = (1, 1) + (2,) * self.spatial_dims
            cur = jax.lax.reduce_window(cur, 0.0, jax.lax.add, window, window, "VALID") / (2**self.spatial_dims)
        return outs, feats
