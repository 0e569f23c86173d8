"""SegResNetDS — deep-supervision SegResNet (reference: monai/networks/nets/segresnet_ds.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..layers.factories import Conv, get_act_layer, get_norm_layer
from .segresnet import ResBlock, _conv

__all__ = ["SegResNetDS", "SegResNetDS2"]


class SegResNetDS(nnx.Module):
    """(reference: segresnet_ds.py SegResNetDS).  Returns a list of outputs at multiple
    scales when deep supervision is enabled (training), or the full-res logits."""

    def __init__(self, spatial_dims: int = 3, init_filters: int = 32, in_channels: int = 1,
                 out_channels: int = 2, act=("RELU", {}), norm=("GROUP", {"num_groups": 8}),
                 blocks_down: Sequence[int] = (1, 2, 2, 4), blocks_up: Sequence[int] | None = None,
                 dsdepth: int = 1, preprocess=None, upsample_mode: str = "deconv",
                 resolution=None, *, rngs: nnx.Rngs):
        self.dsdepth = max(dsdepth, 1)
        self.spatial_dims = spatial_dims
        n_levels = len(blocks_down)
        blocks_up = blocks_up or (1,) * (n_levels - 1)
        self.conv_init = _conv(spatial_dims, in_channels, init_filters, rngs=rngs)

        downs = []
        ch = init_filters
        for i, nb in enumerate(blocks_down):
            level = []
            if i > 0:
                level.append(_conv(spatial_dims, ch, ch * 2, stride=2, rngs=rngs))
                ch = ch * 2
            for _ in range(nb):
                level.append(ResBlock(spatial_dims, ch, norm, act=act, rngs=rngs))
            downs.append(nnx.List(level))
        self.down_layers = nnx.List(downs)

        ups = []
        heads = []
        for i, nb in enumerate(blocks_up):
            level = []
            level.append(Conv["convtrans", spatial_dims](ch, ch // 2, kernel_size=2, strides=2,
                                                         rngs=rngs))
            ch = ch // 2
            for _ in range(nb):
                level.append(ResBlock(spatial_dims, ch, norm, act=act, rngs=rngs))
            ups.append(nnx.List(level))
            if len(blocks_up) - i <= self.dsdepth:
                heads.append(_conv(spatial_dims, ch, out_channels, kernel_size=1, bias=True, rngs=rngs))
            else:
                heads.append(None)
        self.up_layers = nnx.List(ups)
        self.heads = nnx.List([h for h in heads if h is not None])
        self._head_levels = [i for i, h in enumerate(heads) if h is not None]

    def __call__(self, x, with_ds: bool = False):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        h = self.conv_init(h)
        skips = []
        for level in self.down_layers:
            for blk in level:
                h = blk(h)
            skips.append(h)
        outputs = []
        head_idx = 0
        for i, level in enumerate(self.up_layers):
            mods = list(level)
            h = mods[0](h)
            h = h + skips[-(i + 2)]
            for blk in mods[1:]:
                h = blk(h)
            if i in self._head_levels:
                o = self.heads[head_idx](h)
                head_idx += 1
                perm_out = (0, o.ndim - 1) + tuple(range(1, o.ndim - 1))
                outputs.append(jnp.transpose(o, perm_out))
        if with_ds and len(outputs) > 1:
            return outputs[::-1]  # full-res first
        return outputs[-1]


class SegResNetDS2(SegResNetDS):
    """SegResNetDS with a second (auto/class) decoder branch — the VISTA3D image encoder
    (reference: segresnet_ds.py:431)."""

    def __init__(self, spatial_dims: int = 3, init_filters: int = 32, in_channels: int = 1,
                 out_channels: int = 2, act=("RELU", {}), norm=("GROUP", {"num_groups": 8}),
                 blocks_down: Sequence[int] = (1, 2, 2, 4), blocks_up: Sequence[int] | None = None,
                 dsdepth: int = 1, preprocess=None, upsample_mode: str = "deconv",
                 resolution=None, *, rngs: nnx.Rngs):
        super().__init__(spatial_dims, init_filters, in_channels, out_channels, act, norm,
                         blocks_down, blocks_up, dsdepth, preprocess, upsample_mode,
                         resolution, rngs=rngs)
        # independent second decoder (same topology, freshly initialized)
        n_levels = len(blocks_down)
        bu = blocks_up or (1,) * (n_levels - 1)
        ch = init_filters * (2 ** (n_levels - 1))
        ups, heads = [], []
        for i, nb in enumerate(bu):
            level = [Conv["convtrans", spatial_dims](ch, ch // 2, kernel_size=2, strides=2,
                                                     rngs=rngs)]
            ch = ch // 2
            for _ in range(nb):
                level.append(ResBlock(spatial_dims, ch, norm, act=act, rngs=rngs))
            ups.append(nnx.List(level))
            if len(bu) - i <= self.dsdepth:
                heads.append(_conv(spatial_dims, ch, out_channels, kernel_size=1, bias=True,
                                   rngs=rngs))
        self.up_layers_auto = nnx.List(ups)
        self.heads_auto = nnx.List(heads)

    def _decode(self, h, skips, up_layers, heads):
        outputs = []
        head_idx = 0
        for i, level in enumerate(up_layers):
            mods = list(level)
            h = mods[0](h)
            h = h + skips[-(i + 2)]
            for blk in mods[1:]:
                h = blk(h)
            if i in self._head_levels:
                o = heads[head_idx](h)
                head_idx += 1
                perm_out = (0, o.ndim - 1) + tuple(range(1, o.ndim - 1))
                outputs.append(jnp.transpose(o, perm_out))
        return outputs

    def __call__(self, x, with_point: bool = True, with_label: bool = True):
        """Returns (point_branch_out, label_branch_out); unused branch is None."""
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        h = self.conv_init(h)
        skips = []
        for level in self.down_layers:
            for blk in level:
                h = blk(h)
            skips.append(h)
        out_point = out_auto = None
        if with_point:
            outs = self._decode(h, skips, self.up_layers, self.heads)
            out_point = outs[::-1] if len(outs) > 1 else outs[-1]
        if with_label:
            outs = self._decode(h, skips, self.up_layers_auto, self.heads_auto)
            out_auto = outs[::-1] if len(outs) > 1 else outs[-1]
        return out_point, out_auto


class SegResBlock(nnx.Module):
    """norm-act-conv x2 residual block (reference: segresnet_ds.py:95 SegResBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, norm, kernel_size=3,
                 act=("RELU", {}), *, rngs: nnx.Rngs):
        self.block = ResBlock(spatial_dims, in_channels, norm, act=act, rngs=rngs)

    def __call__(self, x):
        return self.block(x)


class SegResEncoder(nnx.Module):
    """The down path of SegResNetDS as a standalone feature encoder returning one
    feature map per level (reference: segresnet_ds.py:150 SegResEncoder).
    Channel-first in/out, matching the parent net's public convention."""

    def __init__(self, spatial_dims: int = 3, init_filters: int = 32, in_channels: int = 1,
                 act=("RELU", {}), norm=("GROUP", {"num_groups": 8}),
                 blocks_down: Sequence[int] = (1, 2, 2, 4), head_module=None,
                 anisotropic_scales=None, *, rngs: nnx.Rngs):
        self.head_module = head_module
        self.conv_init = _conv(spatial_dims, in_channels, init_filters, rngs=rngs)
        downs = []
        ch = init_filters
        for i, nb in enumerate(blocks_down):
            level = []
            if i > 0:
                level.append(_conv(spatial_dims, ch, ch * 2, stride=2, rngs=rngs))
                ch = ch * 2
            for _ in range(nb):
                level.append(ResBlock(spatial_dims, ch, norm, act=act, rngs=rngs))
            downs.append(nnx.List(level))
        self.down_layers = nnx.List(downs)

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm_in)
        h = self.conv_init(h)
        outputs = []
        for level in self.down_layers:
            for blk in level:
                h = blk(h)
            perm_out = (0, h.ndim - 1) + tuple(range(1, h.ndim - 1))
            outputs.append(jnp.transpose(h, perm_out))
        if self.head_module is not None:
            outputs = self.head_module(outputs)
        return outputs


__all__ += ["SegResBlock", "SegResEncoder"]


def scales_for_resolution(resolution, n_stages: int | None = None):
    """Downsampling-scale schedule for an anisotropic input resolution
    (reference: segresnet_ds.py:30)."""
    import numpy as np

    ndim = len(resolution)
    res = np.array(resolution)
    if not all(res > 0):
        raise ValueError("Resolution must be positive")
    nl = np.floor(np.log2(np.max(res) / res)).astype(np.int32)
    scales = [tuple(np.where(2**i >= 2**nl, 1, 2)) for i in range(max(nl))]
    if n_stages and n_stages > max(nl):
        scales = scales + [(2,) * ndim] * (n_stages - max(nl))
    else:
        scales = scales[:n_stages]
    return scales


def aniso_kernel(scale):
    """kernel_size / padding / stride for an anisotropic scale (reference:
    segresnet_ds.py:58)."""
    kernel_size = [3 if scale[k] > 1 else 1 for k in range(len(scale))]
    padding = [k // 2 for k in kernel_size]
    return kernel_size, padding, scale
