"""DAF3D: deep attentive features for 3D prostate ultrasound segmentation
(reference: monai/networks/nets/daf3d.py:466 DAF3D, :45 AttentionModule, :233 Daf3dResNet,
:352 Daf3dFPN).

Dilated group-norm ResNet backbone -> 3D FPN -> attention refinement -> anisotropic ASPP.
Channel-last internals; trilinear resizes via jax.image.resize.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.convolutions import Convolution

__all__ = ["DAF3D", "AttentionModule", "Daf3dBackbone"]

_GN = ("group", {"num_groups": 32})
_PRELU = ("prelu", {})


def _resize_to(x: jnp.ndarray, spatial) -> jnp.ndarray:
    target = (x.shape[0],) + tuple(spatial) + (x.shape[-1],)
    return jax.image.resize(x, target, method="trilinear")


class _Bottleneck(nnx.Module):
    """GroupNorm bottleneck, expansion 2, grouped 3x3 conv
    (reference: daf3d.py:162 Daf3dResNetBottleneck)."""

    expansion = 2

    def __init__(self, in_planes: int, planes: int, stride=1, dilation: int = 1,
                 *, rngs: nnx.Rngs):
        strides = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        self.conv1 = nnx.Conv(in_planes, planes, kernel_size=(1, 1, 1), use_bias=False, rngs=rngs)
        self.bn1 = nnx.GroupNorm(planes, num_groups=32, rngs=rngs)
        self.conv2 = nnx.Conv(planes, planes, kernel_size=(3, 3, 3), strides=strides,
                              kernel_dilation=(dilation,) * 3,
                              padding=(dilation,) * 3, feature_group_count=32,
                              use_bias=False, rngs=rngs)
        self.bn2 = nnx.GroupNorm(planes, num_groups=32, rngs=rngs)
        self.conv3 = nnx.Conv(planes, planes * 2, kernel_size=(1, 1, 1), use_bias=False, rngs=rngs)
        self.bn3 = nnx.GroupNorm(planes * 2, num_groups=32, rngs=rngs)
        if in_planes != planes * 2 or any(s != 1 for s in strides):
            self.downsample = nnx.List([
                nnx.Conv(in_planes, planes * 2, kernel_size=(1, 1, 1), strides=strides,
                         use_bias=False, rngs=rngs),
                nnx.GroupNorm(planes * 2, num_groups=32, rngs=rngs)])
        else:
            self.downsample = None
        self.prelu = nnx.Param(jnp.full((1,), 0.25))

    def _act(self, x):
        return jnp.where(x >= 0, x, self.prelu.value * x)

    def __call__(self, x):
        h = self._act(self.bn1(self.conv1(x)))
        h = self._act(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        res = x
        if self.downsample is not None:
            res = self.downsample[1](self.downsample[0](x))
        return self._act(h + res)


class Daf3dBackbone(nnx.Module):
    """4-stage dilated ResNet (layers 3,4,6,3; planes 128,256,512,1024; expansion 2)
    (reference: daf3d.py:318). Channel-last; returns 4 feature maps."""

    def __init__(self, n_input_channels: int, *, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(n_input_channels, 64, kernel_size=(7, 7, 7),
                              strides=(1, 2, 2), padding=(3, 3, 3), use_bias=False, rngs=rngs)
        self.bn1 = nnx.GroupNorm(64, num_groups=32, rngs=rngs)
        layers_cfg = [(128, 3, 1, 1), (256, 4, (1, 2, 2), 1), (512, 6, 1, 2), (1024, 3, 1, 2)]
        stages = []
        in_planes = 64
        for planes, n_blocks, stride, dilation in layers_cfg:
            blocks = [_Bottleneck(in_planes, planes, stride, dilation, rngs=rngs)]
            in_planes = planes * 2
            for _ in range(1, n_blocks):
                blocks.append(_Bottleneck(in_planes, planes, 1, dilation, rngs=rngs))
            stages.append(nnx.List(blocks))
        self.stages = nnx.List(stages)

    def __call__(self, x_cl: jnp.ndarray) -> list[jnp.ndarray]:
        h = jax.nn.relu(self.bn1(self.conv1(x_cl)))
        h = nnx.max_pool(h, (3, 3, 3), strides=(2, 2, 2), padding=[(1, 1)] * 3)
        feats = []
        for stage in self.stages:
            for blk in stage:
                h = blk(h)
            feats.append(h)
        return feats  # channels 256, 512, 1024, 2048


class AttentionModule(nnx.Module):
    """(reference: daf3d.py:45). Returns (refined slf, attentive map). Channel-last."""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int,
                 norm=_GN, act=_PRELU, *, rngs: nnx.Rngs):
        self.attentive_map = nnx.List([
            Convolution(spatial_dims, in_channels, out_channels, kernel_size=1, norm=norm,
                        act=act, rngs=rngs),
            Convolution(spatial_dims, out_channels, out_channels, kernel_size=3, norm=norm,
                        act=act, rngs=rngs),
            Convolution(spatial_dims, out_channels, out_channels, kernel_size=3,
                        adn_ordering="A", act="SIGMOID", rngs=rngs),
        ])
        self.refine = nnx.List([
            Convolution(spatial_dims, in_channels, out_channels, kernel_size=1, norm=norm,
                        act=act, rngs=rngs),
            Convolution(spatial_dims, out_channels, out_channels, kernel_size=3, norm=norm,
                        act=act, rngs=rngs),
            Convolution(spatial_dims, out_channels, out_channels, kernel_size=3, norm=norm,
                        act=act, rngs=rngs),
        ])

    def __call__(self, slf, mlf):
        att = jnp.concatenate([slf, mlf], axis=-1)
        for m in self.attentive_map:
            att = m(att)
        out = jnp.concatenate([slf, att * mlf], axis=-1)
        for m in self.refine:
            out = m(out)
        return out, att


class _ASPP(nnx.Module):
    """Anisotropic ASPP (reference: daf3d.py:87 Daf3dASPP)."""

    def __init__(self, in_channels: int, conv_out: int, out_channels: int, *, rngs: nnx.Rngs):
        dilations = ((1, 1, 1), (1, 6, 6), (1, 12, 12), (1, 18, 18))
        self.branches = nnx.List([
            nnx.List([
                nnx.Conv(in_channels, conv_out, kernel_size=(1, 1, 1), rngs=rngs),
                nnx.Conv(conv_out, conv_out, kernel_size=(3, 3, 3), kernel_dilation=d,
                         padding=tuple(d), rngs=rngs),
            ]) for d in dilations])
        self.norms = nnx.List([nnx.GroupNorm(conv_out, num_groups=32, rngs=rngs)
                               for _ in dilations])
        self.conv_out = nnx.Conv(conv_out * len(dilations), out_channels,
                                 kernel_size=(1, 1, 1), rngs=rngs)
        self.norm_out = nnx.GroupNorm(out_channels, num_groups=32, rngs=rngs)

    def __call__(self, x):
        outs = []
        for branch, norm in zip(self.branches, self.norms):
            h = branch[1](branch[0](x))
            outs.append(jax.nn.relu(norm(h)))
        return jax.nn.relu(self.norm_out(self.conv_out(jnp.concatenate(outs, axis=-1))))


class DAF3D(nnx.Module):
    """(reference: daf3d.py:466). Training mode returns the 9 supervised signals
    (4 SLF + 4 attentive + final), eval returns the final prediction."""

    def __init__(self, in_channels: int, out_channels: int, visual_output: bool = False,
                 *, rngs: nnx.Rngs):
        self.visual_output = visual_output
        self.backbone = Daf3dBackbone(in_channels, rngs=rngs)
        # FPN lateral 1x1 blocks: 256/512/1024/2048 -> 128
        self.fpn_inner = nnx.List([
            Convolution(3, c, 128, kernel_size=1, norm=_GN, act=_PRELU, rngs=rngs)
            for c in (256, 512, 1024, 2048)])
        self.predict1 = nnx.Conv(128, out_channels, kernel_size=(1, 1, 1), rngs=rngs)
        self.fuse = nnx.List([
            Convolution(3, 512, 64, kernel_size=1, adn_ordering="NA", norm=_GN, act=_PRELU,
                        rngs=rngs),
            Convolution(3, 64, 64, kernel_size=3, adn_ordering="NA", norm=_GN, act=_PRELU,
                        rngs=rngs),
            Convolution(3, 64, 64, kernel_size=3, adn_ordering="NA", norm=_GN, act=_PRELU,
                        rngs=rngs),
        ])
        self.attention = AttentionModule(3, 192, 64, rngs=rngs)
        self.refine = Convolution(3, 256, 64, kernel_size=1, adn_ordering="NA", norm=_GN,
                                  act=_PRELU, rngs=rngs)
        self.predict2 = nnx.Conv(64, out_channels, kernel_size=(1, 1, 1), rngs=rngs)
        self.aspp = _ASPP(64, 64, 64, rngs=rngs)

    def __call__(self, x: jnp.ndarray, training: bool = False):
        spatial = x.shape[2:]
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        feats = self.backbone(h)
        # FPN top-down with lateral 1x1s, all upsampled to feat1 resolution
        laterals = [blk(f) for blk, f in zip(self.fpn_inner, feats)]
        last = laterals[-1]
        results = [last]
        for lat in laterals[-2::-1]:
            last = lat + _resize_to(last, lat.shape[1:-1])
            results.insert(0, last)
        slfs = [results[0]] + [_resize_to(r, results[0].shape[1:-1]) for r in results[1:]]

        def to_cf(t):
            return jnp.transpose(t, (0, 4, 1, 2, 3))

        supervised1 = [to_cf(self.predict1(s)) for s in slfs]
        mlf = jnp.concatenate(slfs, axis=-1)
        for m in self.fuse:
            mlf = m(mlf)
        pairs = [self.attention(s, mlf) for s in slfs]
        att_features = [p[0] for p in pairs]
        att_maps = [p[1] for p in pairs]
        supervised2 = [to_cf(self.predict2(a)) for a in att_features]
        attentive_mlf = self.refine(jnp.concatenate(att_features, axis=-1))
        aspp = self.aspp(attentive_mlf)
        final = to_cf(self.predict2(aspp))

        def up_full(o):
            target = (o.shape[0], o.shape[1]) + tuple(spatial)
            return jax.image.resize(o, target, method="trilinear")

        if training:
            return [up_full(o) for o in supervised1 + supervised2 + [final]]
        if self.visual_output:
            sup3 = [to_cf(self.predict2(a)) for a in att_maps]
            return [up_full(final)] + [up_full(o) for o in supervised1 + supervised2 + sup3]
        return up_full(final)


# ---------------------------------------------------------------------------
# Reference-name exports (reference: daf3d.py Daf3dResNetBottleneck /
# Daf3dResNetDilatedBottleneck / Daf3dResNet / Daf3dFPN / Daf3dBackboneWithFPN /
# Daf3dASPP). The compact DAF3D above folds FPN/backbone composition inline;
# these expose the reference granularity, channels-last.
# ---------------------------------------------------------------------------
Daf3dASPP = _ASPP
Daf3dResNetBottleneck = _Bottleneck


class Daf3dResNetDilatedBottleneck(_Bottleneck):
    """Dilation-2 bottleneck (reference: daf3d.py Daf3dResNetDilatedBottleneck)."""

    def __init__(self, in_planes, planes, stride=1, dilation: int = 2, *, rngs):
        super().__init__(in_planes, planes, stride, dilation, rngs=rngs)


class Daf3dResNet(Daf3dBackbone):
    """The 4-stage GroupNorm/PReLU ResNet trunk (reference: daf3d.py Daf3dResNet);
    identical to Daf3dBackbone here (which is its only instantiation)."""


class Daf3dFPN(nnx.Module):
    """Top-down feature pyramid over the 4 backbone maps: 1x1 lateral convs +
    upsample-and-add + 3x3 smoothing (reference: daf3d.py Daf3dFPN)."""

    def __init__(self, spatial_dims: int, in_channels_list, out_channels: int,
                 *, rngs: nnx.Rngs):
        self.inner = nnx.List([nnx.Conv(c, out_channels, kernel_size=(1,) * spatial_dims,
                                        rngs=rngs) for c in in_channels_list])
        self.layer = nnx.List([nnx.Conv(out_channels, out_channels,
                                        kernel_size=(3,) * spatial_dims, rngs=rngs)
                               for _ in in_channels_list])

    def __call__(self, feats):
        laterals = [conv(f) for conv, f in zip(self.inner, feats)]
        out = [laterals[-1]]
        for lat in reversed(laterals[:-1]):
            up = _resize_to(out[0], lat.shape[1:-1])
            out.insert(0, lat + up)
        return [conv(o) for conv, o in zip(self.layer, out)]


class Daf3dBackboneWithFPN(nnx.Module):
    """Backbone + FPN composition (reference: daf3d.py Daf3dBackboneWithFPN)."""

    def __init__(self, backbone=None, return_layers=None, in_channels_list=None,
                 out_channels: int = 128, spatial_dims: int = 3, n_input_channels: int = 1,
                 *, rngs: nnx.Rngs):
        self.body = backbone if backbone is not None else Daf3dBackbone(n_input_channels,
                                                                        rngs=rngs)
        self.fpn = Daf3dFPN(spatial_dims, in_channels_list or (256, 512, 1024, 2048),
                            out_channels, rngs=rngs)

    def __call__(self, x_cl):
        return self.fpn(self.body(x_cl))


__all__ += ["Daf3dASPP", "Daf3dResNetBottleneck", "Daf3dResNetDilatedBottleneck",
            "Daf3dResNet", "Daf3dFPN", "Daf3dBackboneWithFPN"]
