"""FCN family with global convolutional network blocks
(reference: monai/networks/blocks/fcn.py:30 GCN, :58 Refine, :90 FCN, :200 MCFCN).

The reference initializes FCN from a pretrained torchvision ResNet50 (not loadable
here); the architecture is identical with fresh initialization. Channel-first public
API.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["GCN", "Refine", "FCN", "MCFCN"]


class GCN(nnx.Module):
    """Global convolution: (k,1)+(1,k) parallel branches summed (reference: fcn.py:30)."""

    def __init__(self, inplanes: int, planes: int, ks: int = 7, *, rngs: nnx.Rngs):
        p = ks // 2
        self.conv_l1 = nnx.Conv(inplanes, planes, kernel_size=(ks, 1), padding=[(p, p), (0, 0)],
                                rngs=rngs)
        self.conv_l2 = nnx.Conv(planes, planes, kernel_size=(1, ks), padding=[(0, 0), (p, p)],
                                rngs=rngs)
        self.conv_r1 = nnx.Conv(inplanes, planes, kernel_size=(1, ks), padding=[(0, 0), (p, p)],
                                rngs=rngs)
        self.conv_r2 = nnx.Conv(planes, planes, kernel_size=(ks, 1), padding=[(p, p), (0, 0)],
                                rngs=rngs)

    def __call__(self, x):
        return self.conv_l2(self.conv_l1(x)) + self.conv_r2(self.conv_r1(x))


class Refine(nnx.Module):
    """Residual refinement block (reference: fcn.py:58)."""

    def __init__(self, planes: int, *, rngs: nnx.Rngs):
        self.bn = nnx.BatchNorm(planes, use_running_average=False, rngs=rngs)
        self.conv1 = nnx.Conv(planes, planes, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.conv2 = nnx.Conv(planes, planes, kernel_size=(3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x):
        residual = x
        h = jax.nn.relu(self.bn(x))
        h = self.conv2(jax.nn.relu(self.conv1(h)))
        return residual + h


class FCN(nnx.Module):
    """2D FCN-GCN segmentation head over a ResNet50 backbone (reference: fcn.py:90)."""

    def __init__(self, out_channels: int = 1, upsample_mode: str = "bilinear",
                 pretrained: bool = False, progress: bool = True, *, rngs: nnx.Rngs):
        from ..nets.resnet import resnet50

        self.upsample_mode = upsample_mode
        self.out_channels = out_channels
        backbone = resnet50(spatial_dims=2, n_input_channels=3, num_classes=1,
                            feed_forward=False, rngs=rngs)
        self.backbone = backbone
        self.gcn1 = GCN(2048, out_channels, rngs=rngs)
        self.gcn2 = GCN(1024, out_channels, rngs=rngs)
        self.gcn3 = GCN(512, out_channels, rngs=rngs)
        self.gcn4 = GCN(64, out_channels, rngs=rngs)
        self.gcn5 = GCN(64, out_channels, rngs=rngs)
        self.refine1 = Refine(out_channels, rngs=rngs)
        self.refine2 = Refine(out_channels, rngs=rngs)
        self.refine3 = Refine(out_channels, rngs=rngs)
        self.refine4 = Refine(out_channels, rngs=rngs)
        self.refine5 = Refine(out_channels, rngs=rngs)
        self.refine6 = Refine(out_channels, rngs=rngs)
        self.refine7 = Refine(out_channels, rngs=rngs)
        self.refine8 = Refine(out_channels, rngs=rngs)
        self.refine9 = Refine(out_channels, rngs=rngs)
        self.refine10 = Refine(out_channels, rngs=rngs)

    def _up(self, x, target_spatial):
        new_shape = (x.shape[0],) + tuple(target_spatial) + (x.shape[-1],)
        method = "linear" if self.upsample_mode == "bilinear" else "nearest"
        return jax.image.resize(x, new_shape, method=method)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_spatial = x.shape[2:]
        h = jnp.transpose(x, (0, 2, 3, 1))
        bb = self.backbone
        h = bb.act(bb.bn1(bb.conv1(h)))
        conv_x = h  # /2, 64
        pooled = nnx.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        pool_x = pooled  # /4, 64
        f = pooled
        fms = []
        for layer in (bb.layer1, bb.layer2, bb.layer3, bb.layer4):
            for blk in layer:
                f = blk(f)
            fms.append(f)
        fm1, fm2, fm3, fm4 = fms  # 256 /4, 512 /8, 1024 /16, 2048 /32
        gcfm1 = self.refine1(self.gcn1(fm4))
        gcfm2 = self.refine2(self.gcn2(fm3))
        gcfm3 = self.refine3(self.gcn3(fm2))
        gcfm4 = self.refine4(self.gcn4(pool_x))
        gcfm5 = self.refine5(self.gcn5(conv_x))
        fs1 = self.refine6(self._up(gcfm1, fm3.shape[1:-1]) + gcfm2)
        fs2 = self.refine7(self._up(fs1, fm2.shape[1:-1]) + gcfm3)
        fs3 = self.refine8(self._up(fs2, pool_x.shape[1:-1]) + gcfm4)
        fs4 = self.refine9(self._up(fs3, conv_x.shape[1:-1]) + gcfm5)
        out = self.refine10(self._up(fs4, in_spatial))
        return jnp.transpose(out, (0, 3, 1, 2))


class MCFCN(FCN):
    """FCN with a multi-channel input projection to 3 channels (reference: fcn.py:200)."""

    def __init__(self, in_channels: int = 3, out_channels: int = 1,
                 upsample_mode: str = "bilinear", pretrained: bool = False,
                 progress: bool = True, *, rngs: nnx.Rngs):
        super().__init__(out_channels=out_channels, upsample_mode=upsample_mode,
                         pretrained=pretrained, progress=progress, rngs=rngs)
        from .convolutions import Convolution

        self.init_proj = Convolution(2, in_channels, 3, kernel_size=1, act=("relu", {}),
                                     norm="BATCH", bias=False, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.init_proj(h)
        h = jnp.transpose(h, (0, 3, 1, 2))
        return super().__call__(h)
