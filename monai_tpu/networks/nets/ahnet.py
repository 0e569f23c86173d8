"""AHNet: anisotropic hybrid network (reference: monai/networks/nets/ahnet.py:303 AHNet,
:28 Bottleneck3x3x1, :184 Pseudo3DLayer, :251 PSP).

Channel-last internals. Anisotropic (3,3,1)/(1,1,3) kernels factor in-plane and
through-plane context — each maps to a single XLA conv. The 2D-weight transfer helper
(`copy_from`) from the torch version is omitted: pretrained 2D FCN weights are not
loadable in this environment.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["AHNet", "AHnet", "Ahnet"]


def _k(t, sd):
    return tuple(t)[-sd:]


def _bn(ch, rngs):
    return nnx.BatchNorm(ch, use_running_average=False, rngs=rngs)


class _Bottleneck331(nnx.Module):
    """(reference: ahnet.py:28 Bottleneck3x3x1)."""

    expansion = 4

    def __init__(self, sd: int, inplanes: int, planes: int, stride=1, downsample=None,
                 *, rngs: nnx.Rngs):
        stride = (stride,) * sd if isinstance(stride, int) else tuple(stride)
        self.conv1 = nnx.Conv(inplanes, planes, (1,) * sd, use_bias=False, rngs=rngs)
        self.bn1 = _bn(planes, rngs)
        self.conv2 = nnx.Conv(planes, planes, _k((3, 3, 1), sd), strides=stride,
                              padding=[(p, p) for p in _k((1, 1, 0), sd)], use_bias=False,
                              rngs=rngs)
        self.bn2 = _bn(planes, rngs)
        self.conv3 = nnx.Conv(planes, planes * 4, (1,) * sd, use_bias=False, rngs=rngs)
        self.bn3 = _bn(planes * 4, rngs)
        self.downsample = downsample
        self.sd = sd

    def __call__(self, x):
        residual = x
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        out = jax.nn.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            for m in self.downsample:
                residual = m(residual)
            if out.shape != residual.shape:
                ks = _k((1, 1, 2), self.sd)
                out = nnx.max_pool(out, ks, strides=ks, padding="VALID")
        return jax.nn.relu(out + residual)


class _MaxPoolMod(nnx.Module):
    def __init__(self, kernel, stride, padding="VALID"):
        self.kernel = tuple(kernel)
        self.stride = tuple(stride)
        self.padding = padding

    def __call__(self, x):
        return nnx.max_pool(x, self.kernel, strides=self.stride, padding=self.padding)


class _Pseudo3DLayer(nnx.Module):
    """(reference: ahnet.py:184). Dense layer with (3,3,1)+(1,1,3) factored convs."""

    def __init__(self, sd: int, n_in: int, growth: int, bn_size: int, dropout_prob: float,
                 *, rngs: nnx.Rngs):
        self.bn1 = _bn(n_in, rngs)
        self.conv1 = nnx.Conv(n_in, bn_size * growth, (1,) * sd, use_bias=False, rngs=rngs)
        self.bn2 = _bn(bn_size * growth, rngs)
        self.conv2 = nnx.Conv(bn_size * growth, growth, _k((3, 3, 1), sd),
                              padding=[(p, p) for p in _k((1, 1, 0), sd)], use_bias=False,
                              rngs=rngs)
        self.bn3 = _bn(growth, rngs)
        self.conv3 = nnx.Conv(growth, growth, _k((1, 1, 3), sd),
                              padding=[(p, p) for p in _k((0, 0, 1), sd)], use_bias=False,
                              rngs=rngs)
        self.bn4 = _bn(growth, rngs)
        self.conv4 = nnx.Conv(growth, growth, (1,) * sd, use_bias=False, rngs=rngs)

    def __call__(self, x):
        inx = x
        x = self.conv1(jax.nn.relu(self.bn1(x)))
        x331 = self.conv2(jax.nn.relu(self.bn2(x)))
        x113 = self.conv3(jax.nn.relu(self.bn3(x331)))
        x = x331 + x113
        new = self.conv4(jax.nn.relu(self.bn4(x)))
        return jnp.concatenate([inx, new], axis=-1)


class _DenseBlock(nnx.Module):
    def __init__(self, sd, num_layers, n_in, bn_size, growth, dropout_prob, *, rngs):
        self.layers = nnx.List([
            _Pseudo3DLayer(sd, n_in + i * growth, growth, bn_size, dropout_prob, rngs=rngs)
            for i in range(num_layers)])

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class _UpTransition(nnx.Module):
    """norm-relu-1x1 conv-2x upsample (reference: ahnet.py:122)."""

    def __init__(self, sd, n_in, n_out, upsample_mode, *, rngs):
        self.norm = _bn(n_in, rngs)
        self.conv = nnx.Conv(n_in, n_out, (1,) * sd, use_bias=False, rngs=rngs)
        self.mode = upsample_mode
        self.sd = sd
        if upsample_mode == "transpose":
            self.up = nnx.ConvTranspose(n_out, n_out, (2,) * sd, strides=(2,) * sd,
                                        use_bias=False, rngs=rngs)
        else:
            self.up = None

    def __call__(self, x):
        x = self.conv(jax.nn.relu(self.norm(x)))
        if self.up is not None:
            return self.up(x)
        method = "nearest" if self.mode == "nearest" else "linear"
        new_shape = (x.shape[0],) + tuple(2 * s for s in x.shape[1:-1]) + (x.shape[-1],)
        return jax.image.resize(x, new_shape, method=method)


class _Final(nnx.Module):
    """norm-relu-(3,3,1) conv-2x upsample (reference: ahnet.py:148)."""

    def __init__(self, sd, n_in, n_out, upsample_mode, *, rngs):
        self.norm = _bn(n_in, rngs)
        self.conv = nnx.Conv(n_in, n_out, _k((3, 3, 1), sd),
                             padding=[(p, p) for p in _k((1, 1, 0), sd)], use_bias=False,
                             rngs=rngs)
        self.mode = upsample_mode
        if upsample_mode == "transpose":
            self.up = nnx.ConvTranspose(n_out, n_out, (2,) * sd, strides=(2,) * sd,
                                        use_bias=False, rngs=rngs)
        else:
            self.up = None

    def __call__(self, x):
        x = self.conv(jax.nn.relu(self.norm(x)))
        if self.up is not None:
            return self.up(x)
        method = "nearest" if self.mode == "nearest" else "linear"
        new_shape = (x.shape[0],) + tuple(2 * s for s in x.shape[1:-1]) + (x.shape[-1],)
        return jax.image.resize(x, new_shape, method=method)


class _Projection(nnx.Module):
    def __init__(self, sd, n_in, n_out, *, rngs):
        self.norm = _bn(n_in, rngs)
        self.conv = nnx.Conv(n_in, n_out, (1,) * sd, use_bias=False, rngs=rngs)

    def __call__(self, x):
        return self.conv(jax.nn.relu(self.norm(x)))


class _PSP(nnx.Module):
    """Pyramid volumetric pooling (reference: ahnet.py:251). Pooled projections are
    resized back to the input spatial size (equivalent to the interpolate modes; the
    reference's 'transpose' variant differs only in the learned upsampling)."""

    def __init__(self, sd, psp_block_num, in_ch, upsample_mode, *, rngs):
        self.sd = sd
        self.n = psp_block_num
        self.mode = upsample_mode
        self.projects = nnx.List([
            nnx.Conv(in_ch, 1, (1,) * sd, rngs=rngs) for _ in range(psp_block_num)])

    def __call__(self, x):
        outs = []
        for i, proj in enumerate(self.projects):
            size = _k((2 ** (i + 3), 2 ** (i + 3), 1), self.sd)
            pooled = nnx.max_pool(x, size, strides=size, padding="SAME")
            p = proj(pooled)
            target = (x.shape[0],) + x.shape[1:-1] + (1,)
            method = "nearest" if self.mode in ("nearest", "transpose") else "linear"
            outs.append(jax.image.resize(p, target, method=method))
        return jnp.concatenate(outs, axis=-1)


class AHNet(nnx.Module):
    """(reference: ahnet.py:303). Channel-first public API.

    Input H/W should be divisible by 2**(psp_block_num+3); depth (3D) by 32.
    """

    def __init__(self, layers: tuple = (3, 4, 6, 3), spatial_dims: int = 3,
                 in_channels: int = 1, out_channels: int = 1, psp_block_num: int = 4,
                 upsample_mode: str = "transpose", pretrained: bool = False,
                 progress: bool = True, *, rngs: nnx.Rngs):
        if spatial_dims not in (2, 3):
            raise ValueError("spatial_dims can only be 2 or 3.")
        if psp_block_num not in (0, 1, 2, 3, 4):
            raise ValueError("psp_block_num should be in [0, 4].")
        sd = spatial_dims
        self.sd = sd
        self.psp_block_num = psp_block_num
        self.upsample_mode = upsample_mode
        self.inplanes = 64
        self.conv1 = nnx.Conv(in_channels, 64, _k((7, 7, 3), sd),
                              strides=_k((2, 2, 1), sd),
                              padding=[(p, p) for p in _k((3, 3, 1), sd)], use_bias=False,
                              rngs=rngs)
        self.pool1 = _MaxPoolMod(_k((1, 1, 2), sd), _k((1, 1, 2), sd))
        self.bn0 = _bn(64, rngs)
        if upsample_mode in ("transpose", "nearest"):
            self.maxpool = _MaxPoolMod(_k((2, 2, 2), sd), (2,) * sd)
        else:
            self.maxpool = _MaxPoolMod(_k((3, 3, 3), sd), (2,) * sd, padding="SAME")
        self.layer1 = self._make_layer(64, layers[0], 1, rngs)
        self.layer2 = self._make_layer(128, layers[1], 2, rngs)
        self.layer3 = self._make_layer(256, layers[2], 2, rngs)
        self.layer4 = self._make_layer(512, layers[3], 2, rngs)

        densegrowth, densebn, ndenselayer = 20, 4, 3
        num_init_features = 64
        n1, n2, n3, n4 = 256, 512, 1024, 2048
        self.up0 = _UpTransition(sd, n4, n3, upsample_mode, rngs=rngs)
        self.dense0 = _DenseBlock(sd, ndenselayer, n3, densebn, densegrowth, 0.0, rngs=rngs)
        nd0 = n3 + ndenselayer * densegrowth
        self.up1 = _UpTransition(sd, nd0, n2, upsample_mode, rngs=rngs)
        self.dense1 = _DenseBlock(sd, ndenselayer, n2, densebn, densegrowth, 0.0, rngs=rngs)
        nd1 = n2 + ndenselayer * densegrowth
        self.up2 = _UpTransition(sd, nd1, n1, upsample_mode, rngs=rngs)
        self.dense2 = _DenseBlock(sd, ndenselayer, n1, densebn, densegrowth, 0.0, rngs=rngs)
        nd2 = n1 + ndenselayer * densegrowth
        self.trans1 = _Projection(sd, nd2, num_init_features, rngs=rngs)
        self.dense3 = _DenseBlock(sd, ndenselayer, num_init_features, densebn, densegrowth,
                                  0.0, rngs=rngs)
        nd3 = num_init_features + densegrowth * ndenselayer
        self.up3 = _UpTransition(sd, nd3, num_init_features, upsample_mode, rngs=rngs)
        self.dense4 = _DenseBlock(sd, ndenselayer, num_init_features, densebn, densegrowth,
                                  0.0, rngs=rngs)
        nd4 = num_init_features + densegrowth * ndenselayer
        self.psp = _PSP(sd, psp_block_num, nd4, upsample_mode, rngs=rngs) \
            if psp_block_num > 0 else None
        self.final = _Final(sd, psp_block_num + nd4, out_channels, upsample_mode, rngs=rngs)

    def _make_layer(self, planes: int, blocks: int, stride: int, rngs) -> nnx.List:
        sd = self.sd
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nnx.List([
                nnx.Conv(self.inplanes, planes * 4, (1,) * sd,
                         strides=_k((stride, stride, 1), sd)[:sd] if sd == 3
                         else (stride,) * sd, use_bias=False, rngs=rngs),
                _MaxPoolMod((1, 1, stride)[:sd] if sd == 3 else (1,) * sd,
                            (1, 1, stride)[:sd] if sd == 3 else (1,) * sd),
                _bn(planes * 4, rngs),
            ])
        strides = (stride, stride, 1)[:sd]
        layers = [_Bottleneck331(sd, self.inplanes, planes, strides, downsample, rngs=rngs)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_Bottleneck331(sd, self.inplanes, planes, rngs=rngs))
        return nnx.List(layers)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.transpose(x, (0,) + tuple(range(2, x.ndim)) + (1,))
        h = self.conv1(h)
        h = self.pool1(h)
        h = jax.nn.relu(self.bn0(h))
        conv_x = h
        h = self.maxpool(h)
        pool_x = h
        fm = [h]
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            v = fm[-1]
            for blk in stage:
                v = blk(v)
            fm.append(v)
        fm1, fm2, fm3, fm4 = fm[1:]
        d0 = self.dense0(self.up0(fm4) + fm3)
        d1 = self.dense1(self.up1(d0) + fm2)
        d2 = self.dense2(self.up2(d1) + fm1)
        d3 = self.dense3(self.trans1(d2) + pool_x)
        d4 = self.dense4(self.up3(d3) + conv_x)
        if self.psp is not None:
            h = jnp.concatenate([self.psp(d4), d4], axis=-1)
        else:
            h = d4
        out = self.final(h)
        return jnp.transpose(out, (0, out.ndim - 1) + tuple(range(1, out.ndim - 1)))


AHnet = Ahnet = AHNet


# Reference-name exports of the building blocks (reference: ahnet.py classes)
Bottleneck3x3x1 = _Bottleneck331
Pseudo3DLayer = _Pseudo3DLayer
UpTransition = _UpTransition
Final = _Final
Projection = _Projection
PSP = _PSP
__all__ += ["Bottleneck3x3x1", "Pseudo3DLayer", "UpTransition", "Final", "Projection", "PSP"]


def copy_conv_param(module2d, module3d):
    """Inflate a 2D conv's parameters into a 3D conv by adding a unit depth axis
    (reference: ahnet.py:537). Works on nnx modules (kernel layout (*spatial,
    cin, cout)) and torch modules (parameters())."""
    if hasattr(module2d, "parameters"):  # torch pair
        for p2d, p3d in zip(module2d.parameters(), module3d.parameters()):
            p3d.data[:] = p2d.data.unsqueeze(dim=4).clone()[:]
        return
    k2 = module2d.kernel.value
    module3d.kernel.value = k2[:, :, None, :, :].astype(module3d.kernel.value.dtype)
    if getattr(module2d, "bias", None) is not None and getattr(module3d, "bias", None) is not None:
        module3d.bias.value = module2d.bias.value.astype(module3d.bias.value.dtype)


def copy_bn_param(module2d, module3d):
    """Copy 2D norm scale/bias into the matching 3D norm (reference:
    ahnet.py:542)."""
    if hasattr(module2d, "parameters"):  # torch pair
        for p2d, p3d in zip(module2d.parameters(), module3d.parameters()):
            p3d.data[:] = p2d.data[:]
        return
    for name in ("scale", "bias", "mean", "var"):
        src = getattr(module2d, name, None)
        dst = getattr(module3d, name, None)
        if src is not None and dst is not None and hasattr(src, "value"):
            dst.value = src.value
