"""MedNeXt: ConvNeXt-style 3D/2D segmentation network
(reference: monai/networks/nets/mednext.py:47 MedNeXt, :269 create_mednext;
blocks at monai/networks/blocks/mednext_block.py:31).

TPU-native: channel-last internals; depthwise convolutions via
``feature_group_count``; the transposed depthwise upsampling convolution is
expressed as an input-dilated convolution (``input_dilation=2``), which XLA lowers
to the same fractionally-strided conv without a separate transpose op.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["MedNeXt", "MedNext", "MedNeXtBlock", "MedNeXtDownBlock", "MedNeXtUpBlock",
           "MedNeXtOutBlock", "create_mednext",
           "MedNextS", "MedNeXtS", "MedNextSmall", "MedNeXtSmall",
           "MedNextB", "MedNeXtB", "MedNextBase", "MedNeXtBase",
           "MedNextM", "MedNeXtM", "MedNextMedium", "MedNeXtMedium",
           "MedNextL", "MedNeXtL", "MedNextLarge", "MedNeXtLarge"]


class _GRN(nnx.Module):
    """Global response normalization (reference: mednext_block.py:99; arXiv:2301.00808)."""

    def __init__(self, channels: int):
        self.gamma = nnx.Param(jnp.zeros((channels,)))
        self.beta = nnx.Param(jnp.zeros((channels,)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial_axes = tuple(range(1, x.ndim - 1))
        gx = jnp.sqrt(jnp.sum(x * x, axis=spatial_axes, keepdims=True))
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        return self.gamma.value * (x * nx) + self.beta.value + x


class MedNeXtBlock(nnx.Module):
    """depthwise kxk -> norm -> 1x1 expand -> GELU -> [GRN] -> 1x1 compress [+ residual]
    (reference: mednext_block.py:31)."""

    def __init__(self, in_channels: int, out_channels: int, expansion_ratio: int = 4,
                 kernel_size: int = 7, use_residual_connection: bool = True,
                 norm_type: str = "group", dim: str = "3d", global_resp_norm: bool = False,
                 *, rngs: nnx.Rngs):
        sd = 2 if dim == "2d" else 3
        self.do_res = use_residual_connection
        self.conv1 = nnx.Conv(in_channels, in_channels, kernel_size=(kernel_size,) * sd,
                              padding="SAME", feature_group_count=in_channels, rngs=rngs)
        if norm_type == "group":
            # per-channel groups == instance normalization over each channel
            self.norm = nnx.GroupNorm(in_channels, num_groups=in_channels, rngs=rngs)
        else:  # "layer"
            self.norm = nnx.LayerNorm(in_channels, rngs=rngs)
        mid = expansion_ratio * in_channels
        self.conv2 = nnx.Conv(in_channels, mid, kernel_size=(1,) * sd, rngs=rngs)
        self.conv3 = nnx.Conv(mid, out_channels, kernel_size=(1,) * sd, rngs=rngs)
        self.grn = _GRN(mid) if global_resp_norm else None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.conv1(x)
        h = jax.nn.gelu(self.conv2(self.norm(h)), approximate=False)
        if self.grn is not None:
            h = self.grn(h)
        h = self.conv3(h)
        return x + h if self.do_res else h


class MedNeXtDownBlock(MedNeXtBlock):
    """Stride-2 depthwise downsampling variant (reference: mednext_block.py:130)."""

    def __init__(self, in_channels: int, out_channels: int, expansion_ratio: int = 4,
                 kernel_size: int = 7, use_residual_connection: bool = False,
                 norm_type: str = "group", dim: str = "3d", global_resp_norm: bool = False,
                 *, rngs: nnx.Rngs):
        super().__init__(in_channels, out_channels, expansion_ratio, kernel_size,
                         use_residual_connection=False, norm_type=norm_type, dim=dim,
                         global_resp_norm=global_resp_norm, rngs=rngs)
        sd = 2 if dim == "2d" else 3
        self.resample_do_res = use_residual_connection
        if use_residual_connection:
            self.res_conv = nnx.Conv(in_channels, out_channels, kernel_size=(1,) * sd,
                                     strides=(2,) * sd, rngs=rngs)
        # override conv1 with the strided depthwise conv
        self.conv1 = nnx.Conv(in_channels, in_channels, kernel_size=(kernel_size,) * sd,
                              strides=(2,) * sd, padding=(kernel_size // 2,) * sd,
                              feature_group_count=in_channels, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = MedNeXtBlock.__call__(self, x)
        if self.resample_do_res:
            h = h + self.res_conv(x)
        return h


class MedNeXtUpBlock(MedNeXtBlock):
    """Fractionally-strided depthwise upsampling variant (reference: mednext_block.py:201).

    The reference pads the transposed-conv output by (1, 0) per spatial dim to reach
    exactly 2x the input size; we reproduce that asymmetric pad.
    """

    def __init__(self, in_channels: int, out_channels: int, expansion_ratio: int = 4,
                 kernel_size: int = 7, use_residual_connection: bool = False,
                 norm_type: str = "group", dim: str = "3d", global_resp_norm: bool = False,
                 *, rngs: nnx.Rngs):
        super().__init__(in_channels, out_channels, expansion_ratio, kernel_size,
                         use_residual_connection=False, norm_type=norm_type, dim=dim,
                         global_resp_norm=global_resp_norm, rngs=rngs)
        sd = 2 if dim == "2d" else 3
        self.sd = sd
        self.resample_do_res = use_residual_connection
        if use_residual_connection:
            # transpose k1 s2 == input-dilated k1 conv: out = 2n - 1
            self.res_conv = nnx.Conv(in_channels, out_channels, kernel_size=(1,) * sd,
                                     input_dilation=(2,) * sd, padding=(0,) * sd, rngs=rngs)
        # transpose k s2 p(k//2) == input-dilated conv with same symmetric pad: out = 2n - 1
        self.conv1 = nnx.Conv(in_channels, in_channels, kernel_size=(kernel_size,) * sd,
                              input_dilation=(2,) * sd, padding=(kernel_size // 2,) * sd,
                              feature_group_count=in_channels, rngs=rngs)

    def _pad_front(self, t: jnp.ndarray) -> jnp.ndarray:
        pads = [(0, 0)] + [(1, 0)] * self.sd + [(0, 0)]
        return jnp.pad(t, pads)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self._pad_front(MedNeXtBlock.__call__(self, x))
        if self.resample_do_res:
            h = h + self._pad_front(self.res_conv(x))
        return h


class MedNeXtOutBlock(nnx.Module):
    """1x1 projection head (reference: mednext_block.py:283)."""

    def __init__(self, in_channels: int, n_classes: int, dim: str, *, rngs: nnx.Rngs):
        sd = 2 if dim == "2d" else 3
        self.conv_out = nnx.Conv(in_channels, n_classes, kernel_size=(1,) * sd, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv_out(x)


class MedNeXt(nnx.Module):
    """MedNeXt encoder-decoder (reference: mednext.py:47). Channel-first public API;
    returns a tuple of deep-supervision outputs when ``deep_supervision`` is set."""

    def __init__(self, spatial_dims: int = 3, init_filters: int = 32, in_channels: int = 1,
                 out_channels: int = 2, encoder_expansion_ratio=2, decoder_expansion_ratio=2,
                 bottleneck_expansion_ratio: int = 2, kernel_size: int = 7,
                 deep_supervision: bool = False, use_residual_connection: bool = False,
                 blocks_down: Sequence[int] = (2, 2, 2, 2), blocks_bottleneck: int = 2,
                 blocks_up: Sequence[int] = (2, 2, 2, 2), norm_type: str = "group",
                 global_resp_norm: bool = False, *, rngs: nnx.Rngs):
        if spatial_dims not in (2, 3):
            raise ValueError("`spatial_dims` can only be 2 or 3.")
        dim = f"{spatial_dims}d"
        self.do_ds = deep_supervision
        if isinstance(encoder_expansion_ratio, int):
            encoder_expansion_ratio = [encoder_expansion_ratio] * len(blocks_down)
        if isinstance(decoder_expansion_ratio, int):
            decoder_expansion_ratio = [decoder_expansion_ratio] * len(blocks_up)

        self.stem = nnx.Conv(in_channels, init_filters, kernel_size=(1,) * spatial_dims,
                             rngs=rngs)
        common = dict(kernel_size=kernel_size, use_residual_connection=use_residual_connection,
                      norm_type=norm_type, dim=dim, global_resp_norm=global_resp_norm)
        enc_stages, down_blocks = [], []
        for i, n in enumerate(blocks_down):
            ch = init_filters * (2 ** i)
            enc_stages.append(nnx.List([
                MedNeXtBlock(ch, ch, encoder_expansion_ratio[i], rngs=rngs, **common)
                for _ in range(n)]))
            down_common = dict(common)
            down_common.pop("global_resp_norm")
            down_blocks.append(MedNeXtDownBlock(ch, ch * 2, encoder_expansion_ratio[i],
                                                rngs=rngs, **down_common))
        self.enc_stages = nnx.List(enc_stages)
        self.down_blocks = nnx.List(down_blocks)

        bch = init_filters * (2 ** len(blocks_down))
        self.bottleneck = nnx.List([
            MedNeXtBlock(bch, bch, bottleneck_expansion_ratio, rngs=rngs, **common)
            for _ in range(blocks_bottleneck)])

        up_blocks, dec_stages = [], []
        for i, n in enumerate(blocks_up):
            in_ch = init_filters * (2 ** (len(blocks_up) - i))
            out_ch = in_ch // 2
            up_blocks.append(MedNeXtUpBlock(in_ch, out_ch, decoder_expansion_ratio[i],
                                            rngs=rngs, **common))
            dec_stages.append(nnx.List([
                MedNeXtBlock(out_ch, out_ch, decoder_expansion_ratio[i], rngs=rngs, **common)
                for _ in range(n)]))
        self.up_blocks = nnx.List(up_blocks)
        self.dec_stages = nnx.List(dec_stages)

        self.out_0 = MedNeXtOutBlock(init_filters, out_channels, dim, rngs=rngs)
        if deep_supervision:
            obs = [MedNeXtOutBlock(init_filters * (2 ** i), out_channels, dim, rngs=rngs)
                   for i in range(1, len(blocks_up) + 1)]
            self.out_blocks = nnx.List(obs[::-1])
        else:
            self.out_blocks = None

    def __call__(self, x: jnp.ndarray):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = self.stem(jnp.transpose(x, perm_in))
        skips = []
        for stage, down in zip(self.enc_stages, self.down_blocks):
            for blk in stage:
                h = blk(h)
            skips.append(h)
            h = down(h)
        for blk in self.bottleneck:
            h = blk(h)

        def to_cf(t):
            return jnp.transpose(t, (0, t.ndim - 1) + tuple(range(1, t.ndim - 1)))

        ds_outputs = []
        for i, (up, dec) in enumerate(zip(self.up_blocks, self.dec_stages)):
            if self.do_ds and self.out_blocks is not None and i < len(self.out_blocks):
                ds_outputs.append(to_cf(self.out_blocks[i](h)))
            h = up(h) + skips[-(i + 1)]
            for blk in dec:
                h = blk(h)
        out = to_cf(self.out_0(h))
        if self.do_ds:
            return (out, *ds_outputs[::-1])
        return out


def create_mednext(variant: str, spatial_dims: int = 3, in_channels: int = 1,
                   out_channels: int = 2, kernel_size: int = 3,
                   deep_supervision: bool = False, *, rngs: nnx.Rngs) -> MedNeXt:
    """Factory for the S/B/M/L variants (reference: mednext.py:269)."""
    common = dict(spatial_dims=spatial_dims, in_channels=in_channels,
                  out_channels=out_channels, kernel_size=kernel_size,
                  deep_supervision=deep_supervision, use_residual_connection=True,
                  norm_type="group", global_resp_norm=False, init_filters=32, rngs=rngs)
    v = variant.upper()
    if v == "S":
        return MedNeXt(encoder_expansion_ratio=2, decoder_expansion_ratio=2,
                       bottleneck_expansion_ratio=2, blocks_down=(2, 2, 2, 2),
                       blocks_bottleneck=2, blocks_up=(2, 2, 2, 2), **common)
    if v == "B":
        return MedNeXt(encoder_expansion_ratio=(2, 3, 4, 4), decoder_expansion_ratio=(4, 4, 3, 2),
                       bottleneck_expansion_ratio=4, blocks_down=(2, 2, 2, 2),
                       blocks_bottleneck=2, blocks_up=(2, 2, 2, 2), **common)
    if v == "M":
        return MedNeXt(encoder_expansion_ratio=(2, 3, 4, 4), decoder_expansion_ratio=(4, 4, 3, 2),
                       bottleneck_expansion_ratio=4, blocks_down=(3, 4, 4, 4),
                       blocks_bottleneck=4, blocks_up=(4, 4, 4, 3), **common)
    if v == "L":
        return MedNeXt(encoder_expansion_ratio=(3, 4, 8, 8), decoder_expansion_ratio=(8, 8, 4, 3),
                       bottleneck_expansion_ratio=8, blocks_down=(3, 4, 8, 8),
                       blocks_bottleneck=8, blocks_up=(8, 8, 4, 3), **common)
    raise ValueError(f"Invalid MedNeXt variant: {variant}")


MedNext = MedNeXt


def _variant(v):
    def make(**kwargs):
        return create_mednext(v, **kwargs)
    return make


MedNextS = MedNeXtS = MedNextSmall = MedNeXtSmall = _variant("S")
MedNextB = MedNeXtB = MedNextBase = MedNeXtBase = _variant("B")
MedNextM = MedNeXtM = MedNextMedium = MedNeXtMedium = _variant("M")
MedNextL = MedNeXtL = MedNextLarge = MedNeXtLarge = _variant("L")
