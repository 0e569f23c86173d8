"""SegResNet / SegResNetVAE (reference: monai/networks/nets/segresnet.py:29,187,
blocks from segresnet_block.py)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..blocks.upsample import UpSample
from ..layers.factories import Conv, get_act_layer, get_norm_layer

__all__ = ["SegResNet", "SegResNetVAE"]


def _conv(spatial_dims, in_ch, out_ch, kernel_size=3, stride=1, bias=False, *, rngs):
    pad = [(kernel_size // 2, kernel_size // 2)] * spatial_dims
    return Conv["conv", spatial_dims](in_ch, out_ch, kernel_size=kernel_size, strides=stride,
                                      bias=bias, padding=pad, rngs=rngs)


class ResBlock(nnx.Module):
    """norm-act-conv x2 + residual (reference: segresnet_block.py ResBlock)."""

    def __init__(self, spatial_dims: int, in_channels: int, norm, kernel_size: int = 3,
                 act=("RELU", {}), *, rngs: nnx.Rngs):
        self.norm1 = get_norm_layer(norm, spatial_dims, in_channels, rngs=rngs)
        self.norm2 = get_norm_layer(norm, spatial_dims, in_channels, rngs=rngs)
        self.act = get_act_layer(act)
        self.conv1 = _conv(spatial_dims, in_channels, in_channels, kernel_size, rngs=rngs)
        self.conv2 = _conv(spatial_dims, in_channels, in_channels, kernel_size, rngs=rngs)

    def __call__(self, x):
        identity = x
        x = self.conv1(self.act(self.norm1(x)))
        x = self.conv2(self.act(self.norm2(x)))
        return x + identity


class SegResNet(nnx.Module):
    """Residual encoder-decoder segmentation net (reference: segresnet.py:29)."""

    def __init__(self, spatial_dims: int = 3, init_filters: int = 8, in_channels: int = 1,
                 out_channels: int = 2, dropout_prob: float | None = None,
                 act=("RELU", {"inplace": True}), norm=("GROUP", {"num_groups": 8}),
                 norm_name: str = "", num_groups: int = 8, use_conv_final: bool = True,
                 blocks_down: Sequence[int] = (1, 2, 2, 4), blocks_up: Sequence[int] = (1, 1, 1),
                 upsample_mode: str = "nontrainable", *, rngs: nnx.Rngs):
        if spatial_dims not in (2, 3):
            raise ValueError("`spatial_dims` can only be 2 or 3.")
        self.spatial_dims = spatial_dims
        self.init_filters = init_filters
        self.blocks_down = blocks_down
        self.blocks_up = blocks_up
        self.norm = norm
        self.act = act
        self.use_conv_final = use_conv_final
        self.convInit = _conv(spatial_dims, in_channels, init_filters, rngs=rngs)
        self.dropout = nnx.Dropout(dropout_prob, rngs=rngs) if dropout_prob is not None else None

        # encoder
        down_layers = []
        filters = init_filters
        for i, n_blocks in enumerate(blocks_down):
            layer_in = filters * 2**i
            pre_conv = _conv(spatial_dims, layer_in // 2, layer_in, stride=2, rngs=rngs) if i > 0 else None
            blocks = nnx.List([ResBlock(spatial_dims, layer_in, norm, act=act, rngs=rngs)
                               for _ in range(n_blocks)])
            down_layers.append(nnx.List([pre_conv, blocks] if pre_conv is not None else [blocks]))
        self.down_layers = nnx.List(down_layers)

        # decoder
        n_up = len(blocks_up)
        up_layers, up_samples = [], []
        for i in range(n_up):
            sample_in = init_filters * 2 ** (n_up - i)
            up_layers.append(nnx.List([ResBlock(spatial_dims, sample_in // 2, norm, act=act, rngs=rngs)
                                       for _ in range(blocks_up[i])]))
            up_samples.append(nnx.List([
                _conv(spatial_dims, sample_in, sample_in // 2, kernel_size=1, rngs=rngs),
                UpSample(spatial_dims, sample_in // 2, sample_in // 2, 2, mode=upsample_mode,
                         interp_mode="nearest", pre_conv=None, rngs=rngs),
            ]))
        self.up_layers = nnx.List(up_layers)
        self.up_samples = nnx.List(up_samples)
        if use_conv_final:
            self.norm_final = get_norm_layer(norm, spatial_dims, init_filters, rngs=rngs)
            self.act_final = get_act_layer(act)
            self.conv_final = _conv(spatial_dims, init_filters, out_channels, kernel_size=1, bias=True,
                                    rngs=rngs)

    def encode(self, x):
        x = self.convInit(x)
        if self.dropout is not None:
            x = self.dropout(x)
        down_x = []
        for layer in self.down_layers:
            mods = list(layer)
            if len(mods) == 2:
                x = mods[0](x)
                blocks = mods[1]
            else:
                blocks = mods[0]
            for blk in blocks:
                x = blk(x)
            down_x.append(x)
        return x, down_x

    def decode(self, x, down_x):
        for i, (up, upl) in enumerate(zip(self.up_samples, self.up_layers)):
            mods = list(up)
            x = mods[0](x)
            x = mods[1](x)
            x = x + down_x[i + 1]
            for blk in upl:
                x = blk(x)
        if self.use_conv_final:
            x = self.conv_final(self.act_final(self.norm_final(x)))
        return x

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, perm_in)
        x, down_x = self.encode(x)
        down_x.reverse()
        x = self.decode(x, down_x)
        perm_out = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        return jnp.transpose(x, perm_out)


class SegResNetVAE(SegResNet):
    """SegResNet + VAE regularization branch (reference: segresnet.py:187)."""

    def __init__(self, input_image_size: Sequence[int], vae_estimate_std: bool = False,
                 vae_default_std: float = 0.3, vae_nz: int = 256, spatial_dims: int = 3,
                 init_filters: int = 8, in_channels: int = 1, out_channels: int = 2,
                 dropout_prob: float | None = None, act=("RELU", {"inplace": True}),
                 norm=("GROUP", {"num_groups": 8}), use_conv_final: bool = True,
                 blocks_down: Sequence[int] = (1, 2, 2, 4), blocks_up: Sequence[int] = (1, 1, 1),
                 upsample_mode: str = "nontrainable", *, rngs: nnx.Rngs):
        super().__init__(spatial_dims=spatial_dims, init_filters=init_filters, in_channels=in_channels,
                         out_channels=out_channels, dropout_prob=dropout_prob, act=act, norm=norm,
                         use_conv_final=use_conv_final, blocks_down=blocks_down, blocks_up=blocks_up,
                         upsample_mode=upsample_mode, rngs=rngs)
        self.input_image_size = input_image_size
        self.smallest_filters = 16
        zoom = 2 ** (len(self.blocks_down) - 1)
        self.fc_insize = [s // (2 * zoom) for s in self.input_image_size]
        self.vae_estimate_std = vae_estimate_std
        self.vae_default_std = vae_default_std
        self.vae_nz = vae_nz
        v_filters = self.init_filters * zoom
        total_elements = int(self.smallest_filters * np.prod(self.fc_insize))
        self.vae_down_norm = get_norm_layer(norm, spatial_dims, v_filters, rngs=rngs)
        self.vae_down_act = get_act_layer(act)
        self.vae_down_conv = _conv(spatial_dims, v_filters, self.smallest_filters, stride=2, rngs=rngs)
        self.vae_down_norm2 = get_norm_layer(norm, spatial_dims, self.smallest_filters, rngs=rngs)
        self.vae_fc1 = nnx.Linear(total_elements, vae_nz, rngs=rngs)
        self.vae_fc2 = nnx.Linear(total_elements, vae_nz, rngs=rngs)
        self.vae_fc3 = nnx.Linear(vae_nz, total_elements, rngs=rngs)
        self.vae_fc_up_sample = nnx.List([
            _conv(spatial_dims, self.smallest_filters, v_filters, kernel_size=1, rngs=rngs),
            UpSample(spatial_dims, v_filters, v_filters, 2, mode=upsample_mode, interp_mode="nearest",
                     pre_conv=None, rngs=rngs),
        ])
        self.vae_conv_final = _conv(spatial_dims, self.init_filters, in_channels, kernel_size=1,
                                    bias=True, rngs=rngs)
        self._vae_rngs = rngs

    def _get_vae_loss(self, net_input_cl, vae_input):
        x_vae = self.vae_down_conv(self.vae_down_act(self.vae_down_norm(vae_input)))
        x_vae = self.vae_down_norm2(x_vae)
        x_flat = x_vae.reshape(x_vae.shape[0], -1)
        z_mean = self.vae_fc1(x_flat)
        key = self._vae_rngs.params() if hasattr(self._vae_rngs, "params") else jax.random.PRNGKey(0)
        z_mean_rand = jax.lax.stop_gradient(jax.random.normal(key, z_mean.shape))
        if self.vae_estimate_std:
            z_sigma = jax.nn.softplus(self.vae_fc2(x_flat))
            vae_reg_loss = 0.5 * jnp.mean(z_mean**2 + z_sigma**2 - jnp.log(1e-8 + z_sigma**2) - 1)
            x_vae_z = z_mean + z_sigma * z_mean_rand
        else:
            z_sigma = self.vae_default_std
            vae_reg_loss = jnp.mean(z_mean**2)
            x_vae_z = z_mean + z_sigma * z_mean_rand
        x_vae_d = self.vae_fc3(x_vae_z)
        x_vae_d = jax.nn.relu(x_vae_d)
        x_vae_d = x_vae_d.reshape((x_vae_d.shape[0],) + tuple(self.fc_insize) + (self.smallest_filters,))
        for m in self.vae_fc_up_sample:
            x_vae_d = m(x_vae_d)
        for up, upl in zip(self.up_samples, self.up_layers):
            mods = list(up)
            x_vae_d = mods[1](mods[0](x_vae_d))
            for blk in upl:
                x_vae_d = blk(x_vae_d)
        x_vae_d = self.vae_conv_final(x_vae_d)
        vae_mse_loss = jnp.mean((net_input_cl - x_vae_d) ** 2)
        return vae_reg_loss + vae_mse_loss

    def __call__(self, x):
        perm_in = (0,) + tuple(range(2, x.ndim)) + (1,)
        x_cl = jnp.transpose(x, perm_in)
        net_input = x_cl
        x_enc, down_x = self.encode(x_cl)
        down_x.reverse()
        vae_input = x_enc
        x_out = self.decode(x_enc, down_x)
        perm_out = (0, x_out.ndim - 1) + tuple(range(1, x_out.ndim - 1))
        vae_loss = self._get_vae_loss(net_input, vae_input)
        return jnp.transpose(x_out, perm_out), vae_loss
