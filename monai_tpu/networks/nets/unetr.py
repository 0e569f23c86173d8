"""UNETR (reference: monai/networks/nets/unetr.py:24)."""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.dynunet_block import UnetOutBlock, UnetrBasicBlock, UnetrPrUpBlock, UnetrUpBlock
from .vit import ViT

__all__ = ["UNETR"]


class UNETR(nnx.Module):
    """Transformer encoder + conv decoder segmentation (reference: unetr.py:24)."""

    def __init__(self, in_channels: int, out_channels: int, img_size: Sequence[int] | int,
                 feature_size: int = 16, hidden_size: int = 768, mlp_dim: int = 3072,
                 num_heads: int = 12, proj_type: str = "conv", norm_name=("instance", {"affine": True}),
                 conv_block: bool = True, res_block: bool = True, dropout_rate: float = 0.0,
                 spatial_dims: int = 3, qkv_bias: bool = False, save_attn: bool = False,
                 *, rngs: nnx.Rngs):
        if not (0 <= dropout_rate <= 1):
            raise ValueError("dropout_rate should be between 0 and 1.")
        if hidden_size % num_heads != 0:
            raise ValueError("hidden_size should be divisible by num_heads.")
        self.num_layers = 12
        img_size_ = ensure_tuple_rep(img_size, spatial_dims)
        self.patch_size = ensure_tuple_rep(16, spatial_dims)
        self.feat_size = tuple(im // p for im, p in zip(img_size_, self.patch_size))
        self.hidden_size = hidden_size
        self.spatial_dims = spatial_dims
        self.vit = ViT(in_channels, img_size_, self.patch_size, hidden_size, mlp_dim, self.num_layers,
                       num_heads, proj_type, "learnable", False, dropout_rate=dropout_rate,
                       spatial_dims=spatial_dims, qkv_bias=qkv_bias, save_attn=save_attn, rngs=rngs)
        self.encoder1 = UnetrBasicBlock(spatial_dims, in_channels, feature_size, 3, 1, norm_name,
                                        res_block, rngs=rngs)
        self.encoder2 = UnetrPrUpBlock(spatial_dims, hidden_size, feature_size * 2, num_layer=2,
                                       norm_name=norm_name, conv_block=conv_block, res_block=res_block,
                                       rngs=rngs)
        self.encoder3 = UnetrPrUpBlock(spatial_dims, hidden_size, feature_size * 4, num_layer=1,
                                       norm_name=norm_name, conv_block=conv_block, res_block=res_block,
                                       rngs=rngs)
        self.encoder4 = UnetrPrUpBlock(spatial_dims, hidden_size, feature_size * 8, num_layer=0,
                                       norm_name=norm_name, conv_block=conv_block, res_block=res_block,
                                       rngs=rngs)
        self.decoder5 = UnetrUpBlock(spatial_dims, hidden_size, feature_size * 8, 3, 2, norm_name,
                                     res_block, rngs=rngs)
        self.decoder4 = UnetrUpBlock(spatial_dims, feature_size * 8, feature_size * 4, 3, 2, norm_name,
                                     res_block, rngs=rngs)
        self.decoder3 = UnetrUpBlock(spatial_dims, feature_size * 4, feature_size * 2, 3, 2, norm_name,
                                     res_block, rngs=rngs)
        self.decoder2 = UnetrUpBlock(spatial_dims, feature_size * 2, feature_size, 3, 2, norm_name,
                                     res_block, rngs=rngs)
        self.out = UnetOutBlock(spatial_dims, feature_size, out_channels, rngs=rngs)

    def proj_feat(self, x):
        """(B, N, hidden) → (B, *feat_size, hidden) channel-last feature map."""
        return x.reshape((x.shape[0],) + self.feat_size + (self.hidden_size,))

    def __call__(self, x_in):
        # channel-first input → channel-last internal
        perm_in = (0,) + tuple(range(2, x_in.ndim)) + (1,)
        x_cl = jnp.transpose(x_in, perm_in)
        x, hidden_states_out = self.vit(x_in)
        enc1 = self.encoder1(x_cl)
        x2 = hidden_states_out[3]
        enc2 = self.encoder2(self.proj_feat(x2))
        x3 = hidden_states_out[6]
        enc3 = self.encoder3(self.proj_feat(x3))
        x4 = hidden_states_out[9]
        enc4 = self.encoder4(self.proj_feat(x4))
        dec4 = self.proj_feat(x)
        dec3 = self.decoder5(dec4, enc4)
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        out = self.decoder2(dec1, enc1)
        logits = self.out(out)
        perm_out = (0, logits.ndim - 1) + tuple(range(1, logits.ndim - 1))
        return jnp.transpose(logits, perm_out)
