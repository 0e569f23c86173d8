"""SwinUNETR: Swin-transformer encoder + UNETR-style decoder.

Parity target: monai/networks/nets/swin_unetr.py:45 (SwinTransformer:919,
WindowAttention:426 with relative position bias, window_partition:333, shifted-window
compute_mask:779, PatchMerging:701).

TPU-first design notes:
- channel-last layout throughout; window partition/reverse are pure reshapes/transposes
  (static shapes — XLA fuses them into the attention kernel's layout);
- cyclic shifts via jnp.roll; the shifted-window attention mask is a host-precomputed
  constant folded into the compiled program;
- attention itself is jnp.einsum + softmax over (num_windows*B, heads, N, N) — N = 7³ is
  tiny, so this maps to dense MXU matmuls, the same trick as block-local ring attention.
"""
from __future__ import annotations

import itertools
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils.misc import ensure_tuple_rep
from ..blocks.attention import MLPBlock, PatchEmbed
from ..blocks.dynunet_block import UnetOutBlock, UnetrBasicBlock, UnetrUpBlock

__all__ = ["SwinUNETR", "SwinTransformer", "WindowAttention", "SwinTransformerBlock",
           "PatchMerging", "PatchMergingV2", "MERGING_MODE", "window_partition",
           "window_reverse", "compute_mask"]


def window_partition(x: jnp.ndarray, window_size: Sequence[int]) -> jnp.ndarray:
    """(B, *spatial, C) → (B*nW, prod(ws), C) (reference: swin_unetr.py:333)."""
    if x.ndim == 5:
        b, d, h, w, c = x.shape
        ws = window_size
        x = x.reshape(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
        windows = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(-1, ws[0] * ws[1] * ws[2], c)
    else:
        b, h, w, c = x.shape
        ws = window_size
        x = x.reshape(b, h // ws[0], ws[0], w // ws[1], ws[1], c)
        windows = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws[0] * ws[1], c)
    return windows


def window_reverse(windows: jnp.ndarray, window_size: Sequence[int], dims: Sequence[int]) -> jnp.ndarray:
    """Inverse of window_partition (reference: swin_unetr.py:—)."""
    if len(dims) == 4:
        b, d, h, w = dims
        ws = window_size
        x = windows.reshape(b, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1], ws[2], -1)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(b, d, h, w, -1)
    else:
        b, h, w = dims
        ws = window_size
        x = windows.reshape(b, h // ws[0], w // ws[1], ws[0], ws[1], -1)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, -1)
    return x


def get_window_size(x_size: Sequence[int], window_size: Sequence[int], shift_size: Sequence[int] | None = None):
    """Clamp window/shift to the input size (reference: swin_unetr.py:—)."""
    use_window_size = list(window_size)
    use_shift_size = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_window_size[i] = x_size[i]
            if use_shift_size is not None:
                use_shift_size[i] = 0
    if shift_size is None:
        return tuple(use_window_size)
    return tuple(use_window_size), tuple(use_shift_size)


def compute_mask(dims: Sequence[int], window_size: Sequence[int], shift_size: Sequence[int]) -> np.ndarray:
    """Attention mask for shifted windows — host-precomputed constant
    (reference: swin_unetr.py:779)."""
    cnt = 0
    if len(dims) == 3:
        d, h, w = dims
        img_mask = np.zeros((1, d, h, w, 1))
        for d_s in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0]), slice(-shift_size[0], None)):
            for h_s in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1]), slice(-shift_size[1], None)):
                for w_s in (slice(-window_size[2]), slice(-window_size[2], -shift_size[2]), slice(-shift_size[2], None)):
                    img_mask[:, d_s, h_s, w_s, :] = cnt
                    cnt += 1
    else:
        h, w = dims
        img_mask = np.zeros((1, h, w, 1))
        for h_s in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0]), slice(-shift_size[0], None)):
            for w_s in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1]), slice(-shift_size[1], None)):
                img_mask[:, h_s, w_s, :] = cnt
                cnt += 1
    # pure-numpy window partition so this stays a host constant under jit tracing
    ws = tuple(window_size)
    if len(dims) == 3:
        b, d, h, w, c = img_mask.shape
        mw = img_mask.reshape(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
        mask_windows = np.transpose(mw, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(-1, ws[0] * ws[1] * ws[2])
    else:
        b, h, w, c = img_mask.shape
        mw = img_mask.reshape(b, h // ws[0], ws[0], w // ws[1], ws[1], c)
        mask_windows = np.transpose(mw, (0, 1, 3, 2, 4, 5)).reshape(-1, ws[0] * ws[1])
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask  # (nW, N, N)


def _rel_pos_index(window_size: Sequence[int]) -> np.ndarray:
    """Relative position index table (host-precomputed)."""
    coords = np.stack(np.meshgrid(*[np.arange(ws) for ws in window_size], indexing="ij"))
    coords_flat = coords.reshape(len(window_size), -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]
    relative = relative.transpose(1, 2, 0)
    for i, ws in enumerate(window_size):
        relative[:, :, i] += ws - 1
    mul = 1
    idx = np.zeros(relative.shape[:2], dtype=np.int64)
    for i in reversed(range(len(window_size))):
        idx += relative[:, :, i] * mul
        mul *= 2 * window_size[i] - 1
    return idx


class WindowAttention(nnx.Module):
    """W-MSA with relative position bias (reference: swin_unetr.py:426)."""

    def __init__(self, dim: int, num_heads: int, window_size: Sequence[int], qkv_bias: bool = False,
                 attn_drop: float = 0.0, proj_drop: float = 0.0, *, rngs: nnx.Rngs):
        self.dim = dim
        self.window_size = tuple(window_size)
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim**-0.5
        n_bias = int(np.prod([2 * ws - 1 for ws in self.window_size]))
        key = rngs.params()
        self.relative_position_bias_table = nnx.Param(
            jax.random.truncated_normal(key, -2.0, 2.0, (n_bias, num_heads)) * 0.02)
        self.relative_position_index = nnx.Variable(jnp.asarray(_rel_pos_index(self.window_size)))
        self.qkv = nnx.Linear(dim, dim * 3, use_bias=qkv_bias, rngs=rngs)
        self.attn_drop = nnx.Dropout(attn_drop, rngs=rngs)
        self.proj = nnx.Linear(dim, dim, rngs=rngs)
        self.proj_drop = nnx.Dropout(proj_drop, rngs=rngs)

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        from ...ops.pallas_window_attention import fused_window_attention, use_pallas_window_attention

        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, c // self.num_heads)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]  # (b, heads, n, d)
        q = q * self.scale
        # slice the index to the runtime token count (windows clamp to small inputs,
        # matching the reference's [:n, :n] behavior, swin_unetr.py:~500)
        idx = self.relative_position_index[...][:n, :n].reshape(-1)
        bias = self.relative_position_bias_table[...][idx]
        bias_hnn = jnp.transpose(bias.reshape(n, n, -1), (2, 0, 1))
        if (use_pallas_window_attention() and self.attn_drop.rate == 0.0
                and (mask is None or b % mask.shape[0] == 0)):
            # fused VMEM-resident scores kernel (ops/pallas_window_attention.py):
            # avoids materializing the (b, heads, n, n) tensor in HBM
            out = fused_window_attention(q, k, v, bias_hnn, mask)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
            attn = attn + bias_hnn[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(b // nw, nw, self.num_heads, n, n) + mask[None, :, None]
                attn = attn.reshape(-1, self.num_heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = self.attn_drop(attn)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        return self.proj_drop(self.proj(out))


class SwinTransformerBlock(nnx.Module):
    """Swin block: (S)W-MSA + MLP (reference: swin_unetr.py:535)."""

    def __init__(self, dim: int, num_heads: int, window_size: Sequence[int], shift_size: Sequence[int],
                 mlp_ratio: float = 4.0, qkv_bias: bool = True, drop: float = 0.0, attn_drop: float = 0.0,
                 drop_path: float = 0.0, *, rngs: nnx.Rngs):
        self.window_size = tuple(window_size)
        self.shift_size = tuple(shift_size)
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.attn = WindowAttention(dim, num_heads, window_size, qkv_bias, attn_drop, drop, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio), drop, act="GELU", rngs=rngs)

    def _attn_part(self, x, mask_matrix):
        spatial = x.shape[1:-1]
        window_size, shift_size = get_window_size(spatial, self.window_size, self.shift_size)
        x = self.norm1(x)
        # pad to multiples of window size
        pads = [(0, 0)]
        for d, ws in zip(spatial, window_size):
            pads.append((0, (ws - d % ws) % ws))
        pads.append((0, 0))
        x = jnp.pad(x, pads)
        dims = (x.shape[0],) + x.shape[1:-1]
        if any(i > 0 for i in shift_size):
            shifted_x = jnp.roll(x, shift=[-s for s in shift_size], axis=tuple(range(1, len(spatial) + 1)))
            attn_mask = mask_matrix
        else:
            shifted_x = x
            attn_mask = None
        x_windows = window_partition(shifted_x, window_size)
        attn_windows = self.attn(x_windows, mask=attn_mask)
        shifted_x = window_reverse(attn_windows, window_size, dims)
        if any(i > 0 for i in shift_size):
            x = jnp.roll(shifted_x, shift=shift_size, axis=tuple(range(1, len(spatial) + 1)))
        else:
            x = shifted_x
        # unpad
        slicer = [slice(None)] + [slice(0, s) for s in spatial] + [slice(None)]
        return x[tuple(slicer)]

    def __call__(self, x, mask_matrix=None):
        x = x + self._attn_part(x, mask_matrix)
        x = x + self.mlp(self.norm2(x))
        return x


class PatchMergingV2(nnx.Module):
    """Merge 2^d neighbors → linear halve (reference: swin_unetr.py:701 PatchMergingV2)."""

    def __init__(self, dim: int, spatial_dims: int = 3, *, rngs: nnx.Rngs):
        self.dim = dim
        self.spatial_dims = spatial_dims
        self.reduction = nnx.Linear(dim * 2**spatial_dims, 2 * dim, use_bias=False, rngs=rngs)
        self.norm = nnx.LayerNorm(dim * 2**spatial_dims, rngs=rngs)

    def _offsets(self, d: int):
        if d == 2:
            # reference quirk (swin_unetr.py:742): `x[:, j::2, i::2] for i, j in
            # product` slices rows by the INNER loop variable, so the 2D channel
            # order is the transpose of the plain product order
            return [(0, 0), (1, 0), (0, 1), (1, 1)]
        return list(itertools.product((0, 1), repeat=d))

    def __call__(self, x):
        spatial = x.shape[1:-1]
        pads = [(0, 0)] + [(0, s % 2) for s in spatial] + [(0, 0)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, pads)
        d = self.spatial_dims
        parts = []
        for offs in self._offsets(d):
            slicer = [slice(None)] + [slice(o, None, 2) for o in offs] + [slice(None)]
            parts.append(x[tuple(slicer)])
        x = jnp.concatenate(parts, axis=-1)
        return self.reduction(self.norm(x))


class PatchMerging(PatchMergingV2):
    """v0.9.0 merge with its historical 3D channel-concat order
    (reference: swin_unetr.py PatchMerging forward: x0..x7 ordering); 2D falls back
    to the V2 order, as in the reference."""

    def _offsets(self, d: int):
        if d != 3:
            return super()._offsets(d)
        return [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)]


MERGING_MODE = {"merging": PatchMerging, "mergingv2": PatchMergingV2}


class BasicLayer(nnx.Module):
    """One Swin stage (reference: swin_unetr.py:—)."""

    def __init__(self, dim: int, depth: int, num_heads: int, window_size: Sequence[int],
                 drop_path, mlp_ratio: float = 4.0, qkv_bias: bool = False, drop: float = 0.0,
                 attn_drop: float = 0.0, downsample=None, spatial_dims: int = 3, *, rngs: nnx.Rngs):
        self.window_size = tuple(window_size)
        self.shift_size = tuple(i // 2 for i in window_size)
        self.no_shift = tuple(0 for _ in window_size)
        self.blocks = nnx.List([
            SwinTransformerBlock(dim, num_heads, self.window_size,
                                 self.no_shift if (i % 2 == 0) else self.shift_size,
                                 mlp_ratio, qkv_bias, drop, attn_drop, rngs=rngs)
            for i in range(depth)
        ])
        self.downsample = downsample(dim=dim, spatial_dims=spatial_dims, rngs=rngs) if downsample else None

    def __call__(self, x):
        spatial = x.shape[1:-1]
        window_size, shift_size = get_window_size(spatial, self.window_size, self.shift_size)
        padded = tuple(int(np.ceil(s / w)) * w for s, w in zip(spatial, window_size))
        attn_mask = jnp.asarray(compute_mask(padded, window_size, shift_size))
        for blk in self.blocks:
            x = blk(x, attn_mask)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class SwinTransformer(nnx.Module):
    """Swin encoder backbone (reference: swin_unetr.py:919). Channel-last in/out."""

    def __init__(self, in_chans: int, embed_dim: int, window_size: Sequence[int],
                 patch_size: Sequence[int], depths: Sequence[int], num_heads: Sequence[int],
                 mlp_ratio: float = 4.0, qkv_bias: bool = True, drop_rate: float = 0.0,
                 attn_drop_rate: float = 0.0, drop_path_rate: float = 0.0, patch_norm: bool = False,
                 spatial_dims: int = 3, downsample="merging", *, rngs: nnx.Rngs):
        downsample = MERGING_MODE[downsample] if isinstance(downsample, str) else downsample
        self.num_layers = len(depths)
        self.embed_dim = embed_dim
        self.window_size = window_size
        self.patch_size = patch_size
        self.patch_embed = PatchEmbed(patch_size, in_chans, embed_dim, patch_norm, spatial_dims, rngs=rngs)
        self.pos_drop = nnx.Dropout(drop_rate, rngs=rngs)
        layers = []
        for i_layer in range(self.num_layers):
            layers.append(BasicLayer(int(embed_dim * 2**i_layer), depths[i_layer], num_heads[i_layer],
                                     window_size, None, mlp_ratio, qkv_bias, drop_rate, attn_drop_rate,
                                     downsample=downsample, spatial_dims=spatial_dims, rngs=rngs))
        self.layers = nnx.List(layers)

    @staticmethod
    def _proj_out(x, normalize: bool):
        """Parameter-free channel layer-norm of a hidden state (reference:
        swin_unetr.py:1040 proj_out — F.layer_norm over the channel axis). The
        normalized copy goes to the decoder; the raw tensor feeds the next stage."""
        if not normalize:
            return x
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)

    def __call__(self, x, normalize: bool = True):
        x0 = self.patch_embed(x)
        x0 = self.pos_drop(x0)
        outs = [self._proj_out(x0, normalize)]
        cur = x0
        for layer in self.layers:
            cur = layer(cur)
            outs.append(self._proj_out(cur, normalize))
        return outs  # [x0_out, x1_out, x2_out, x3_out, x4_out]


class SwinUNETR(nnx.Module):
    """Swin encoder + conv decoder (reference: swin_unetr.py:45)."""

    def __init__(self, in_channels: int = 1, out_channels: int = 2, img_size=None,
                 depths: Sequence[int] = (2, 2, 2, 2), num_heads: Sequence[int] = (3, 6, 12, 24),
                 feature_size: int = 24, norm_name=("instance", {"affine": True}),
                 drop_rate: float = 0.0, attn_drop_rate: float = 0.0, dropout_path_rate: float = 0.0,
                 normalize: bool = True, use_checkpoint: bool = False, spatial_dims: int = 3,
                 downsample="merging", use_v2: bool = False, window_size: Sequence[int] | int = 7,
                 patch_size: Sequence[int] | int = 2, *, rngs: nnx.Rngs):
        if feature_size % 12 != 0:
            raise ValueError("feature_size should be divisible by 12.")
        window_size_ = ensure_tuple_rep(window_size, spatial_dims)
        patch_size_ = ensure_tuple_rep(patch_size, spatial_dims)
        self.normalize = normalize
        self.swinViT = SwinTransformer(in_channels, feature_size, window_size_, patch_size_, depths,
                                       num_heads, drop_rate=drop_rate, attn_drop_rate=attn_drop_rate,
                                       drop_path_rate=dropout_path_rate, spatial_dims=spatial_dims,
                                       downsample=downsample, rngs=rngs)
        self.encoder1 = UnetrBasicBlock(spatial_dims, in_channels, feature_size, 3, 1, norm_name, True,
                                        rngs=rngs)
        self.encoder2 = UnetrBasicBlock(spatial_dims, feature_size, feature_size, 3, 1, norm_name, True,
                                        rngs=rngs)
        self.encoder3 = UnetrBasicBlock(spatial_dims, 2 * feature_size, 2 * feature_size, 3, 1,
                                        norm_name, True, rngs=rngs)
        self.encoder4 = UnetrBasicBlock(spatial_dims, 4 * feature_size, 4 * feature_size, 3, 1,
                                        norm_name, True, rngs=rngs)
        self.encoder10 = UnetrBasicBlock(spatial_dims, 16 * feature_size, 16 * feature_size, 3, 1,
                                         norm_name, True, rngs=rngs)
        self.decoder5 = UnetrUpBlock(spatial_dims, 16 * feature_size, 8 * feature_size, 3, 2,
                                     norm_name, True, rngs=rngs)
        self.decoder4 = UnetrUpBlock(spatial_dims, 8 * feature_size, 4 * feature_size, 3, 2,
                                     norm_name, True, rngs=rngs)
        self.decoder3 = UnetrUpBlock(spatial_dims, 4 * feature_size, 2 * feature_size, 3, 2,
                                     norm_name, True, rngs=rngs)
        self.decoder2 = UnetrUpBlock(spatial_dims, 2 * feature_size, feature_size, 3, 2,
                                     norm_name, True, rngs=rngs)
        self.decoder1 = UnetrUpBlock(spatial_dims, feature_size, feature_size, 3, 2,
                                     norm_name, True, rngs=rngs)
        self.out = UnetOutBlock(spatial_dims, feature_size, out_channels, rngs=rngs)

    def __call__(self, x_in):
        perm_in = (0,) + tuple(range(2, x_in.ndim)) + (1,)
        x_cl = jnp.transpose(x_in, perm_in)
        hidden = self.swinViT(x_cl, self.normalize)
        enc0 = self.encoder1(x_cl)
        enc1 = self.encoder2(hidden[0])
        enc2 = self.encoder3(hidden[1])
        enc3 = self.encoder4(hidden[2])
        dec4 = self.encoder10(hidden[4])
        dec3 = self.decoder5(dec4, hidden[3])
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        dec0 = self.decoder2(dec1, enc1)
        out = self.decoder1(dec0, enc0)
        logits = self.out(out)
        perm_out = (0, logits.ndim - 1) + tuple(range(1, logits.ndim - 1))
        return jnp.transpose(logits, perm_out)


def filter_swinunetr(key, value):
    """Key filter for the public Disruptive-Autoencoders SSL pretrained weights
    (arXiv:2307.16896): maps ``encoder.*`` entries onto ``swinViT.*`` and drops
    decoder/mask-token entries. Use with ``copy_model_state`` (reference:
    swin_unetr.py:1078)."""
    if key in [
        "encoder.mask_token",
        "encoder.norm.weight",
        "encoder.norm.bias",
        "out.conv.conv.weight",
        "out.conv.conv.bias",
    ]:
        return None
    if key[:8] == "encoder.":
        if key[8:19] == "patch_embed":
            new_key = "swinViT." + key[8:]
        else:
            new_key = "swinViT." + key[8:18] + key[20:]
        return new_key, value
    return None
