"""fastMRI reconstruction networks (reference: monai/apps/reconstruction/networks/
nets/complex_unet.py ComplexUnet, coil_sensitivity_model.py:29 CoilSensitivityModel,
varnet.py:25 VariationalNetworkModel)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...data.fft_utils import fftn_centered, ifftn_centered
from ...networks.nets.basic_unet import BasicUNet
from .complex_utils import complex_abs, complex_conj, complex_mul
from .mri_utils import root_sum_of_squares

__all__ = ["ComplexUnet", "CoilSensitivityModel", "VariationalNetworkModel"]


def _complex_to_chans(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, *spatial, 2) → (B, 2C, *spatial)."""
    moved = jnp.moveaxis(x, -1, 2)
    return moved.reshape(x.shape[0], -1, *x.shape[2:-1])


def _chans_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2C, *spatial) → (B, C, *spatial, 2)."""
    b, c2 = x.shape[:2]
    reshaped = x.reshape(b, c2 // 2, 2, *x.shape[2:])
    return jnp.moveaxis(reshaped, 2, -1)


class ComplexUnet(nnx.Module):
    """UNet over stacked-complex data with normalization + padding
    (reference: complex_unet.py ComplexUnet)."""

    def __init__(self, spatial_dims: int = 2, features: Sequence[int] = (32, 32, 64, 128, 256, 32),
                 act=("LeakyReLU", {"negative_slope": 0.1}), norm=("instance", {"affine": True}),
                 bias: bool = True, dropout: float = 0.0, upsample: str = "deconv",
                 pad_factor: int = 16, conv_net=None, *, rngs: nnx.Rngs):
        self.pad_factor = pad_factor
        self.unet = conv_net if conv_net is not None else BasicUNet(
            spatial_dims=spatial_dims, in_channels=2, out_channels=2, features=features, act=act,
            norm=norm, bias=bias, dropout=dropout, upsample=upsample, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, C=1, *spatial, 2) stacked-complex image."""
        h = _complex_to_chans(x)
        # normalize
        mean = h.mean(axis=tuple(range(1, h.ndim)), keepdims=True)
        std = h.std(axis=tuple(range(1, h.ndim)), keepdims=True) + 1e-6
        h = (h - mean) / std
        # pad to factor
        spatial = h.shape[2:]
        pads = [(0, 0), (0, 0)] + [(0, (-s) % self.pad_factor) for s in spatial]
        if any(p[1] for p in pads):
            h = jnp.pad(h, pads)
        h = self.unet(h)
        slicer = [slice(None), slice(None)] + [slice(0, s) for s in spatial]
        h = h[tuple(slicer)]
        h = h * std + mean
        return _chans_to_complex(h)


class CoilSensitivityModel(nnx.Module):
    """Estimate coil sensitivity maps from the ACS region
    (reference: coil_sensitivity_model.py:29)."""

    def __init__(self, spatial_dims: int = 2, features: Sequence[int] = (8, 16, 32, 64, 128, 8),
                 coil_dim: int = 1, conv_net=None, *, rngs: nnx.Rngs):
        self.coil_dim = coil_dim
        self.norm_unet = ComplexUnet(spatial_dims=spatial_dims, features=features, rngs=rngs)
        self.spatial_dims = spatial_dims

    def get_fully_sampled_region(self, mask: jnp.ndarray) -> tuple[int, int]:
        """Extent of the auto-calibration region (reference: coil_sensitivity_model.py)."""
        import numpy as np

        mask_np = np.asarray(mask).squeeze()
        center = mask_np.shape[-1] // 2
        left = center
        while left > 0 and mask_np.reshape(-1, mask_np.shape[-1])[0, left - 1]:
            left -= 1
        right = center
        n = mask_np.shape[-1]
        flat = mask_np.reshape(-1, n)[0]
        while right < n - 1 and flat[right + 1]:
            right += 1
        return left, right - left + 1

    def __call__(self, masked_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """masked_kspace: (B, coils, *spatial, 2); mask broadcastable to kspace."""
        import numpy as np

        # ACS-masked kspace → image space per coil
        left, num_low = self.get_fully_sampled_region(mask)
        acs_mask = np.zeros(masked_kspace.shape[-2], dtype=np.float32)
        acs_mask[left:left + num_low] = 1
        acs_kspace = masked_kspace * jnp.asarray(acs_mask)[None, None, None, :, None]
        coil_imgs = ifftn_centered(acs_kspace, spatial_dims=self.spatial_dims)
        b, c = coil_imgs.shape[:2]
        flat = coil_imgs.reshape((b * c, 1) + coil_imgs.shape[2:])
        refined = jax.vmap(lambda v: self.norm_unet(v[None])[0])(flat)
        refined = refined.reshape(coil_imgs.shape)
        # normalize by RSS over coils
        rss = root_sum_of_squares(complex_abs(refined), spatial_dim=self.coil_dim)
        rss = jnp.expand_dims(jnp.expand_dims(rss, self.coil_dim), -1)
        return refined / jnp.maximum(rss, 1e-8)


class VariationalNetworkModel(nnx.Module):
    """End-to-end variational network (reference: varnet.py:25)."""

    def __init__(self, coil_sensitivity_model: CoilSensitivityModel, refinement_model: ComplexUnet,
                 num_cascades: int = 12, spatial_dims: int = 2, *, rngs: nnx.Rngs):
        self.coil_sensitivity_model = coil_sensitivity_model
        self.spatial_dims = spatial_dims
        self.cascades = nnx.List([_VarNetBlock(refinement_model.__class__(
            spatial_dims=spatial_dims, rngs=rngs), spatial_dims, rngs=rngs)
            for _ in range(num_cascades)])

    def __call__(self, masked_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        sens_maps = self.coil_sensitivity_model(masked_kspace, mask)
        kspace_pred = masked_kspace
        for cascade in self.cascades:
            kspace_pred = cascade(kspace_pred, masked_kspace, mask, sens_maps)
        img = ifftn_centered(kspace_pred, spatial_dims=self.spatial_dims)
        return root_sum_of_squares(complex_abs(img), spatial_dim=1)


class _VarNetBlock(nnx.Module):
    """One unrolled gradient-descent cascade (reference: varnet_block.py)."""

    def __init__(self, model: ComplexUnet, spatial_dims: int = 2, *, rngs: nnx.Rngs):
        self.model = model
        self.spatial_dims = spatial_dims
        self.dc_weight = nnx.Param(jnp.ones((1,)))

    def soft_dc(self, x, ref_kspace, mask):
        return jnp.where(mask[..., None] if mask.ndim == x.ndim - 1 else mask,
                         x - ref_kspace, 0) * self.dc_weight[...]

    def __call__(self, current_kspace, ref_kspace, mask, sens_maps):
        # reduce over coils: image = sum_c conj(S_c) * F^-1 k_c
        coil_imgs = ifftn_centered(current_kspace, spatial_dims=self.spatial_dims)
        combined = complex_mul(coil_imgs, complex_conj(sens_maps)).sum(axis=1, keepdims=True)
        refined = self.model(combined)
        # expand: k_c = F (S_c * image)
        expanded = complex_mul(refined, sens_maps)
        model_term = fftn_centered(expanded, spatial_dims=self.spatial_dims)
        dc = self.soft_dc(current_kspace, ref_kspace, mask)
        return current_kspace - dc - model_term
