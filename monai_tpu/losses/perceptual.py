"""Perceptual loss (reference: monai/losses/perceptual.py PerceptualLoss).

The reference downloads pretrained LPIPS/torchvision/MedicalNet feature extractors;
this environment is zero-egress, so pretrained backbones cannot be fetched. This
implementation therefore requires an explicit ``feature_network`` — any callable
mapping (B, C, *spatial) -> feature array or list of feature arrays (e.g. an
EfficientNetBNFeatures or SegResNetDS encoder trained in-framework). Without one,
construction raises a clear error rather than silently computing garbage.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence

import jax.numpy as jnp

__all__ = ["PerceptualLoss"]


class PerceptualLoss:
    """Feature-space L2 distance averaged over layers (reference: perceptual.py)."""

    def __init__(self, spatial_dims: int = 2, network_type: str = "custom",
                 is_fake_3d: bool = True, fake_3d_ratio: float = 0.5,
                 feature_network: Callable | None = None, pretrained: bool = True,
                 pretrained_path=None, pretrained_state_dict_key=None,
                 channel_wise: bool = False):
        if feature_network is None:
            raise ValueError(
                "PerceptualLoss requires an explicit `feature_network` callable in this "
                "environment: pretrained LPIPS/torchvision backbones cannot be downloaded "
                "(zero egress). Pass e.g. a trained EfficientNetBNFeatures instance.")
        self.spatial_dims = spatial_dims
        self.feature_network = feature_network
        self.is_fake_3d = is_fake_3d and spatial_dims == 3
        self.fake_3d_ratio = fake_3d_ratio
        self.channel_wise = channel_wise

    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        out = self.feature_network(x)
        return list(out) if isinstance(out, (list, tuple)) else [out]

    def _loss_2d(self, inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        f_in = self._features(inputs)
        f_tg = self._features(targets)
        losses = []
        for a, b in zip(f_in, f_tg):
            a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
            losses.append(((a - b) ** 2).mean())
        return jnp.mean(jnp.stack(losses))

    def _fake_3d(self, inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        """2.5D: average the 2D perceptual loss over slices along each axis
        (reference: perceptual.py _calculate_axis_loss)."""
        losses = []
        for axis in range(2, 5):
            n = inputs.shape[axis]
            step = max(int(1 / self.fake_3d_ratio), 1)
            idx = list(range(0, n, step))
            sl_in = jnp.take(inputs, jnp.asarray(idx), axis=axis)
            sl_tg = jnp.take(targets, jnp.asarray(idx), axis=axis)
            sl_in = jnp.moveaxis(sl_in, axis, 2)
            sl_tg = jnp.moveaxis(sl_tg, axis, 2)
            b, c, k = sl_in.shape[:3]
            flat_in = jnp.moveaxis(sl_in, 2, 0).reshape((k * b, c) + sl_in.shape[3:])
            flat_tg = jnp.moveaxis(sl_tg, 2, 0).reshape((k * b, c) + sl_tg.shape[3:])
            losses.append(self._loss_2d(flat_in, flat_tg))
        return jnp.mean(jnp.stack(losses))

    def __call__(self, inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        if inputs.shape != targets.shape:
            raise ValueError(f"shape mismatch: {inputs.shape} vs {targets.shape}")
        if self.spatial_dims == 3 and self.is_fake_3d:
            return self._fake_3d(inputs, targets)
        return self._loss_2d(inputs, targets)


class PercetualNetworkType:
    """Supported perceptual backbones (reference: perceptual.py:26; name typo kept
    for API parity)."""
    alex = "alex"
    vgg = "vgg"
    squeeze = "squeeze"
    radimagenet_resnet50 = "radimagenet_resnet50"
    medicalnet_resnet10_23datasets = "medicalnet_resnet10_23datasets"
    medicalnet_resnet50_23datasets = "medicalnet_resnet50_23datasets"


def spatial_average_3d(x, keepdim: bool = True):
    """(reference: perceptual.py:270)"""
    return x.mean(axis=(2, 3, 4), keepdims=keepdim)


def spatial_average(x, keepdim: bool = True):
    """(reference: perceptual.py:419)"""
    return x.mean(axis=(2, 3), keepdims=keepdim)


def normalize_tensor(x, eps: float = 1e-10):
    """Unit-norm over the channel axis (reference: perceptual.py:274)."""
    norm_factor = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (norm_factor + eps)


def medicalnet_intensity_normalisation(volume):
    """Z-score over the whole volume (reference: perceptual.py:279)."""
    return (volume - volume.mean()) / volume.std()


def torchvision_zscore_norm(x):
    """ImageNet z-score per RGB channel (reference: perceptual.py:423)."""
    mean = jnp.asarray([0.485, 0.456, 0.406]).reshape(1, 3, 1, 1)
    std = jnp.asarray([0.229, 0.224, 0.225]).reshape(1, 3, 1, 1)
    return (x - mean) / std


def subtract_mean(x):
    """Subtract BGR-ordered ImageNet mean (reference: perceptual.py:432)."""
    mean = jnp.asarray([0.406, 0.456, 0.485]).reshape(1, 3, 1, 1)
    return x - mean


def _pretrained_unavailable(name: str):
    raise RuntimeError(
        f"{name} requires downloading pretrained torch weights, which this "
        "zero-egress TPU environment cannot do. Pass an explicit "
        "`feature_network` callable to PerceptualLoss instead.")


class MedicalNetPerceptualSimilarity:
    """Gated: needs MedicalNet pretrained weights (reference: perceptual.py)."""

    def __init__(self, *args, **kwargs):
        _pretrained_unavailable("MedicalNetPerceptualSimilarity")


class RadImageNetPerceptualSimilarity:
    """Gated: needs RadImageNet pretrained weights (reference: perceptual.py)."""

    def __init__(self, *args, **kwargs):
        _pretrained_unavailable("RadImageNetPerceptualSimilarity")


class TorchvisionModelPerceptualSimilarity:
    """Gated: needs torchvision pretrained weights (reference: perceptual.py)."""

    def __init__(self, *args, **kwargs):
        _pretrained_unavailable("TorchvisionModelPerceptualSimilarity")
