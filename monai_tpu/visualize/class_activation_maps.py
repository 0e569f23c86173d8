"""Class activation maps (reference: monai/visualize/class_activation_maps.py:218 CAM,
:319 GradCAM, :387 GradCAM++).

JAX redesign: instead of forward/backward hooks (torch's ModelWithHooks :50), the user
provides ``feature_fn`` (input → feature maps) and ``head_fn`` (feature maps → logits);
gradients come from jax.grad through head_fn — pure and jit-friendly.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CAM", "GradCAM", "GradCAMpp", "default_normalizer"]


def default_normalizer(x) -> np.ndarray:
    """Rescale each channel to [1, 0] (reference: class_activation_maps.py:36)."""
    x = np.asarray(x)
    flat = x.reshape(x.shape[0], -1)
    mn = flat.min(axis=1).reshape((-1,) + (1,) * (x.ndim - 1))
    mx = flat.max(axis=1).reshape((-1,) + (1,) * (x.ndim - 1))
    scale = np.where(mx - mn > 0, mx - mn, 1)
    return (1.0 - (x - mn) / scale).astype(np.float32)


class _CAMBase:
    def __init__(self, feature_fn: Callable, head_fn: Callable, upsampler=None,
                 postprocessing: Callable = default_normalizer):
        self.feature_fn = feature_fn
        self.head_fn = head_fn
        self.postprocessing = postprocessing
        self.upsampler = upsampler

    def _upsample(self, acti_map, spatial_size):
        if self.upsampler is not None:
            return self.upsampler(acti_map, spatial_size)
        out_shape = acti_map.shape[:2] + tuple(spatial_size)
        return jax.image.resize(acti_map, out_shape, method="linear")


CAMBase = _CAMBase  # public alias (reference: class_activation_maps.py CAMBase)


class CAM(_CAMBase):
    """Class activation map using the classifier weights (reference: :218).

    ``head_fn`` must be the final linear head applied per spatial location
    (fc_layers in the reference)."""

    def __call__(self, x, class_idx: int | None = None, layer_idx: int = -1, spatial_size=None):
        feats = self.feature_fn(x)  # (B, C, *spatial)
        b, c = feats.shape[:2]
        spatial = feats.shape[2:]
        flat = jnp.moveaxis(feats.reshape(b, c, -1), 1, 2)  # (B, N, C)
        logits = jax.vmap(lambda f: jax.vmap(self.head_fn)(f))(flat)  # (B, N, classes)
        if class_idx is None:
            mean_logits = logits.mean(axis=1)
            class_idx = jnp.argmax(mean_logits, axis=1)
        idx = jnp.broadcast_to(jnp.asarray(class_idx).reshape(-1, 1, 1), (b, 1, 1))
        acti_map = jnp.take_along_axis(
            logits, jnp.broadcast_to(idx, (b, logits.shape[1], 1)), axis=2)[..., 0]
        acti_map = acti_map.reshape((b, 1) + spatial)
        acti_map = self._upsample(acti_map, spatial_size or x.shape[2:])
        return self.postprocessing(np.asarray(acti_map))


class GradCAM(_CAMBase):
    """Gradient-weighted CAM (reference: :319)."""

    def _grads_and_acti(self, x, class_idx):
        feats = self.feature_fn(x)

        def score(f):
            logits = self.head_fn(f)
            if class_idx is None:
                idx = jnp.argmax(logits, axis=-1)
            else:
                idx = jnp.full(logits.shape[:1], class_idx)
            return jnp.take_along_axis(logits, idx[:, None], axis=1).sum()

        grads = jax.grad(score)(feats)
        return feats, grads

    def compute_map(self, x, class_idx=None, layer_idx: int = -1):
        acti, grad = self._grads_and_acti(x, class_idx)
        axes = tuple(range(2, acti.ndim))
        weights = grad.mean(axis=axes, keepdims=True)
        acti_map = jax.nn.relu((weights * acti).sum(axis=1, keepdims=True))
        return acti_map

    def __call__(self, x, class_idx: int | None = None, layer_idx: int = -1, spatial_size=None):
        acti_map = self.compute_map(x, class_idx, layer_idx)
        acti_map = self._upsample(acti_map, spatial_size or x.shape[2:])
        return self.postprocessing(np.asarray(acti_map))


class GradCAMpp(GradCAM):
    """GradCAM++ (reference: :387)."""

    def compute_map(self, x, class_idx=None, layer_idx: int = -1):
        acti, grad = self._grads_and_acti(x, class_idx)
        axes = tuple(range(2, acti.ndim))
        alpha_nr = grad**2
        alpha_dr = 2 * grad**2 + (acti * grad**3).sum(axis=axes, keepdims=True)
        alpha = alpha_nr / (jnp.where(alpha_dr != 0, alpha_dr, 1.0))
        relu_grad = jax.nn.relu(grad)
        weights = (alpha * relu_grad).sum(axis=axes, keepdims=True)
        acti_map = jax.nn.relu((weights * acti).sum(axis=1, keepdims=True))
        return acti_map


class ModelWithHooks:
    """Functional analog of the reference's forward/backward-hook wrapper
    (reference: visualize/class_activation_maps.py ModelWithHooks).

    jax has no module hooks; intermediate features are obtained by splitting the model
    into a feature function and a head function. This wrapper adapts (feature_fn,
    head_fn) pairs to the hook-style API: calling it returns (logits, features).
    """

    def __init__(self, nn_module=None, target_layer_names=(), register_forward: bool = False,
                 register_backward: bool = False, feature_fn=None, head_fn=None):
        if feature_fn is None or head_fn is None:
            if hasattr(nn_module, "feature_fn") and hasattr(nn_module, "head_fn"):
                feature_fn, head_fn = nn_module.feature_fn, nn_module.head_fn
            else:
                raise ValueError(
                    "ModelWithHooks requires feature_fn/head_fn callables (jax has no "
                    "module hooks); pass them explicitly or provide a model exposing them.")
        self.feature_fn = feature_fn
        self.head_fn = head_fn

    def __call__(self, x, class_idx=None, retain_graph=False):
        feats = self.feature_fn(x)
        logits = self.head_fn(feats)
        return logits, feats


def default_upsampler(spatial_size, align_corners: bool = False):
    """Linear-interpolation upsampler factory used by CAM (reference:
    visualize/visualizer.py default_upsampler)."""
    import jax
    import jax.numpy as jnp

    def up(x):
        x = jnp.asarray(x)
        out_shape = tuple(x.shape[:2]) + tuple(spatial_size)
        return jax.image.resize(x, out_shape, method="linear")

    return up
