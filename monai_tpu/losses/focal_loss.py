"""Focal loss (reference: monai/losses/focal_loss.py:26)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

from ..networks.utils import one_hot
from ..utils.enums import LossReduction
from ..utils.module import look_up_option

__all__ = ["FocalLoss", "softmax_focal_loss", "sigmoid_focal_loss"]


def softmax_focal_loss(input: jnp.ndarray, target: jnp.ndarray, gamma: float = 2.0,
                       alpha: float | None = None) -> jnp.ndarray:
    """FL(pt) = -alpha * (1 - pt)^gamma * log(pt) with softmax pt
    (reference: focal_loss.py:—)."""
    input_ls = jax.nn.log_softmax(input, axis=1)
    loss = -(1 - jnp.exp(input_ls)) ** gamma * input_ls * target
    if alpha is not None:
        # alpha for class 0 is 1-alpha, rest alpha (reference behavior)
        n_ch = input.shape[1]
        alpha_fac = jnp.asarray([1 - alpha] + [alpha] * (n_ch - 1), dtype=input.dtype)
        broadcast_dims = [1, -1] + [1] * (input.ndim - 2)
        alpha_fac = alpha_fac.reshape([1, n_ch] + [1] * (input.ndim - 2))
        loss = alpha_fac * loss
    return loss


def sigmoid_focal_loss(input: jnp.ndarray, target: jnp.ndarray, gamma: float = 2.0,
                       alpha: float | None = None) -> jnp.ndarray:
    """FL with sigmoid pt per channel."""
    # stable BCE-with-logits
    loss_bce = jnp.maximum(input, 0) - input * target + jax.nn.softplus(-jnp.abs(input))
    invprobs = jax.nn.log_sigmoid(-input * (target * 2 - 1))  # log(1 - pt)
    loss = jnp.exp(invprobs * gamma) * loss_bce
    if alpha is not None:
        alpha_factor = target * alpha + (1 - target) * (1 - alpha)
        loss = alpha_factor * loss
    return loss


class FocalLoss:
    """Focal loss for (B, C, *spatial) logits (reference: focal_loss.py:26)."""

    def __init__(self, include_background: bool = True, to_onehot_y: bool = False, gamma: float = 2.0,
                 alpha: float | None = None, weight: Sequence[float] | float | None = None,
                 reduction: str = LossReduction.MEAN, use_softmax: bool = False):
        self.include_background = include_background
        self.to_onehot_y = to_onehot_y
        self.gamma = gamma
        self.alpha = alpha
        self.weight = weight
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.use_softmax = use_softmax

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        n_pred_ch = input.shape[1]
        if self.to_onehot_y and n_pred_ch != 1:
            target = one_hot(target, num_classes=n_pred_ch, dim=1)
        if not self.include_background and n_pred_ch != 1:
            target = target[:, 1:]
            input = input[:, 1:]
        if target.shape != input.shape:
            raise ValueError(f"ground truth has different shape ({target.shape}) from input ({input.shape})")
        target = target.astype(input.dtype)
        if self.use_softmax:
            loss = softmax_focal_loss(input, target, self.gamma, self.alpha)
        else:
            loss = sigmoid_focal_loss(input, target, self.gamma, self.alpha)
        if self.weight is not None:
            n_ch = input.shape[1]
            w = jnp.asarray(self.weight, dtype=input.dtype)
            if w.ndim == 0:
                w = jnp.full((n_ch,), w)
            w = w.reshape([1, n_ch] + [1] * (input.ndim - 2))
            loss = loss * w
        r = str(self.reduction)
        if r == "mean":
            return jnp.mean(loss)
        if r == "sum":
            return jnp.sum(loss)
        return loss
