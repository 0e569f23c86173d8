"""Dice-family losses.

Parity targets: monai/losses/dice.py (DiceLoss:31, MaskedDiceLoss:—, GeneralizedDiceLoss:—,
GeneralizedWassersteinDiceLoss:—, DiceCELoss:650, DiceFocalLoss:—,
GeneralizedDiceFocalLoss:947).

Pure functions of (input, target) returning jnp scalars — fully jit/grad compatible; on
TPU the reductions fuse with the network's final layers.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..networks.utils import one_hot
from ..utils.enums import LossReduction, Weight
from ..utils.module import look_up_option
from .focal_loss import FocalLoss

__all__ = ["DiceLoss", "MaskedDiceLoss", "GeneralizedDiceLoss", "GeneralizedWassersteinDiceLoss",
           "DiceCELoss", "DiceFocalLoss", "GeneralizedDiceFocalLoss", "Dice", "dice_ce", "dice_focal"]


def _reduce(f: jnp.ndarray, reduction: str) -> jnp.ndarray:
    r = str(reduction)
    if r == "mean":
        return jnp.mean(f)
    if r == "sum":
        return jnp.sum(f)
    return f


class DiceLoss:
    """Soft Dice loss (reference: monai/losses/dice.py:31).

    input: (B, C, *spatial) logits or probabilities; target: (B, C, *spatial) or
    (B, 1, *spatial) labels.
    """

    def __init__(self, include_background: bool = True, to_onehot_y: bool = False,
                 sigmoid: bool = False, softmax: bool = False, other_act: Callable | None = None,
                 squared_pred: bool = False, jaccard: bool = False, reduction: str = LossReduction.MEAN,
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5, batch: bool = False,
                 weight: Sequence[float] | float | None = None, soft_label: bool = False):
        if int(sigmoid) + int(softmax) + int(other_act is not None) > 1:
            raise ValueError("Incompatible values: more than 1 of [sigmoid=True, softmax=True, other_act].")
        self.include_background = include_background
        self.to_onehot_y = to_onehot_y
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.other_act = other_act
        self.squared_pred = squared_pred
        self.jaccard = jaccard
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.smooth_nr = float(smooth_nr)
        self.smooth_dr = float(smooth_dr)
        self.batch = batch
        self.weight = weight

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        input = jnp.asarray(input)
        target = jnp.asarray(target)
        if self.sigmoid:
            input = jax.nn.sigmoid(input)
        n_pred_ch = input.shape[1]
        if self.softmax:
            if n_pred_ch != 1:
                input = jax.nn.softmax(input, axis=1)
        if self.other_act is not None:
            input = self.other_act(input)
        if self.to_onehot_y and n_pred_ch != 1:
            target = one_hot(target, num_classes=n_pred_ch, dim=1)
        if not self.include_background and n_pred_ch != 1:
            target = target[:, 1:]
            input = input[:, 1:]
        if target.shape != input.shape:
            raise AssertionError(f"ground truth has different shape ({target.shape}) from input ({input.shape})")

        reduce_axis = list(range(2, input.ndim))
        if self.batch:
            reduce_axis = [0] + reduce_axis
        intersection = jnp.sum(target * input, axis=tuple(reduce_axis))
        if self.squared_pred:
            ground_o = jnp.sum(target**2, axis=tuple(reduce_axis))
            pred_o = jnp.sum(input**2, axis=tuple(reduce_axis))
        else:
            ground_o = jnp.sum(target, axis=tuple(reduce_axis))
            pred_o = jnp.sum(input, axis=tuple(reduce_axis))
        denominator = ground_o + pred_o
        if self.jaccard:
            denominator = 2.0 * (denominator - intersection)
        f = 1.0 - (2.0 * intersection + self.smooth_nr) / (denominator + self.smooth_dr)

        num_of_classes = f.shape[-1] if f.ndim > 1 else (f.shape[0] if self.batch else input.shape[1])
        if self.weight is not None:
            w = jnp.asarray(self.weight, dtype=f.dtype)
            if w.ndim == 0:
                w = jnp.full((f.shape[-1],), w)
            f = f * jnp.broadcast_to(w, f.shape)
        return _reduce(f, self.reduction)


class MaskedDiceLoss(DiceLoss):
    """Dice with a spatial mask (reference: dice.py MaskedDiceLoss)."""

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None):
        if mask is not None:
            input = input * mask
            target = target * mask
        return super().__call__(input, target)


class GeneralizedDiceLoss:
    """Class-weighted generalized dice (reference: dice.py GeneralizedDiceLoss)."""

    def __init__(self, include_background: bool = True, to_onehot_y: bool = False, sigmoid: bool = False,
                 softmax: bool = False, other_act: Callable | None = None, w_type: str = Weight.SQUARE,
                 reduction: str = LossReduction.MEAN, smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 batch: bool = False, soft_label: bool = False):
        self.include_background = include_background
        self.to_onehot_y = to_onehot_y
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.other_act = other_act
        self.w_type = look_up_option(str(w_type), Weight)
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.smooth_nr = float(smooth_nr)
        self.smooth_dr = float(smooth_dr)
        self.batch = batch

    def w_func(self, grnd):
        if str(self.w_type) == str(Weight.SIMPLE):
            return 1.0 / grnd
        if str(self.w_type) == str(Weight.SQUARE):
            return 1.0 / (grnd * grnd)
        return jnp.ones_like(grnd)

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.sigmoid:
            input = jax.nn.sigmoid(input)
        n_pred_ch = input.shape[1]
        if self.softmax and n_pred_ch != 1:
            input = jax.nn.softmax(input, axis=1)
        if self.other_act is not None:
            input = self.other_act(input)
        if self.to_onehot_y and n_pred_ch != 1:
            target = one_hot(target, num_classes=n_pred_ch, dim=1)
        if not self.include_background and n_pred_ch != 1:
            target = target[:, 1:]
            input = input[:, 1:]
        reduce_axis = list(range(2, input.ndim))
        if self.batch:
            reduce_axis = [0] + reduce_axis
        intersection = jnp.sum(target * input, axis=tuple(reduce_axis))
        ground_o = jnp.sum(target, axis=tuple(reduce_axis))
        pred_o = jnp.sum(input, axis=tuple(reduce_axis))
        denominator = ground_o + pred_o
        w = self.w_func(ground_o.astype(jnp.float32))
        infs = jnp.isinf(w)
        if self.batch:
            w = jnp.where(infs, 0.0, w)
            w = w + infs * jnp.max(w)
        else:
            w = jnp.where(infs, 0.0, w)
            w = w + infs * jnp.max(w, axis=1, keepdims=True)
        # generalized dice aggregates over the class axis with weights
        final_reduce_dim = 0 if self.batch else 1
        numer = 2.0 * jnp.sum(intersection * w, axis=final_reduce_dim, keepdims=True) + self.smooth_nr
        denom = jnp.sum(denominator * w, axis=final_reduce_dim, keepdims=True) + self.smooth_dr
        f = 1.0 - (numer / denom)
        return _reduce(f, self.reduction)


class GeneralizedWassersteinDiceLoss:
    """Wasserstein dice with an inter-class distance matrix
    (reference: dice.py GeneralizedWassersteinDiceLoss)."""

    def __init__(self, dist_matrix, weighting_mode: str = "default",
                 reduction: str = LossReduction.MEAN, smooth_nr: float = 1e-5, smooth_dr: float = 1e-5):
        dist_matrix = np.asarray(dist_matrix, dtype=np.float32)
        if dist_matrix.shape[0] != dist_matrix.shape[1]:
            raise ValueError(f"dist_matrix must be C x C, got {dist_matrix.shape}.")
        if weighting_mode not in ["default", "GDL"]:
            raise ValueError("weighting_mode must be either 'default' or 'GDL'")
        self.m = jnp.asarray(dist_matrix)
        if jnp.max(self.m) != 1:
            self.m = self.m / jnp.max(self.m)
        self.alpha_mode = weighting_mode
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.smooth_nr = float(smooth_nr)
        self.smooth_dr = float(smooth_dr)
        self.num_classes = self.m.shape[0]

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        B = input.shape[0]
        flat_input = input.reshape(B, self.num_classes, -1)
        flat_target = target.reshape(B, -1).astype(jnp.int32)
        probs = jax.nn.softmax(flat_input, axis=1)
        wass_dist_map = self.wasserstein_distance_map(probs, flat_target)
        alpha = self._compute_alpha_generalized_true_positives(flat_target)
        true_pos = self._compute_generalized_true_positive(alpha, flat_target, wass_dist_map)
        if self.alpha_mode == "GDL":
            denom = self._compute_denominator(alpha, flat_target, wass_dist_map)
        else:  # original paper: alpha 1 for foreground, 0 for background
            all_error = jnp.sum(wass_dist_map, axis=1)
            denom = 2 * true_pos + all_error
        wass_dice = (2.0 * true_pos + self.smooth_nr) / (denom + self.smooth_dr)
        return _reduce(1.0 - wass_dice, self.reduction)

    def wasserstein_distance_map(self, flat_proba: jnp.ndarray, flat_target: jnp.ndarray) -> jnp.ndarray:
        m_extended = self.m[None]  # (1, C, C)
        # select rows by target label: (B, N, C)
        m_rows = self.m[flat_target]  # (B, N, C)
        # expected distance: sum_c proba_c * M[target, c]
        return jnp.einsum("bcn,bnc->bn", flat_proba, m_rows)

    def _compute_generalized_true_positive(self, alpha, flat_target, wasserstein_distance_map):
        # reference dice.py:1061 broadcasts (B,1,N)*(B,N) -> (B,B,N) and sums dims
        # [1,2], coupling batch rows; replicated verbatim for output parity
        alpha_sel = jnp.take_along_axis(alpha, flat_target, axis=1)  # (B, N)
        return jnp.einsum("bn,cn->b", alpha_sel, 1.0 - wasserstein_distance_map)

    def _compute_denominator(self, alpha, flat_target, wasserstein_distance_map):
        alpha_sel = jnp.take_along_axis(alpha, flat_target, axis=1)
        return jnp.einsum("bn,cn->b", alpha_sel, 2.0 - wasserstein_distance_map)

    def _compute_alpha_generalized_true_positives(self, flat_target: jnp.ndarray) -> jnp.ndarray:
        if self.alpha_mode == "GDL":
            one_hot_t = jax.nn.one_hot(flat_target, self.num_classes, axis=1)  # (B, C, N)
            volumes = jnp.sum(one_hot_t, axis=2)
            return 1.0 / (volumes + 1.0)
        # default (original paper): 1 for foreground classes, 0 for background
        alpha = jnp.ones((flat_target.shape[0], self.num_classes))
        return alpha.at[:, 0].set(0.0)


class DiceCELoss:
    """Dice + cross-entropy (reference: monai/losses/dice.py:650)."""

    def __init__(self, include_background: bool = True, to_onehot_y: bool = False, sigmoid: bool = False,
                 softmax: bool = False, other_act: Callable | None = None, squared_pred: bool = False,
                 jaccard: bool = False, reduction: str = "mean", smooth_nr: float = 1e-5,
                 smooth_dr: float = 1e-5, batch: bool = False, ce_weight=None, weight=None,
                 lambda_dice: float = 1.0, lambda_ce: float = 1.0, label_smoothing: float = 0.0,
                 channels_last: bool = False):
        self.dice = DiceLoss(include_background=include_background, to_onehot_y=to_onehot_y,
                             sigmoid=sigmoid, softmax=softmax, other_act=other_act,
                             squared_pred=squared_pred, jaccard=jaccard, reduction=reduction,
                             smooth_nr=smooth_nr, smooth_dr=smooth_dr, batch=batch,
                             weight=weight if weight is not None else ce_weight)
        if lambda_dice < 0.0:
            raise ValueError("lambda_dice should be no less than 0.0.")
        if lambda_ce < 0.0:
            raise ValueError("lambda_ce should be no less than 0.0.")
        self.lambda_dice = lambda_dice
        self.lambda_ce = lambda_ce
        self.sigmoid = sigmoid
        self.to_onehot_y = to_onehot_y
        self.label_smoothing = label_smoothing
        self.class_weight = jnp.asarray(ce_weight) if ce_weight is not None else None
        # TPU-native extension (not in the reference API): accept (B, *sp, C)
        # logits/(B, *sp, 1) targets directly. TPU networks run channels-last
        # internally; the channel-first boundary transposes of the full-size
        # logits (+ their transposed backward) cost ~20 ms/step at batch-16 96³
        # in the r5 train trace (scripts/perf_xprof.py train, fusion.532/534) —
        # this keeps the loss in the network's native layout instead.
        self.channels_last = channels_last

    def ce(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Multi-class cross entropy on (B, C, *sp) logits."""
        n_ch = input.shape[1]
        if target.shape == input.shape:
            # soft/one-hot targets
            t = target
        elif target.shape[1] == 1:
            t = one_hot(target, num_classes=n_ch, dim=1)
        else:
            raise ValueError(f"incompatible target shape {target.shape} for input {input.shape}")
        if self.label_smoothing > 0:
            t = t * (1 - self.label_smoothing) + self.label_smoothing / n_ch
        logp = jax.nn.log_softmax(input, axis=1)
        ce_map = -(t * logp)
        if self.class_weight is not None:
            wshape = [1, n_ch] + [1] * (input.ndim - 2)
            ce_map = ce_map * self.class_weight.reshape(wshape)
            denom = jnp.sum(t * jnp.broadcast_to(self.class_weight.reshape(wshape), t.shape))
            return jnp.sum(ce_map) / jnp.maximum(denom, 1e-8)
        return jnp.mean(jnp.sum(ce_map, axis=1))

    def bce(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logp = jax.nn.log_sigmoid(input)
        lognp = jax.nn.log_sigmoid(-input)
        return -jnp.mean(target * logp + (1 - target) * lognp)

    def _binary_fast_applicable(self, input: jnp.ndarray, target: jnp.ndarray) -> bool:
        d = self.dice
        ch = -1 if self.channels_last else 1
        return (input.shape[ch] == 2 and target.ndim == input.ndim and target.shape[ch] == 1
                and d.softmax and not d.sigmoid and d.other_act is None
                and self.to_onehot_y and d.include_background
                and not d.squared_pred and not d.jaccard and d.weight is None
                and str(d.reduction) == "mean" and self.label_smoothing == 0
                and self.class_weight is None and not self.sigmoid)

    def _binary_fast(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Two-class DiceCE on the *logit difference* — a TPU lane-density
        rewrite, same math as the general path.

        With C=2, softmax over the channel axis collapses to a sigmoid of the
        logit difference: p1 = σ(l1−l0), log p1 = −softplus(−(l1−l0)). The
        general path materializes ~10 channel-minor (B,2,*sp) f32 maps
        (softmax, one-hot, CE map, dice products); with C=2 on the 128-lane
        minor dim each runs at 2/128 lane occupancy — the r4 train trace shows
        them costing ~10 ms of a 61 ms step. This path computes the identical
        loss from channel-free (B,*sp) arrays (full lanes) using 5 spatial
        reductions; grads flow through the same sigmoid/softplus graph. Parity
        vs the general path: tests/test_losses_metrics.py (1e-5 f32)."""
        dd = self.dice
        # cast BEFORE subtracting: for bf16 logits, rounding the difference to
        # bf16 would cost ~3 decimal digits; the casts fuse into the sub anyway
        if self.channels_last:
            d = input[..., 1].astype(jnp.float32) - input[..., 0].astype(jnp.float32)
            t = target[..., 0]
        else:
            d = input[:, 1].astype(jnp.float32) - input[:, 0].astype(jnp.float32)
            t = target[:, 0]
        y1 = (t == 1).astype(jnp.float32)
        y0 = (t == 0).astype(jnp.float32)
        p1 = jax.nn.sigmoid(d)
        # CE: -(y1·log p1 + y0·log p0), log p1 = -softplus(-d), log p0 = -softplus(d)
        ce_map = y1 * jax.nn.softplus(-d) + y0 * jax.nn.softplus(d)
        ce_loss = jnp.mean(ce_map)
        axes = tuple(range(1, d.ndim))
        n_vox = float(np.prod(d.shape[1:]))
        s_y1p1 = jnp.sum(y1 * p1, axis=axes)
        s_y0p1 = jnp.sum(y0 * p1, axis=axes)
        s_y1 = jnp.sum(y1, axis=axes)
        s_y0 = jnp.sum(y0, axis=axes)
        s_p1 = jnp.sum(p1, axis=axes)
        if dd.batch:
            s_y1p1, s_y0p1, s_y1, s_y0, s_p1 = (jnp.sum(v) for v in
                                                (s_y1p1, s_y0p1, s_y1, s_y0, s_p1))
            n_vox *= d.shape[0]
        inter1 = s_y1p1
        inter0 = s_y0 - s_y0p1          # Σ y0·(1−p1)
        f1 = 1.0 - (2.0 * inter1 + dd.smooth_nr) / (s_y1 + s_p1 + dd.smooth_dr)
        f0 = 1.0 - (2.0 * inter0 + dd.smooth_nr) / (s_y0 + (n_vox - s_p1) + dd.smooth_dr)
        dice_loss = jnp.mean(jnp.stack([f0, f1]))
        return self.lambda_dice * dice_loss + self.lambda_ce * ce_loss

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self._binary_fast_applicable(input, target):
            return self._binary_fast(input, target)
        if self.channels_last:
            # general path is channel-first math; fall back via transpose (the
            # fast path above covers the binary segmentation hot case without it)
            perm = (0, input.ndim - 1) + tuple(range(1, input.ndim - 1))
            input = jnp.transpose(input, perm)
            target = jnp.transpose(target, perm)
        if input.shape[1] == 1 or self.sigmoid:
            t = target
            if self.to_onehot_y and input.shape[1] != 1:
                t = one_hot(target, num_classes=input.shape[1], dim=1)
            ce_loss = self.bce(input, t.astype(input.dtype))
        else:
            ce_loss = self.ce(input, target)
        dice_loss = self.dice(input, target)
        return self.lambda_dice * dice_loss + self.lambda_ce * ce_loss


class DiceFocalLoss:
    """Dice + focal (reference: dice.py DiceFocalLoss)."""

    def __init__(self, include_background: bool = True, to_onehot_y: bool = False, sigmoid: bool = False,
                 softmax: bool = False, other_act=None, squared_pred: bool = False, jaccard: bool = False,
                 reduction: str = "mean", smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 batch: bool = False, gamma: float = 2.0, focal_weight=None, weight=None,
                 lambda_dice: float = 1.0, lambda_focal: float = 1.0, alpha: float | None = None):
        weight = focal_weight if focal_weight is not None else weight
        # one-hot conversion happens once in __call__; sub-losses never re-convert
        self.dice = DiceLoss(include_background=include_background, to_onehot_y=False,
                             sigmoid=sigmoid, softmax=softmax, other_act=other_act,
                             squared_pred=squared_pred, jaccard=jaccard, reduction=reduction,
                             smooth_nr=smooth_nr, smooth_dr=smooth_dr, batch=batch)
        # the reference's DiceFocalLoss always uses the sigmoid-focal form (dice.py:—)
        self.focal = FocalLoss(include_background=include_background, to_onehot_y=False, gamma=gamma,
                               weight=weight, alpha=alpha, reduction=reduction)
        if lambda_dice < 0.0 or lambda_focal < 0.0:
            raise ValueError("lambda_dice and lambda_focal should be no less than 0.0.")
        self.lambda_dice = lambda_dice
        self.lambda_focal = lambda_focal
        self.to_onehot_y = to_onehot_y

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        n_pred_ch = input.shape[1]
        t = target
        if self.to_onehot_y and n_pred_ch != 1 and target.shape[1] == 1:
            t = one_hot(target, num_classes=n_pred_ch, dim=1)
        dice_loss = self.dice(input, t)
        focal_loss = self.focal(input, t)
        return self.lambda_dice * dice_loss + self.lambda_focal * focal_loss


class GeneralizedDiceFocalLoss:
    """Generalized dice + focal (reference: dice.py:947)."""

    def __init__(self, include_background: bool = True, to_onehot_y: bool = False, sigmoid: bool = False,
                 softmax: bool = False, other_act=None, w_type: str = Weight.SQUARE,
                 reduction: str = "mean", smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 batch: bool = False, gamma: float = 2.0, weight=None,
                 lambda_gdl: float = 1.0, lambda_focal: float = 1.0):
        self.generalized_dice = GeneralizedDiceLoss(include_background=include_background,
                                                    to_onehot_y=to_onehot_y, sigmoid=sigmoid,
                                                    softmax=softmax, other_act=other_act, w_type=w_type,
                                                    reduction=reduction, smooth_nr=smooth_nr,
                                                    smooth_dr=smooth_dr, batch=batch)
        # NOTE reference quirk (dice.py:1024): unlike DiceFocalLoss, the reference's
        # GeneralizedDiceFocalLoss does NOT forward softmax to its FocalLoss — the
        # focal term always uses sigmoid semantics. Matched for parity.
        self.focal = FocalLoss(include_background=include_background, to_onehot_y=to_onehot_y,
                               gamma=gamma, weight=weight, reduction=reduction)
        if lambda_gdl < 0.0 or lambda_focal < 0.0:
            raise ValueError("lambda_gdl and lambda_focal should be no less than 0.0.")
        self.lambda_gdl = lambda_gdl
        self.lambda_focal = lambda_focal

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return (self.lambda_gdl * self.generalized_dice(input, target)
                + self.lambda_focal * self.focal(input, target))


Dice = DiceLoss
dice_ce = DiceCELoss
dice_focal = DiceFocalLoss
