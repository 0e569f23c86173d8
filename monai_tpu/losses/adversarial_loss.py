"""Adversarial + spectral losses (reference: monai/losses/adversarial_loss.py
PatchAdversarialLoss; monai/losses/spectral_loss.py JukeboxLoss;
monai/losses/sure_loss.py SURELoss; monai/losses/giou_loss.py BoxGIoULoss)."""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

from ..utils.enums import LossReduction, StrEnum
from ..utils.module import look_up_option

__all__ = ["PatchAdversarialLoss", "JukeboxLoss", "SURELoss", "BoxGIoULoss", "giou"]


def _reduce(x, reduction):
    r = str(reduction)
    if r == "mean":
        return jnp.mean(x)
    if r == "sum":
        return jnp.sum(x)
    return x


class PatchAdversarialLoss:
    """Adversarial criterion over patch-discriminator outputs
    (reference: adversarial_loss.py PatchAdversarialLoss)."""

    def __init__(self, reduction: str = LossReduction.MEAN, criterion: str = "least_squares",
                 no_activation_leastsq: bool = False):
        if criterion not in ("bce", "hinge", "least_squares"):
            raise ValueError("Unrecognised criterion. Must be one of: bce, hinge, least_squares")
        self.criterion = criterion
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.real_label = 1.0
        self.fake_label = 0.0 if criterion != "hinge" else -1.0
        self.no_activation_leastsq = no_activation_leastsq

    def _single(self, logits: jnp.ndarray, target_is_real: bool, for_discriminator: bool):
        target = self.real_label if target_is_real else self.fake_label
        if self.criterion == "bce":
            # reference: Sigmoid activation + BCELoss == logits BCE
            t = jnp.full_like(logits, target)
            loss = jnp.maximum(logits, 0) - logits * t + jax.nn.softplus(-jnp.abs(logits))
        elif self.criterion == "hinge":
            # reference: tanh activation, then -mean(min(x-1, 0)) with x negated for
            # the fake branch; generator uses the real-branch form (target forced real)
            x = jnp.tanh(logits)
            x = x if target_is_real else -x
            loss = jax.nn.relu(1.0 - x)
        else:  # least squares: LeakyReLU(0.05) activation + MSE vs label
            probs = logits if self.no_activation_leastsq else jax.nn.leaky_relu(logits, 0.05)
            loss = (probs - target) ** 2
        return _reduce(loss, self.reduction)

    def __call__(self, input, target_is_real: bool, for_discriminator: bool):
        if not for_discriminator and not target_is_real:
            target_is_real = True  # generator loss always drives towards "real"
        if isinstance(input, (list, tuple)):
            losses = [self._single(i, target_is_real, for_discriminator) for i in input]
            if str(self.reduction) == "mean":
                return jnp.mean(jnp.stack(losses))
            if str(self.reduction) == "sum":
                return jnp.sum(jnp.stack(losses))
            return losses
        return self._single(input, target_is_real, for_discriminator)


class JukeboxLoss:
    """Spectral magnitude loss via FFT (reference: spectral_loss.py JukeboxLoss)."""

    def __init__(self, spatial_dims: int, fft_signal_size=None, fft_norm: str = "ortho",
                 reduction: str = LossReduction.MEAN):
        self.spatial_dims = spatial_dims
        self.fft_signal_size = fft_signal_size
        self.fft_norm = fft_norm
        self.reduction = look_up_option(str(reduction), LossReduction)

    def _amplitude(self, x):
        # reference spectral_loss.py:54 fft_dim includes the channel dim: (1..sd+1)
        dims = tuple(range(1, self.spatial_dims + 2))
        f = jnp.fft.fftn(x, s=self.fft_signal_size, axes=dims, norm=self.fft_norm)
        return jnp.sqrt(f.real**2 + f.imag**2)

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        inp_amp = self._amplitude(input)
        tgt_amp = self._amplitude(target)
        return _reduce((inp_amp - tgt_amp) ** 2, self.reduction)


class SURELoss:
    """Stein's unbiased risk estimate for denoising without clean targets
    (reference: sure_loss.py SURELoss)."""

    def __init__(self, perturb_noise=None, eps: float | None = None):
        self.eps = eps
        self.perturb_noise = perturb_noise

    def __call__(self, operator, x: jnp.ndarray, y_pseudo_gt: jnp.ndarray, y_ref=None,
                 key=None, complex_input: bool = False):
        if x.ndim != 4 or y_pseudo_gt.ndim != 4:
            raise ValueError("SURELoss expects 4D (B, C, H, W) inputs.")
        return sure_loss_function(operator, x, y_pseudo_gt, y_ref=y_ref,
                                  eps=-1.0 if self.eps is None else self.eps,
                                  perturb_noise=self.perturb_noise,
                                  complex_input=complex_input, key=key)


def giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Paired generalized IoU in jnp (differentiable; reference: giou_loss.py)."""
    d = boxes1.shape[-1] // 2
    lt = jnp.maximum(boxes1[..., :d], boxes2[..., :d])
    rb = jnp.minimum(boxes1[..., d:], boxes2[..., d:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = jnp.prod(wh, axis=-1)
    area1 = jnp.prod(boxes1[..., d:] - boxes1[..., :d], axis=-1)
    area2 = jnp.prod(boxes2[..., d:] - boxes2[..., :d], axis=-1)
    union = area1 + area2 - inter
    iou = inter / jnp.clip(union, 1e-8, None)
    lt_e = jnp.minimum(boxes1[..., :d], boxes2[..., :d])
    rb_e = jnp.maximum(boxes1[..., d:], boxes2[..., d:])
    enc = jnp.prod(jnp.clip(rb_e - lt_e, 0, None), axis=-1)
    return iou - (enc - union) / jnp.clip(enc, 1e-8, None)


class BoxGIoULoss:
    """1 - GIoU for paired boxes (reference: giou_loss.py BoxGIoULoss)."""

    def __init__(self, reduction: str = LossReduction.MEAN):
        self.reduction = look_up_option(str(reduction), LossReduction)

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if target.shape != input.shape:
            raise ValueError(f"ground truth has different shape ({target.shape}) from input ({input.shape})")
        return _reduce(1.0 - giou(input, target), self.reduction)


class AdversarialCriterions(StrEnum):
    """(reference: adversarial_loss.py AdversarialCriterions)."""

    BCE = "bce"
    HINGE = "hinge"
    LEAST_SQUARE = "least_squares"


def complex_diff_abs_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """MSE of complex-difference magnitudes; inputs are (B, 2, H, W) real pairs
    (reference: sure_loss.py:21)."""
    diff = x - y
    mag = jnp.sqrt(diff[:, 0] ** 2 + diff[:, 1] ** 2 + 1e-12)
    return jnp.mean(mag ** 2)


def sure_loss_function(operator, x: jnp.ndarray, y_pseudo_gt: jnp.ndarray, y_ref=None,
                       eps: float | None = -1.0, perturb_noise=None,
                       complex_input: bool = False, key=None) -> jnp.ndarray:
    """Functional SURE loss (reference: sure_loss.py:41). ``perturb_noise`` or
    ``key`` supplies the Monte-Carlo divergence probe (jax has no global RNG)."""
    if perturb_noise is None:
        key = jax.random.PRNGKey(0) if key is None else key
        perturb_noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    if eps == -1.0 or eps is None:
        eps = float(jnp.abs(y_pseudo_gt).max()) / 1000
    if y_ref is None:
        y_ref = operator(x)
    y_perturbed = operator(x + eps * perturb_noise)
    # reference sure_loss.py:98: divergence = sum(matmul(noise^T, diff)) / eps,
    # and the final loss is l2 * divergence / (B*H*W) — matched verbatim
    diff = y_perturbed - y_ref
    divergence = jnp.sum(jnp.einsum("bchi,bchj->bcij", perturb_noise, diff)) / eps
    if complex_input:
        l2_loss = complex_diff_abs_loss(y_ref, y_pseudo_gt)
    else:
        l2_loss = jnp.mean((y_ref - y_pseudo_gt) ** 2)
    return l2_loss * divergence / (x.shape[0] * x.shape[2] * x.shape[3])
