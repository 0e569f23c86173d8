"""Additional losses: Tversky, contrastive, registration, SSIM, deep supervision, masked.

Parity targets: monai/losses/{tversky,contrastive,barlow_twins,deform,image_dissimilarity,
multi_scale,spatial_mask,ds_loss,ssim_loss,cldice,hausdorff_loss,unified_focal_loss}.py.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import jax
import jax.numpy as jnp

from ..networks.utils import one_hot
from ..utils.enums import LossReduction
from ..utils.module import look_up_option

__all__ = ["TverskyLoss", "ContrastiveLoss", "BarlowTwinsLoss", "BendingEnergyLoss", "DiffusionLoss",
           "LocalNormalizedCrossCorrelationLoss", "GlobalMutualInformationLoss", "MultiScaleLoss",
           "MaskedLoss", "DeepSupervisionLoss", "SSIMLoss", "SoftclDiceLoss", "SoftDiceclDiceLoss",
           "HausdorffDTLoss", "LogHausdorffDTLoss", "AsymmetricUnifiedFocalLoss",
           "AsymmetricFocalLoss", "AsymmetricFocalTverskyLoss"]


def _reduce(f, reduction):
    r = str(reduction)
    if r == "mean":
        return jnp.mean(f)
    if r == "sum":
        return jnp.sum(f)
    return f


class TverskyLoss:
    """Tversky index loss (reference: monai/losses/tversky.py:24)."""

    def __init__(self, include_background: bool = True, to_onehot_y: bool = False, sigmoid: bool = False,
                 softmax: bool = False, other_act: Callable | None = None, alpha: float = 0.5,
                 beta: float = 0.5, reduction: str = LossReduction.MEAN, smooth_nr: float = 1e-5,
                 smooth_dr: float = 1e-5, batch: bool = False, soft_label: bool = False):
        self.include_background = include_background
        self.to_onehot_y = to_onehot_y
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.other_act = other_act
        self.alpha = alpha
        self.beta = beta
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.smooth_nr = float(smooth_nr)
        self.smooth_dr = float(smooth_dr)
        self.batch = batch

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
        target = target.astype(input.dtype)
        p0 = input
        p1 = 1 - p0
        g0 = target
        g1 = 1 - g0
        reduce_axis = list(range(2, input.ndim))
        if self.batch:
            reduce_axis = [0] + reduce_axis
        tp = jnp.sum(p0 * g0, axis=tuple(reduce_axis))
        fp = self.alpha * jnp.sum(p0 * g1, axis=tuple(reduce_axis))
        fn = self.beta * jnp.sum(p1 * g0, axis=tuple(reduce_axis))
        numerator = tp + self.smooth_nr
        denominator = tp + fp + fn + self.smooth_dr
        score = 1.0 - numerator / denominator
        return _reduce(score, self.reduction)


class ContrastiveLoss:
    """NT-Xent contrastive loss (reference: monai/losses/contrastive.py:22)."""

    def __init__(self, temperature: float = 0.5, batch_size: int = -1):
        self.temperature = temperature

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if len(target.shape) > 2 or len(input.shape) > 2:
            raise ValueError(f"Either target or input has dimensions greater than 2, got {target.shape}, {input.shape}")
        if target.shape != input.shape:
            raise ValueError(f"ground truth has differing shape ({target.shape}) from input ({input.shape})")
        b = input.shape[0]
        negatives_mask = 1.0 - jnp.eye(2 * b)
        repr_ = jnp.concatenate([input, target], axis=0)
        norm = repr_ / (jnp.linalg.norm(repr_, axis=1, keepdims=True) + 1e-12)
        sim_matrix = norm @ norm.T
        sim_ij = jnp.diag(sim_matrix, b)
        sim_ji = jnp.diag(sim_matrix, -b)
        positives = jnp.concatenate([sim_ij, sim_ji], axis=0)
        nominator = jnp.exp(positives / self.temperature)
        denominator = negatives_mask * jnp.exp(sim_matrix / self.temperature)
        loss_partial = -jnp.log(nominator / jnp.sum(denominator, axis=1))
        return jnp.sum(loss_partial) / (2 * b)


class BarlowTwinsLoss:
    """Barlow twins cross-correlation loss (reference: monai/losses/barlow_twins.py)."""

    def __init__(self, lambd: float = 5e-3):
        self.lambd = lambd

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if target.shape != input.shape:
            raise ValueError(f"ground truth has differing shape ({target.shape}) from input ({input.shape})")
        b = input.shape[0]
        if b <= 1:
            raise ValueError(f"Batch size must be greater than 1, got {b}")
        # torch .std() is the UNBIASED estimator (ddof=1) and the reference adds 1e-6
        input_norm = (input - input.mean(0)) / (input.std(0, ddof=1) + 1e-6)
        target_norm = (target - target.mean(0)) / (target.std(0, ddof=1) + 1e-6)
        c = (input_norm.T @ target_norm) / b
        on_diag = jnp.sum((jnp.diag(c) - 1) ** 2)
        off_diag = jnp.sum(c**2) - jnp.sum(jnp.diag(c) ** 2)
        return on_diag + self.lambd * off_diag


def _spatial_gradient(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Central difference along spatial dim (reference: deform.py:29)."""
    slices_plus = [slice(None), slice(None)] + [slice(None)] * (x.ndim - 2)
    slices_minus = [slice(None), slice(None)] + [slice(None)] * (x.ndim - 2)
    slices_mid = [slice(None), slice(None)] + [slice(1, -1)] * (x.ndim - 2)
    slices_plus[dim] = slice(2, None)
    slices_minus[dim] = slice(None, -2)
    for d in range(2, x.ndim):
        if d != dim:
            slices_plus[d] = slice(1, -1)
            slices_minus[d] = slice(1, -1)
    return (x[tuple(slices_plus)] - x[tuple(slices_minus)]) / 2.0


class BendingEnergyLoss:
    """Second-order smoothness of a DDF (reference: monai/losses/deform.py:47)."""

    def __init__(self, normalize: bool = False, reduction: str = LossReduction.MEAN):
        self.normalize = normalize
        self.reduction = look_up_option(str(reduction), LossReduction)

    def __call__(self, pred: jnp.ndarray) -> jnp.ndarray:
        if pred.ndim not in (3, 4, 5):
            raise ValueError(f"Expecting 3-d, 4-d or 5-d pred, instead got pred of shape {pred.shape}")
        for i in range(pred.ndim - 2):
            if pred.shape[-i - 1] <= 4:
                raise ValueError(f"All spatial dimensions must be > 4, got spatial dimensions {pred.shape[2:]}")
        if pred.shape[1] != pred.ndim - 2:
            raise ValueError(f"Number of vector components, {pred.shape[1]}, does not match number of spatial dimensions, {pred.ndim - 2}")
        num_sd = pred.ndim - 2
        if self.normalize:
            spacing = jnp.asarray(pred.shape[2:], dtype=pred.dtype)
            pred = pred / spacing.reshape([1, num_sd] + [1] * num_sd) * spatial_scale(pred)
        first_grads = [_spatial_gradient(pred, d) for d in range(2, pred.ndim)]
        energy = 0.0
        for dim_1, g in enumerate(first_grads):
            dim_1 += 2
            energy = energy + _spatial_gradient(g, dim_1) ** 2
            for dim_2 in range(dim_1 + 1, pred.ndim):
                energy = energy + 2 * _spatial_gradient(g, dim_2) ** 2
        return _reduce(energy, self.reduction)


def spatial_scale(pred):
    return jnp.asarray(pred.shape[2:], dtype=pred.dtype).reshape([1, pred.ndim - 2] + [1] * (pred.ndim - 2))


class DiffusionLoss:
    """First-order smoothness of a DDF (reference: monai/losses/deform.py:128)."""

    def __init__(self, normalize: bool = False, reduction: str = LossReduction.MEAN):
        self.normalize = normalize
        self.reduction = look_up_option(str(reduction), LossReduction)

    def __call__(self, pred: jnp.ndarray) -> jnp.ndarray:
        if pred.ndim not in (3, 4, 5):
            raise ValueError(f"Expecting 3-d, 4-d or 5-d pred, instead got pred of shape {pred.shape}")
        for i in range(pred.ndim - 2):
            if pred.shape[-i - 1] <= 2:
                raise ValueError(f"All spatial dimensions must be > 2, got spatial dimensions {pred.shape[2:]}")
        if pred.shape[1] != pred.ndim - 2:
            raise ValueError(f"Number of vector components, {pred.shape[1]}, does not match number of spatial dimensions, {pred.ndim - 2}")
        loss = 0.0
        for d in range(2, pred.ndim):
            loss = loss + _spatial_gradient(pred, d) ** 2
        return _reduce(loss, self.reduction)


class LocalNormalizedCrossCorrelationLoss:
    """LNCC via box-kernel local statistics (reference: monai/losses/image_dissimilarity.py:51)."""

    def __init__(self, spatial_dims: int = 3, kernel_size: int = 3, kernel_type: str = "rectangular",
                 reduction: str = LossReduction.MEAN, smooth_nr: float = 0.0, smooth_dr: float = 1e-5):
        self.spatial_dims = spatial_dims
        self.kernel_size = kernel_size
        if kernel_size % 2 == 0:
            raise ValueError(f"kernel_size must be odd, got {kernel_size}")
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.smooth_nr = float(smooth_nr)
        self.smooth_dr = float(smooth_dr)

    def _local_sum(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.gaussian import separable_filtering
        import numpy as np

        kernels = [np.ones(self.kernel_size, dtype=np.float32)] * self.spatial_dims
        return separable_filtering(x.reshape((-1,) + x.shape[2:]), kernels).reshape(x.shape)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if pred.ndim - 2 != self.spatial_dims:
            raise ValueError(f"expecting pred with {self.spatial_dims} spatial dimensions, got pred of shape {pred.shape}")
        if target.shape != pred.shape:
            raise ValueError(f"ground truth has differing shape ({target.shape}) from pred ({pred.shape})")
        t2, p2, tp = target * target, pred * pred, target * pred
        kernel_vol = float(self.kernel_size**self.spatial_dims)
        t_sum = self._local_sum(target)
        p_sum = self._local_sum(pred)
        t2_sum = self._local_sum(t2)
        p2_sum = self._local_sum(p2)
        tp_sum = self._local_sum(tp)
        t_avg = t_sum / kernel_vol
        p_avg = p_sum / kernel_vol
        cross = tp_sum - p_avg * t_sum
        t_var = jnp.maximum(t2_sum - t_avg * t_sum, 0)
        p_var = jnp.maximum(p2_sum - p_avg * p_sum, 0)
        ncc = (cross * cross + self.smooth_nr) / (t_var * p_var + self.smooth_dr)
        return _reduce(-ncc, self.reduction)


class GlobalMutualInformationLoss:
    """Parzen-window MI (reference: monai/losses/image_dissimilarity.py:166)."""

    def __init__(self, kernel_type: str = "gaussian", num_bins: int = 23, sigma_ratio: float = 0.5,
                 reduction: str = LossReduction.MEAN, smooth_nr: float = 1e-7, smooth_dr: float = 1e-7):
        if num_bins <= 0:
            raise ValueError("num_bins must > 0, got {num_bins}")
        self.num_bins = num_bins
        self.kernel_type = kernel_type
        self.sigma_ratio = sigma_ratio
        self.reduction = look_up_option(str(reduction), LossReduction)
        self.smooth_nr = float(smooth_nr)
        self.smooth_dr = float(smooth_dr)

    def parzen_windowing_gaussian(self, img: jnp.ndarray):
        img = jnp.clip(img, 0, 1)
        bin_centers = jnp.linspace(0.0, 1.0, self.num_bins)
        sigma = jnp.mean(jnp.diff(bin_centers)) * self.sigma_ratio
        preterm = 1 / (2 * sigma**2)
        flat = img.reshape(img.shape[0], -1, 1)
        weight = jnp.exp(-preterm * (flat - bin_centers.reshape(1, 1, -1)) ** 2)
        weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
        probability = jnp.mean(weight, axis=-2, keepdims=True)
        return weight, probability

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if target.shape != pred.shape:
            raise ValueError(f"ground truth has differing shape ({target.shape}) from pred ({pred.shape})")
        wa, pa = self.parzen_windowing_gaussian(pred)
        wb, pb = self.parzen_windowing_gaussian(target)
        pab = (wa.transpose(0, 2, 1) @ wb) / wa.shape[1]
        papb = pa.transpose(0, 2, 1) @ pb
        mi = jnp.sum(pab * jnp.log((pab + self.smooth_nr) / (papb + self.smooth_dr) + self.smooth_dr),
                     axis=(1, 2))
        return _reduce(-mi, self.reduction)


class MultiScaleLoss:
    """Loss over gaussian-smoothed multi-scales (reference: monai/losses/multi_scale.py:—)."""

    def __init__(self, loss, scales: Sequence[int] | None = None, kernel: str = "gaussian",
                 reduction: str = LossReduction.MEAN):
        if kernel not in ("gaussian", "cauchy"):
            raise ValueError(f"got unsupported kernel type: {kernel}")
        self.loss = loss
        self.scales = scales
        self.reduction = look_up_option(str(reduction), LossReduction)

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        from ..ops.gaussian import gaussian_filter

        if self.scales is None:
            return self.loss(y_pred, y_true)
        losses = []
        for s in self.scales:
            if s == 0:
                losses.append(self.loss(y_pred, y_true))
            else:
                sp = jnp.stack([gaussian_filter(p, s) for p in y_pred])
                st = jnp.stack([gaussian_filter(t, s) for t in y_true])
                losses.append(self.loss(sp, st))
        loss = jnp.stack([jnp.asarray(l) for l in losses])
        return _reduce(loss, self.reduction)


class MaskedLoss:
    """Mask both args before the wrapped loss (reference: monai/losses/spatial_mask.py:—)."""

    def __init__(self, loss, *loss_args, **loss_kwargs):
        self.loss = loss(*loss_args, **loss_kwargs) if isinstance(loss, type) else loss

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None):
        if mask is None:
            return self.loss(input, target)
        return self.loss(input * mask, target * mask)


class DeepSupervisionLoss:
    """Weighted loss over deep-supervision heads (reference: monai/losses/ds_loss.py:21)."""

    def __init__(self, loss, weight_mode: str = "exp", weights: Sequence[float] | None = None):
        self.loss = loss
        self.weight_mode = weight_mode
        self.weights = weights

    def get_weights(self, levels: int = 1) -> list[float]:
        levels = max(1, levels)
        if self.weights is not None and len(self.weights) >= levels:
            return list(self.weights[:levels])
        if self.weight_mode == "same":
            return [1.0] * levels
        if self.weight_mode == "exp":
            return [max(0.5**l, 0.0625) for l in range(levels)]
        if self.weight_mode == "two":
            return [1.0 if l == 0 else 0.5 for l in range(levels)]
        return [1.0] * levels

    def get_loss(self, input: jnp.ndarray, target: jnp.ndarray):
        if input.shape[2:] != target.shape[2:]:
            # interpolate target to input size (nearest)
            target = jax.image.resize(target, target.shape[:2] + input.shape[2:], method="nearest")
        return self.loss(input, target)

    def __call__(self, input, target: jnp.ndarray):
        if isinstance(input, (list, tuple)):
            weights = self.get_weights(levels=len(input))
            loss = 0.0
            for l, w in enumerate(weights):
                loss = loss + w * self.get_loss(input[l].astype(jnp.float32), target)
            return loss
        return self.loss(input.astype(jnp.float32), target)


class SSIMLoss:
    """1 - SSIM (reference: monai/losses/ssim_loss.py)."""

    def __init__(self, spatial_dims: int, data_range: float = 1.0, kernel_type: str = "gaussian",
                 win_size: int = 11, kernel_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
                 reduction: str = LossReduction.MEAN):
        self.spatial_dims = spatial_dims
        self.data_range = data_range
        self.kernel_type = str(kernel_type)
        self.win_size = win_size
        self.kernel_sigma = kernel_sigma
        self.k1, self.k2 = k1, k2
        self.reduction = look_up_option(str(reduction), LossReduction)

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        # same VALID-window SSIM as the metric (validated vs the reference's
        # conv-without-padding kernels, see metrics/regression.py)
        import numpy as np

        from ..metrics.regression import _ssim_filter_valid

        c1 = (self.k1 * self.data_range) ** 2
        c2 = (self.k2 * self.data_range) ** 2
        x = np.asarray(input).astype(np.float64)
        y = np.asarray(target).astype(np.float64)

        def filt(v):
            return _ssim_filter_valid(v, self.win_size, self.kernel_sigma, self.kernel_type)

        mu_x, mu_y = filt(x), filt(y)
        mu_xx, mu_yy, mu_xy = filt(x * x), filt(y * y), filt(x * y)
        sigma_x = mu_xx - mu_x * mu_x
        sigma_y = mu_yy - mu_y * mu_y
        sigma_xy = mu_xy - mu_x * mu_y
        num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
        den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
        ssim = jnp.asarray((num / den).astype(np.float32))
        return _reduce(1.0 - ssim, self.reduction)


def _soft_erode(img: jnp.ndarray) -> jnp.ndarray:
    """min-pool with 3-window per axis (reference: cldice.py soft_erode)."""
    sd = img.ndim - 2
    outs = []
    for d in range(sd):
        pads = [(0, 0), (0, 0)] + [(1, 1) if i == d else (0, 0) for i in range(sd)]
        padded = jnp.pad(img, pads, mode="edge")
        window = [1, 1] + [3 if i == d else 1 for i in range(sd)]
        outs.append(-jax.lax.reduce_window(-padded, -jnp.inf, jax.lax.max, window, [1] * img.ndim, "VALID"))
    out = outs[0]
    for o in outs[1:]:
        out = jnp.minimum(out, o)
    return out


def _soft_dilate(img: jnp.ndarray) -> jnp.ndarray:
    sd = img.ndim - 2
    window = [1, 1] + [3] * sd
    padded = jnp.pad(img, [(0, 0), (0, 0)] + [(1, 1)] * sd, mode="edge")
    return jax.lax.reduce_window(padded, -jnp.inf, jax.lax.max, window, [1] * img.ndim, "VALID")


def _soft_open(img):
    return _soft_dilate(_soft_erode(img))


def soft_skel(img: jnp.ndarray, iter_: int) -> jnp.ndarray:
    """Soft skeletonization (reference: cldice.py soft_skel)."""
    img1 = _soft_open(img)
    skel = jax.nn.relu(img - img1)
    for _ in range(iter_):
        img = _soft_erode(img)
        img1 = _soft_open(img)
        delta = jax.nn.relu(img - img1)
        skel = skel + jax.nn.relu(delta - skel * delta)
    return skel


class SoftclDiceLoss:
    """centerline dice (reference: monai/losses/cldice.py:—)."""

    def __init__(self, iter_: int = 3, smooth: float = 1.0):
        self.iter = iter_
        self.smooth = smooth

    def __call__(self, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        # reference signature is (y_true, y_pred), and channel 0 (background) is
        # EXCLUDED from the skeleton overlap sums (cldice.py:139-144)
        skel_pred = soft_skel(y_pred, self.iter)
        skel_true = soft_skel(y_true, self.iter)
        tprec = (jnp.sum((skel_pred * y_true)[:, 1:]) + self.smooth) / (
            jnp.sum(skel_pred[:, 1:]) + self.smooth)
        tsens = (jnp.sum((skel_true * y_pred)[:, 1:]) + self.smooth) / (
            jnp.sum(skel_true[:, 1:]) + self.smooth)
        return 1.0 - 2.0 * (tprec * tsens) / (tprec + tsens)


class SoftDiceclDiceLoss:
    """dice + clDice (reference: cldice.py SoftDiceclDiceLoss)."""

    def __init__(self, iter_: int = 3, alpha: float = 0.5, smooth: float = 1.0):
        self.iter = iter_
        self.smooth = smooth
        self.alpha = alpha
        self.cldice = SoftclDiceLoss(iter_, smooth)

    def __call__(self, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        # reference signature (y_true, y_pred), cldice.py:172
        intersection = jnp.sum(y_pred * y_true)
        dice = 1 - (2 * intersection + self.smooth) / (jnp.sum(y_pred) + jnp.sum(y_true) + self.smooth)
        cl = self.cldice(y_true, y_pred)
        return (1.0 - self.alpha) * dice + self.alpha * cl


class HausdorffDTLoss:
    """Hausdorff loss via distance-transform weighting (reference: monai/losses/hausdorff_loss.py:30).

    The EDT runs on host (pure_callback) — gradients flow through the prediction term
    only, matching the reference (distance maps are detached there too).
    """

    def __init__(self, alpha: float = 2.0, include_background: bool = False, to_onehot_y: bool = False,
                 sigmoid: bool = False, softmax: bool = False, other_act=None, reduction: str = "mean",
                 batch: bool = False):
        self.alpha = alpha
        self.include_background = include_background
        self.to_onehot_y = to_onehot_y
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.other_act = other_act
        self.reduction = reduction
        self.batch = batch

    def _distance_field(self, img: jnp.ndarray) -> jnp.ndarray:
        import numpy as np

        def _edt(arr):
            from scipy.ndimage import distance_transform_edt as edt

            arr = np.asarray(arr)
            field = np.zeros_like(arr, dtype=np.float32)
            for b in range(arr.shape[0]):
                fg = arr[b] > 0.5
                if fg.any() and not fg.all():
                    field[b] = edt(fg) + edt(~fg)
            return field

        return jax.pure_callback(_edt, jax.ShapeDtypeStruct(img.shape, jnp.float32), img,
                                 vmap_method="sequential")

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
        all_losses = []
        for i in range(input.shape[1]):
            ch_input = input[:, [i]]
            ch_target = target[:, [i]]
            pred_dt = jax.lax.stop_gradient(self._distance_field(ch_input[:, 0]))[:, None]
            target_dt = jax.lax.stop_gradient(self._distance_field(ch_target[:, 0].astype(jnp.float32)))[:, None]
            pred_error = (ch_input - ch_target) ** 2
            distance = pred_dt**self.alpha + target_dt**self.alpha
            dt_field = pred_error * distance
            all_losses.append(jnp.mean(dt_field, axis=tuple(range(1, dt_field.ndim))))
        loss = jnp.stack(all_losses, axis=1)
        return _reduce(loss, self.reduction)


class LogHausdorffDTLoss(HausdorffDTLoss):
    """log(HausdorffDTLoss + 1) (reference: hausdorff_loss.py:213)."""

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return jnp.log(super().__call__(input, target) + 1.0)


class AsymmetricUnifiedFocalLoss:
    """Unified focal loss (reference: monai/losses/unified_focal_loss.py:145)."""

    def __init__(self, to_onehot_y: bool = False, num_classes: int = 2, weight: float = 0.5,
                 gamma: float = 0.5, delta: float = 0.7, reduction: str = LossReduction.MEAN):
        self.to_onehot_y = to_onehot_y
        self.num_classes = num_classes
        self.gamma = gamma
        self.delta = delta
        self.weight = weight

    def _asym_focal(self, y_pred, y_true):
        n = y_pred.shape[1]
        axis = list(range(2, y_pred.ndim))
        ce = -y_true * jnp.log(jnp.clip(y_pred, 1e-7, 1.0))
        back_ce = (1 - y_pred[:, 0]) ** self.gamma * ce[:, 0] * (1 - self.delta)
        fore_ce = ce[:, 1] * self.delta
        return jnp.mean(jnp.sum(jnp.stack([back_ce, fore_ce], axis=1), axis=1))

    def _asym_focal_tversky(self, y_pred, y_true):
        axis = tuple(range(2, y_pred.ndim))
        epsilon = 1e-7
        tp = jnp.sum(y_true * y_pred, axis=axis)
        fn = jnp.sum(y_true * (1 - y_pred), axis=axis)
        fp = jnp.sum((1 - y_true) * y_pred, axis=axis)
        dice = (tp + epsilon) / (tp + self.delta * fn + (1 - self.delta) * fp + epsilon)
        back_dice = 1 - dice[:, 0]
        fore_dice = (1 - dice[:, 1]) * jnp.abs(1 - dice[:, 1]) ** (-self.gamma)
        return jnp.mean(jnp.stack([back_dice, fore_dice], axis=-1))

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        if y_pred.ndim not in (4, 5):
            raise ValueError(f"input shape must be 4 or 5, but got {y_pred.shape}")
        if len(y_pred.shape) == 4:
            pass
        if self.to_onehot_y:
            y_true = one_hot(y_true, num_classes=self.num_classes, dim=1)
        if y_true.shape != y_pred.shape:
            raise ValueError(f"ground truth has different shape ({y_true.shape}) from input ({y_pred.shape})")
        asy_focal_loss = self._asym_focal(y_pred, y_true)
        asy_focal_tversky_loss = self._asym_focal_tversky(y_pred, y_true)
        return self.weight * asy_focal_loss + (1 - self.weight) * asy_focal_tversky_loss


class AsymmetricFocalLoss:
    """Asymmetric focal CE component (reference: unified_focal_loss.py:81
    AsymmetricFocalLoss): background channel gets the focal modulation, foreground the
    delta weight."""

    def __init__(self, to_onehot_y: bool = False, gamma: float = 2.0, delta: float = 0.7,
                 reduction: str = LossReduction.MEAN):
        self.to_onehot_y = to_onehot_y
        self.gamma = gamma
        self.delta = delta
        self.reduction = reduction

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        n = y_pred.shape[1]
        if self.to_onehot_y:
            y_true = one_hot(y_true, num_classes=n, dim=1)
        ce = -y_true * jnp.log(jnp.clip(y_pred, 1e-7, 1.0))
        back = (1 - y_pred[:, 0]) ** self.gamma * ce[:, 0] * (1 - self.delta)
        fore = ce[:, 1] * self.delta
        loss = jnp.mean(jnp.sum(jnp.stack([back, fore], axis=1), axis=1))
        return loss


class AsymmetricFocalTverskyLoss:
    """Asymmetric focal Tversky component (reference: unified_focal_loss.py:25)."""

    def __init__(self, to_onehot_y: bool = False, gamma: float = 0.75, delta: float = 0.7,
                 reduction: str = LossReduction.MEAN):
        self.to_onehot_y = to_onehot_y
        self.gamma = gamma
        self.delta = delta
        self.reduction = reduction

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        n = y_pred.shape[1]
        if self.to_onehot_y:
            y_true = one_hot(y_true, num_classes=n, dim=1)
        axis = tuple(range(2, y_pred.ndim))
        eps = 1e-7
        tp = jnp.sum(y_true * y_pred, axis=axis)
        fn = jnp.sum(y_true * (1 - y_pred), axis=axis)
        fp = jnp.sum((1 - y_true) * y_pred, axis=axis)
        dice = (tp + eps) / (tp + self.delta * fn + (1 - self.delta) * fp + eps)
        back = 1 - dice[:, 0]
        fore = (1 - dice[:, 1]) * jnp.abs(1 - dice[:, 1]) ** (-self.gamma)
        return jnp.mean(jnp.stack([back, fore], axis=-1))


# public functional aliases (reference: cldice.py soft_erode/soft_dilate/soft_open/soft_dice,
# deform.py spatial_gradient)
soft_erode = _soft_erode
soft_dilate = _soft_dilate
soft_open = _soft_open
spatial_gradient = _spatial_gradient


def soft_dice(y_true: jnp.ndarray, y_pred: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Soft dice over non-background channels (reference: cldice.py:95)."""
    intersection = jnp.sum((y_true * y_pred)[:, 1:])
    coeff = (2.0 * intersection + smooth) / (jnp.sum(y_true[:, 1:]) + jnp.sum(y_pred[:, 1:]) + smooth)
    return 1.0 - coeff


class CrossEntropyLoss:
    """Softmax cross-entropy over class logits, the classification-bundle loss
    (the reference's configs use ``torch.nn.CrossEntropyLoss``; this is the jax
    equivalent with the same integer-target or one-hot-target semantics).
    """

    def __init__(self, weight=None, reduction: str = "mean", label_smoothing: float = 0.0):
        self.weight = None if weight is None else jnp.asarray(weight)
        self.reduction = reduction
        self.label_smoothing = float(label_smoothing)

    def __call__(self, input, target):
        logits = jnp.asarray(input)
        target = jnp.asarray(target)
        n_cls = logits.shape[1]
        logp = jax.nn.log_softmax(logits, axis=1)
        if target.ndim == logits.ndim - 1 or (target.ndim == logits.ndim and target.shape[1] == 1):
            tgt = target.reshape(target.shape[0], *target.shape[2:]) if target.ndim == logits.ndim else target
            onehot = jax.nn.one_hot(tgt.astype(jnp.int32), n_cls, axis=1)
        else:
            onehot = target.astype(logp.dtype)
        if self.label_smoothing > 0:
            onehot = onehot * (1 - self.label_smoothing) + self.label_smoothing / n_cls
        nll = -(onehot * logp)
        if self.weight is not None:
            wshape = [1, n_cls] + [1] * (logits.ndim - 2)
            nll = nll * self.weight.reshape(wshape)
        loss = nll.sum(axis=1)
        if self.reduction == "mean":
            if self.weight is not None:
                denom = (onehot * self.weight.reshape(wshape)).sum(axis=1)
                return loss.sum() / jnp.maximum(denom.sum(), 1e-8)
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        return loss


# public reference-named forms of the clDice soft morphology (reference:
# monai/losses/cldice.py soft_erode:20, soft_dilate:48, soft_open:73, soft_dice:95)
soft_erode = _soft_erode
soft_dilate = _soft_dilate
soft_open = _soft_open


def soft_dice(y_true, y_pred, smooth: float = 1.0):
    """Soft dice loss over non-background channels (reference: cldice.py:95)."""
    intersection = jnp.sum((y_true * y_pred)[:, 1:, ...])
    coeff = (2.0 * intersection + smooth) / (jnp.sum(y_true[:, 1:, ...])
                                             + jnp.sum(y_pred[:, 1:, ...]) + smooth)
    return 1.0 - coeff


def spatial_gradient(x, dim: int):
    """Central finite difference along ``dim`` of a BCH(WD) array (reference:
    deform.py:20)."""
    return _spatial_gradient(x, dim)
