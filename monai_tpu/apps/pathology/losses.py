"""HoVerNet training loss (reference: monai/apps/pathology/losses/hovernet_loss.py:24).

Weighted sum of the three branch losses:
  NP (nucleus prediction): Dice + cross-entropy,
  HV (horizontal/vertical centroid distance): MSE + focus-masked MSE of the Sobel
  gradients (horizontal gradient of channel 0, vertical gradient of channel 1),
  NC (nuclear class, optional): Dice + cross-entropy.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...losses.dice import DiceLoss
from ...losses.other import CrossEntropyLoss
from ...transforms.post_array import SobelGradients
from ...utils.enums import HoVerNetBranch

__all__ = ["HoVerNetLoss"]


class HoVerNetLoss:
    """Combined three-branch HoVerNet loss
    (reference: apps/pathology/losses/hovernet_loss.py:24)."""

    def __init__(self, lambda_hv_mse: float = 2.0, lambda_hv_mse_grad: float = 1.0,
                 lambda_np_ce: float = 1.0, lambda_np_dice: float = 1.0,
                 lambda_nc_ce: float = 1.0, lambda_nc_dice: float = 1.0) -> None:
        self.lambda_hv_mse = lambda_hv_mse
        self.lambda_hv_mse_grad = lambda_hv_mse_grad
        self.lambda_np_ce = lambda_np_ce
        self.lambda_np_dice = lambda_np_dice
        self.lambda_nc_ce = lambda_nc_ce
        self.lambda_nc_dice = lambda_nc_dice
        self.dice = DiceLoss(softmax=True, smooth_dr=1e-03, smooth_nr=1e-03, reduction="sum",
                             batch=True)
        self.ce = CrossEntropyLoss(reduction="mean")
        # horizontal gradient of the horizontal map, vertical of the vertical map
        self.sobel_v = SobelGradients(kernel_size=5, spatial_axes=0)
        self.sobel_h = SobelGradients(kernel_size=5, spatial_axes=1)

    def _compute_sobel(self, image: jnp.ndarray) -> jnp.ndarray:
        """(B, 2, H, W) HV map -> (B, 2, H, W) of (h-grad of ch0, v-grad of ch1)."""
        result_h = self.sobel_h(image[:, 0])
        result_v = self.sobel_v(image[:, 1])
        return jnp.stack([jnp.asarray(result_h), jnp.asarray(result_v)], axis=1)

    def _mse_gradient_loss(self, prediction: jnp.ndarray, target: jnp.ndarray,
                           focus: jnp.ndarray) -> jnp.ndarray:
        pred_grad = self._compute_sobel(prediction)
        true_grad = self._compute_sobel(target)
        loss = pred_grad - true_grad
        focus = jnp.concatenate([focus[:, None], focus[:, None]], axis=1)
        loss = focus * (loss * loss)
        return loss.sum() / (focus.sum() + 1.0e-8)

    def __call__(self, prediction: dict, target: dict) -> jnp.ndarray:
        np_key, hv_key, nc_key = (HoVerNetBranch.NP.value, HoVerNetBranch.HV.value,
                                  HoVerNetBranch.NC.value)
        for d, name in ((prediction, "prediction"), (target, "target")):
            if np_key not in d or hv_key not in d:
                raise ValueError(
                    "nucleus prediction (NP) and horizontal_vertical (HV) branches must be "
                    f"present for prediction and target parameters (missing in {name})")
        if (nc_key in prediction) != (nc_key in target):
            raise ValueError(
                "type_prediction (NC) must be present in both or neither of the "
                "prediction and target parameters")

        pred_np = jnp.asarray(prediction[np_key])
        tgt_np = jnp.asarray(target[np_key])
        dice_loss_np = self.dice(pred_np, tgt_np) * self.lambda_np_dice
        ce_loss_np = self.ce(pred_np, jnp.argmax(tgt_np, axis=1)) * self.lambda_np_ce
        loss_np = dice_loss_np + ce_loss_np

        pred_hv = jnp.asarray(prediction[hv_key])
        tgt_hv = jnp.asarray(target[hv_key])
        loss_hv_mse = jnp.mean((pred_hv - tgt_hv) ** 2) * self.lambda_hv_mse
        # foreground-nucleus channel of the NP target is the gradient-loss focus mask
        loss_hv_mse_grad = self._mse_gradient_loss(pred_hv, tgt_hv,
                                                   tgt_np[:, 1]) * self.lambda_hv_mse_grad
        loss_hv = loss_hv_mse_grad + loss_hv_mse

        loss_nc = 0.0
        if nc_key in prediction:
            pred_nc = jnp.asarray(prediction[nc_key])
            tgt_nc = jnp.asarray(target[nc_key])
            dice_loss_nc = self.dice(pred_nc, tgt_nc) * self.lambda_nc_dice
            ce_loss_nc = self.ce(pred_nc, jnp.argmax(tgt_nc, axis=1)) * self.lambda_nc_ce
            loss_nc = dice_loss_nc + ce_loss_nc

        return loss_hv + loss_np + loss_nc
