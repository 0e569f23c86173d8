"""Multiple-instance learning model (reference: monai/networks/nets/milmodel.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["MILModel"]


class MILModel(nnx.Module):
    """Bag-of-patches classification with attention pooling (reference: milmodel.py).

    mil_mode: mean / max / att / att_trans.
    """

    def __init__(self, num_classes: int, mil_mode: str = "att", pretrained: bool = True,
                 backbone=None, backbone_num_features: int | None = None,
                 trans_blocks: int = 4, trans_dropout: float = 0.0, *, rngs: nnx.Rngs):
        if num_classes <= 0:
            raise ValueError("Number of classes must be positive: " + str(num_classes))
        if mil_mode.lower() not in ("mean", "max", "att", "att_trans"):
            raise ValueError("Unsupported mil_mode: " + str(mil_mode))
        self.mil_mode = mil_mode.lower()
        if backbone is None:
            from .resnet import resnet18

            self.net = resnet18(spatial_dims=2, n_input_channels=3, num_classes=1,
                                feed_forward=False, rngs=rngs)
            nfc = 512
        else:
            self.net = backbone
            if backbone_num_features is None:
                raise ValueError("backbone_num_features is required when a custom backbone is given.")
            nfc = backbone_num_features
        self.nfc = nfc
        if self.mil_mode in ("att", "att_trans"):
            self.attention_fc1 = nnx.Linear(nfc, 2048, rngs=rngs)
            self.attention_fc2 = nnx.Linear(2048, 1, rngs=rngs)
        if self.mil_mode == "att_trans":
            from ..blocks.attention import TransformerBlock

            self.transformer = nnx.List([
                TransformerBlock(nfc, nfc * 4, 8, trans_dropout, rngs=rngs)
                for _ in range(trans_blocks)])
        self.myfc = nnx.Linear(nfc, num_classes, rngs=rngs)

    def calc_head(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, N_instances, F) → (B, classes)."""
        if self.mil_mode == "mean":
            return self.myfc(x).mean(axis=1)
        if self.mil_mode == "max":
            return self.myfc(x).max(axis=1)
        if self.mil_mode == "att_trans":
            for blk in self.transformer:
                x = blk(x)
        a = self.attention_fc2(jnp.tanh(self.attention_fc1(x)))  # (B, N, 1)
        a = jax.nn.softmax(a, axis=1)
        pooled = (a * x).sum(axis=1)
        return self.myfc(pooled)

    def __call__(self, x: jnp.ndarray, no_head: bool = False) -> jnp.ndarray:
        """x: (B, N_instances, C, H, W)."""
        b, n = x.shape[:2]
        flat = x.reshape((b * n,) + x.shape[2:])
        feats = self.net(flat)
        feats = feats.reshape(b, n, -1)
        if no_head:
            return feats
        return self.calc_head(feats)
