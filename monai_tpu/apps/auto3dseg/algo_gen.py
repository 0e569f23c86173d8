"""Algo / AlgoGen / BundleAlgo for Auto3DSeg.

Parity targets: monai/auto3dseg/algo_gen.py (Algo/AlgoGen ABC) and
monai/apps/auto3dseg/bundle_gen.py (BundleAlgo — config templates filled from data
stats).  The reference downloads algorithm-template bundles; here a built-in
segmentation template (UNet / SegResNet) is generated from the data statistics.
"""
from __future__ import annotations

import json
import os
import pickle
from copy import deepcopy
from typing import Any

import numpy as np

__all__ = ["Algo", "AlgoGen", "SegAlgo"]


class Algo:
    """Algorithm lifecycle (reference: algo_gen.py Algo)."""

    def set_data_stats(self, *args, **kwargs):
        pass

    def train(self, params: dict):
        raise NotImplementedError

    def get_score(self, *args, **kwargs):
        raise NotImplementedError

    def get_inferer(self, *args, **kwargs):
        raise NotImplementedError

    def get_output_path(self, *args, **kwargs):
        raise NotImplementedError

    def predict(self, params: dict):
        raise NotImplementedError


class AlgoGen(Algo):
    """Algorithm generator (reference: algo_gen.py AlgoGen)."""

    def set_data_source(self, *args, **kwargs):
        pass

    def generate(self, *args, **kwargs):
        pass

    def run_algo(self, *args, **kwargs):
        pass


class SegAlgo(Algo):
    """A self-contained trainable segmentation algorithm built from data stats.

    Plays the role of the reference's template-downloaded BundleAlgo (bundle_gen.py)
    with an in-repo template: spacing/intensity normalization from stats + UNet or
    SegResNet at a size chosen from the median shape.
    """

    def __init__(self, name: str, network: str, output_path: str, data_stats: dict | None = None,
                 datalist: list | None = None, roi_size=(96, 96, 96), max_epochs: int = 100,
                 lr: float = 1e-3):
        self.name = name
        self.network_name = network
        self.output_path = output_path
        self.data_stats = data_stats or {}
        self.datalist = datalist or []
        self.roi_size = tuple(roi_size)
        self.max_epochs = max_epochs
        self.lr = lr
        self.best_metric: float = -1.0
        self._net = None
        self._state = None

    # -- template synthesis ---------------------------------------------------
    def _num_classes(self) -> int:
        labels = self.data_stats.get("stats_summary", {}).get("label_stats", {}).get("labels", [0, 1])
        return max(2, len(labels))

    def _intensity_bounds(self):
        s = self.data_stats.get("stats_summary", {}).get("image_stats", {}).get("intensity", {})
        return s.get("mean", 0.0), max(s.get("std", 1.0), 1e-3)

    def build_network(self):
        from flax import nnx

        n_cls = self._num_classes()
        if self.network_name == "segresnet":
            from ...networks.nets import SegResNet

            self._net = SegResNet(spatial_dims=3, init_filters=16, in_channels=1, out_channels=n_cls,
                                  rngs=nnx.Rngs(0))
        else:
            from ...networks.nets import UNet

            self._net = UNet(spatial_dims=3, in_channels=1, out_channels=n_cls,
                             channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
                             rngs=nnx.Rngs(0))
        return self._net

    def get_transforms(self, keys=("image", "label")):
        from ...transforms import (
            Compose,
            EnsureChannelFirstd,
            LoadImaged,
            NormalizeIntensityd,
            Orientationd,
            RandCropByPosNegLabeld,
            RandFlipd,
            Spacingd,
        )

        spacing = self.data_stats.get("stats_summary", {}).get("image_stats", {}).get(
            "spacing", {}).get("median", [1.0, 1.0, 1.0])
        return Compose([
            LoadImaged(keys=list(keys)),
            EnsureChannelFirstd(keys=list(keys), channel_dim="no_channel"),
            Orientationd(keys=list(keys), axcodes="RAS"),
            Spacingd(keys=list(keys), pixdim=tuple(spacing), mode=["bilinear", "nearest"][:len(keys)]),
            NormalizeIntensityd(keys=keys[0], nonzero=True),
            RandCropByPosNegLabeld(keys=list(keys), label_key=keys[-1], spatial_size=self.roi_size,
                                   pos=1, neg=1, num_samples=2),
            RandFlipd(keys=list(keys), prob=0.5, spatial_axis=0),
        ])

    # -- lifecycle -------------------------------------------------------------
    def set_data_stats(self, data_stats: dict | str) -> None:
        if isinstance(data_stats, str):
            with open(data_stats) as f:
                data_stats = json.load(f) if data_stats.endswith(".json") else __import__("yaml").safe_load(f)
        self.data_stats = data_stats

    def train(self, params: dict | None = None) -> dict:
        """Run training with the synthesized pipeline (reference: bundle_gen.py train)."""
        import jax.numpy as jnp
        import optax
        from flax import nnx

        from ...data import DataLoader, Dataset
        from ...losses import DiceCELoss

        params = params or {}
        max_epochs = params.get("max_epochs", self.max_epochs)
        net = self.build_network()
        optimizer = nnx.Optimizer(net, optax.adamw(params.get("lr", self.lr)), wrt=nnx.Param)
        loss_fn = DiceCELoss(to_onehot_y=True, softmax=True)

        @nnx.jit
        def step(model, opt, x, y):
            def loss_of(m):
                return loss_fn(m(x), y)

            loss, grads = nnx.value_and_grad(loss_of)(model)
            opt.update(model, grads)
            return loss

        ds = Dataset(self.datalist, self.get_transforms())
        loader = DataLoader(ds, batch_size=params.get("batch_size", 2), shuffle=True)
        history = []
        for _epoch in range(max_epochs):
            for batch in loader:
                loss = step(net, optimizer, jnp.asarray(batch["image"].data),
                            jnp.asarray(batch["label"].data))
                history.append(float(loss))
        os.makedirs(self.output_path, exist_ok=True)
        from ...handlers.checkpoint import save_checkpoint

        save_checkpoint({"model": net}, os.path.join(self.output_path, "model"))
        result = {"loss_history": history, "best_metric": -history[-1] if history else -1.0}
        self.best_metric = result["best_metric"]
        with open(os.path.join(self.output_path, "result.json"), "w") as f:
            json.dump({"best_metric": self.best_metric}, f)
        return result

    def get_score(self, *args, **kwargs) -> float:
        return self.best_metric

    def get_output_path(self) -> str:
        return self.output_path

    def get_inferer(self, roi_size=None, sw_batch_size: int = 4, overlap: float = 0.25):
        from ...inferers import SlidingWindowInferer

        return SlidingWindowInferer(roi_size=roi_size or self.roi_size, sw_batch_size=sw_batch_size,
                                    overlap=overlap, mode="gaussian")

    def predict(self, params: dict) -> Any:
        import jax
        from flax import nnx

        files = params.get("files", [])
        net = self._net or self.build_network()
        graphdef, state = nnx.split(net)

        @jax.jit
        def fwd(state, x):
            return nnx.merge(graphdef, state)(x)

        inferer = self.get_inferer()
        from ...transforms import Compose, EnsureChannelFirstd, LoadImaged, NormalizeIntensityd, Orientationd
        import jax.numpy as jnp

        xform = Compose([
            LoadImaged(keys=["image"]),
            EnsureChannelFirstd(keys=["image"], channel_dim="no_channel"),
            Orientationd(keys=["image"], axcodes="RAS"),
            NormalizeIntensityd(keys="image", nonzero=True),
        ])
        preds = []
        for f in files:
            d = xform({"image": f})
            x = jnp.asarray(d["image"].data)[None]
            preds.append(np.asarray(inferer(x, lambda w: fwd(state, w))))
        return preds


