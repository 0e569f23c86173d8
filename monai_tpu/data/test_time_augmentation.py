"""Test-time augmentation (reference: monai/data/test_time_augmentation.py:50)."""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

from ..transforms.compose import Compose
from ..transforms.dictionary import Invertd
from ..transforms.transform import Randomizable
from ..utils.backend import to_numpy
from ..utils.enums import CommonKeys
from .dataloader import DataLoader
from .dataset import Dataset
from .meta_image import MetaImage
from .utils import decollate_batch, list_data_collate

__all__ = ["TestTimeAugmentation"]


def _identity(x):
    return x


class TestTimeAugmentation:
    """Run random transforms N times, infer, invert, aggregate
    (reference: test_time_augmentation.py:50).

    Returns (mode, mean, std, vvc) like the reference.
    """

    def __init__(self, transform, batch_size: int, num_workers: int = 0,
                 inferrer_fn: Callable = _identity, device=None, image_key=CommonKeys.IMAGE,
                 orig_key=CommonKeys.LABEL, nearest_interp: bool = True, orig_meta_keys=None,
                 meta_key_postfix="meta_dict", to_tensor: bool = True, output_device=None,
                 post_func: Callable = _identity, return_full_data: bool = False,
                 progress: bool = False):
        self.transform = transform
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.inferrer_fn = inferrer_fn
        self.image_key = image_key
        self.orig_key = orig_key
        self.nearest_interp = nearest_interp
        self.return_full_data = return_full_data
        self.progress = progress
        self._check_transforms()

    def _check_transforms(self):
        """Warn if the transform chain has no random (or non-invertible random) parts."""
        import warnings

        ts = [self.transform] if not isinstance(self.transform, Compose) else self.transform.transforms
        randoms = np.array([isinstance(t, Randomizable) for t in ts])
        if sum(randoms) == 0:
            warnings.warn("TTA usually has at least one random transform in the pipeline.")

    def __call__(self, data: dict[str, Any], num_examples: int = 10):
        if num_examples < 1:
            raise ValueError("num_examples should be multiple of batch size.")
        ds = Dataset([dict(data) for _ in range(num_examples)], self.transform)
        loader = DataLoader(ds, batch_size=self.batch_size, num_workers=self.num_workers)
        inverter = Invertd(keys=CommonKeys.PRED, transform=self.transform, orig_keys=self.image_key,
                           nearest_interp=self.nearest_interp)
        outs: list[np.ndarray] = []
        for b in loader:
            batch_images = b[self.image_key]
            import jax.numpy as jnp

            preds = self.inferrer_fn(jnp.asarray(to_numpy(batch_images.data
                                                          if isinstance(batch_images, MetaImage)
                                                          else batch_images)))
            b[CommonKeys.PRED] = MetaImage(np.asarray(to_numpy(preds)))
            samples = decollate_batch(b)
            for s in samples:
                # graft op trace from the transformed image for inversion
                inv = inverter(s)
                outs.append(to_numpy(inv[CommonKeys.PRED].data
                                     if isinstance(inv[CommonKeys.PRED], MetaImage)
                                     else inv[CommonKeys.PRED]))
        full = np.stack(outs)
        if self.return_full_data:
            return full
        from scipy import stats

        mode = np.asarray(stats.mode(full, axis=0, keepdims=False).mode)
        mean = full.mean(0)
        std = full.std(0)
        vvc = float(full.std() / (full.mean() + 1e-12))
        return mode, mean, std, vvc
