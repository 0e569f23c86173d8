"""k-space under-sampling masks for accelerated MRI
(reference: monai/apps/reconstruction/transforms/array.py:29 KspaceMask,
:107 RandomKspaceMask, :196 EquispacedKspaceMask)."""
from __future__ import annotations

from abc import abstractmethod
from collections.abc import Sequence

import numpy as np
import jax.numpy as jnp

from ....data.fft_utils import ifftn_centered
from ....transforms.transform import RandomizableTransform
from ....utils.backend import to_jax
from ..complex_utils import complex_abs, convert_to_tensor_complex
from ..mri_utils import root_sum_of_squares

__all__ = ["KspaceMask", "RandomKspaceMask", "EquispacedKspaceMask"]


class KspaceMask(RandomizableTransform):
    """Base under-sampling mask generator (reference: recon transforms/array.py:29)."""

    def __init__(self, center_fractions: Sequence[float], accelerations: Sequence[float],
                 spatial_dims: int = 2, is_complex: bool = True):
        if len(center_fractions) != len(accelerations):
            raise ValueError("Number of center fractions should match number of "
                             "accelerations.")
        self.center_fractions = center_fractions
        self.accelerations = accelerations
        self.spatial_dims = spatial_dims
        self.is_complex = is_complex
        self.mask = None

    @abstractmethod
    def __call__(self, kspace):
        raise NotImplementedError

    def randomize_choose_acceleration(self):
        choice = self.R.randint(0, len(self.accelerations))
        return self.center_fractions[choice], self.accelerations[choice]

    def _apply_mask(self, kspace, mask_1d: np.ndarray):
        k = to_jax(convert_to_tensor_complex(kspace))
        shape = k.shape
        mask_shape = [1] * len(shape)
        axis = -2 if self.is_complex else -1
        mask_shape[axis] = shape[axis]
        mask = jnp.asarray(mask_1d.reshape(mask_shape), jnp.float32)
        masked = mask * k
        self.mask = mask
        ifft = complex_abs(ifftn_centered(masked, spatial_dims=self.spatial_dims,
                                          is_complex=self.is_complex))
        rss = root_sum_of_squares(ifft, spatial_dim=-self.spatial_dims - 1)
        return masked, rss


class RandomKspaceMask(KspaceMask):
    """Uniform-random column selection with a dense low-frequency center
    (reference: recon transforms/array.py:107)."""

    def __call__(self, kspace):
        k = convert_to_tensor_complex(kspace)
        shape = k.shape
        num_cols = shape[-2] if self.is_complex else shape[-1]
        center_fraction, acceleration = self.randomize_choose_acceleration()
        num_low = int(round(num_cols * center_fraction))
        prob = (num_cols / acceleration - num_low) / (num_cols - num_low)
        mask = self.R.uniform(size=num_cols) < prob
        pad = (num_cols - num_low + 1) // 2
        mask[pad:pad + num_low] = True
        return self._apply_mask(kspace, mask.astype(np.float32))


class EquispacedKspaceMask(KspaceMask):
    """Equi-distant column selection with a dense low-frequency center
    (reference: recon transforms/array.py:196)."""

    def __call__(self, kspace):
        k = convert_to_tensor_complex(kspace)
        shape = k.shape
        num_cols = shape[-2] if self.is_complex else shape[-1]
        center_fraction, acceleration = self.randomize_choose_acceleration()
        num_low = int(round(num_cols * center_fraction))
        mask = np.zeros(num_cols, dtype=np.float32)
        pad = (num_cols - num_low + 1) // 2
        mask[pad:pad + num_low] = 1.0
        adjusted = (acceleration * (num_low - num_cols)) / (num_low * acceleration - num_cols)
        offset = self.R.randint(0, round(adjusted))
        accel_samples = np.arange(offset, num_cols - 1, adjusted)
        accel_samples = np.around(accel_samples).astype(np.uint32)
        mask[accel_samples] = 1.0
        return self._apply_mask(kspace, mask)
