"""Occlusion sensitivity (reference: monai/visualize/occlusion_sensitivity.py:27)."""
from __future__ import annotations

from collections.abc import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from ..utils.misc import ensure_tuple_rep

__all__ = ["OcclusionSensitivity"]


class OcclusionSensitivity:
    """Slide an occluding patch over the image and record the change in the model's
    class score (reference: occlusion_sensitivity.py:27).

    ``nn_module`` is any callable (B, C, *spatial) → (B, classes).
    """

    def __init__(self, nn_module: Callable, mask_size: int | Sequence[int] = 16, n_batch: int = 16,
                 verbose: bool = True, mode: str = "gaussian", overlap: float = 0.25,
                 activate: bool | Callable = True):
        self.nn_module = nn_module
        self.mask_size = mask_size
        self.n_batch = n_batch
        self.mode = mode
        self.activate = activate

    def __call__(self, x, b_box: Sequence | None = None, **kwargs):
        """Returns (occ_map, most_probable_class_map)."""
        x = jnp.asarray(x)
        if x.shape[0] > 1:
            raise ValueError("Expected batch size of 1.")
        sd = x.ndim - 2
        mask_size = ensure_tuple_rep(self.mask_size, sd)
        spatial = x.shape[2:]
        baseline = self.nn_module(x, **kwargs)
        if self.activate is True:
            import jax

            baseline = jax.nn.softmax(baseline, axis=-1)
        elif callable(self.activate):
            baseline = self.activate(baseline)
        n_classes = baseline.shape[-1]
        # occlusion grid with stride = mask_size (non-overlapping for tractability)
        grids = [range(0, s, m) for s, m in zip(spatial, mask_size)]
        import itertools

        coords = list(itertools.product(*grids))
        scores = np.zeros((len(coords), n_classes), dtype=np.float32)
        mean_val = float(jnp.mean(x))
        for i in range(0, len(coords), self.n_batch):
            chunk = coords[i:i + self.n_batch]
            batch = []
            for c in chunk:
                occluded = x
                slicer = tuple([slice(None), slice(None)] + [slice(cc, min(cc + m, s))
                                                             for cc, m, s in zip(c, mask_size, spatial)])
                occluded = occluded.at[slicer].set(mean_val)
                batch.append(occluded[0])
            out = self.nn_module(jnp.stack(batch), **kwargs)
            if self.activate is True:
                import jax

                out = jax.nn.softmax(out, axis=-1)
            elif callable(self.activate):
                out = self.activate(out)
            scores[i:i + len(chunk)] = np.asarray(out)
        # build maps at grid resolution then upsample
        grid_shape = tuple(len(g) for g in grids)
        occ = scores.reshape(grid_shape + (n_classes,))
        occ_map = np.moveaxis(occ, -1, 0)[None]  # (1, classes, *grid)
        most_prob = np.argmax(occ, axis=-1)[None, None].astype(np.float32)
        import jax

        occ_map = np.asarray(jax.image.resize(jnp.asarray(occ_map), (1, n_classes) + spatial, "nearest"))
        most_prob = np.asarray(jax.image.resize(jnp.asarray(most_prob), (1, 1) + spatial, "nearest"))
        return occ_map, most_prob
