"""Registration warp blocks (reference: monai/networks/blocks/warp.py:30 Warp,
:147 DVF2DDF)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from ...ops.resample import grid_pull

__all__ = ["Warp", "DVF2DDF"]


class Warp(nnx.Module):
    """Warp an image with a dense displacement field (reference: warp.py:30).

    image: (B, C, *spatial) channel-first; ddf: (B, D, *spatial) voxel displacements.
    """

    def __init__(self, mode="bilinear", padding_mode: str = "border", jitter: bool = False):
        self.mode = 1 if mode in ("bilinear", "linear", "trilinear", 1) else (0 if mode in ("nearest", 0) else mode)
        self.padding_mode = {"zeros": "zeros", "border": "border", "reflection": "reflection"}.get(
            str(padding_mode), "border")

    def __call__(self, image: jnp.ndarray, ddf: jnp.ndarray) -> jnp.ndarray:
        spatial = image.shape[2:]
        d = len(spatial)
        base = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial],
                                      indexing="ij"), axis=-1)  # (*spatial, D)
        grid = base[None] + jnp.moveaxis(ddf, 1, -1)  # (B, *spatial, D)

        def _one(img_b, grid_b):
            return grid_pull(img_b, grid_b, interpolation=self.mode, bound=self.padding_mode)

        import jax

        return jax.vmap(_one)(image, grid)


class DVF2DDF(nnx.Module):
    """Integrate a velocity field via scaling-and-squaring (reference: warp.py:147)."""

    def __init__(self, num_steps: int = 7, mode="bilinear", padding_mode: str = "zeros"):
        if num_steps <= 0:
            raise ValueError(f"expecting positive num_steps, got {num_steps}")
        self.num_steps = num_steps
        self.warp = Warp(mode=mode, padding_mode=padding_mode)

    def __call__(self, dvf: jnp.ndarray) -> jnp.ndarray:
        ddf = dvf / (2**self.num_steps)
        for _ in range(self.num_steps):
            ddf = ddf + self.warp(ddf, ddf)
        return ddf
