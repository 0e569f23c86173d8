"""Pallas TPU kernels for neighborhood filtering.

The reference implements the bilateral filter as a CUDA/C++ extension
(reference: monai/csrc/filtering/bilateral/*). This is the TPU-native analog: a Pallas
kernel that keeps a volume slab (plus halo) resident in VMEM — one HBM read per voxel
instead of one per neighborhood offset — and accumulates the spatial x intensity
weighted sum entirely on the VPU.

Mosaic constraints shape the design:
- DMA copy extents and starts in the last two (sublane, lane) dims must be multiples
  of the float32 (8, 128) tile, so inputs are edge-padded up to those multiples and
  slabs are tiled in 8-row units.
- Dynamic starts in sublane/lane dims are not provably aligned, so the (2r+1)^d
  neighborhood loop is statically unrolled; every unaligned static slice materializes
  a relayout temporary, so the slab height is sized to keep
  offsets x slab-bytes within the VMEM budget.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["bilateral_filter_pallas", "pallas_available"]

_VMEM_TEMP_BUDGET = 5 * 2 ** 20  # bytes of relayout temporaries allowed per program


def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "cpu")
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel_2d(in_ref, out_ref, scratch, num_ref, den_ref, sem, *, radius, tile_h,
               copy_rows, width, inv2ss, inv2cs):
    """One program per (bc, row-slab): DMA slab+halo rows, accumulate over offsets."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bc = pl.program_id(0)
    i = pl.program_id(1)
    side = 2 * radius + 1
    dma = pltpu.make_async_copy(
        in_ref.at[bc, pl.ds(i * tile_h, copy_rows), :], scratch, sem)
    dma.start()
    dma.wait()
    center = scratch[radius:radius + tile_h, radius:radius + width]
    num_ref[:] = jnp.zeros((tile_h, width), jnp.float32)
    den_ref[:] = jnp.zeros((tile_h, width), jnp.float32)
    for dy in range(side):
        for dx in range(side):
            w_s = math.exp(-((dy - radius) ** 2 + (dx - radius) ** 2) * inv2ss)
            shifted = scratch[dy:dy + tile_h, dx:dx + width]
            diff = shifted - center
            w = w_s * jnp.exp(-(diff * diff) * inv2cs)
            num_ref[:] = num_ref[:] + w * shifted
            den_ref[:] = den_ref[:] + w
    out_ref[0, :, :] = num_ref[:] / jnp.maximum(den_ref[:], 1e-8)


def _kernel_3d(in_ref, out_ref, scratch, num_ref, den_ref, sem, *, radius, tile_z,
               height, width, inv2ss, inv2cs):
    """One program per (bc, z-slab): DMA slab+halo (full aligned H/W planes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bc = pl.program_id(0)
    i = pl.program_id(1)
    side = 2 * radius + 1
    dma = pltpu.make_async_copy(
        in_ref.at[bc, pl.ds(i * tile_z, tile_z + 2 * radius), :, :], scratch, sem)
    dma.start()
    dma.wait()
    center = scratch[radius:radius + tile_z, radius:radius + height, radius:radius + width]
    num_ref[:] = jnp.zeros((tile_z, height, width), jnp.float32)
    den_ref[:] = jnp.zeros((tile_z, height, width), jnp.float32)
    for dz in range(side):
        for dy in range(side):
            for dx in range(side):
                d2 = (dz - radius) ** 2 + (dy - radius) ** 2 + (dx - radius) ** 2
                w_s = math.exp(-d2 * inv2ss)
                shifted = scratch[dz:dz + tile_z, dy:dy + height, dx:dx + width]
                diff = shifted - center
                w = w_s * jnp.exp(-(diff * diff) * inv2cs)
                num_ref[:] = num_ref[:] + w * shifted
                den_ref[:] = den_ref[:] + w
    out_ref[0, :, :, :] = num_ref[:] / jnp.maximum(den_ref[:], 1e-8)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _run_2d(padded, radius, tile_h, out_hw, sigmas):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spatial_sigma, color_sigma = sigmas
    h_pad, w = out_hw  # h_pad is a multiple of tile_h
    bc, hp, wp = padded.shape
    copy_rows = _round_up(tile_h + 2 * radius, 8)
    kern = functools.partial(_kernel_2d, radius=radius, tile_h=tile_h, copy_rows=copy_rows,
                             width=w, inv2ss=0.5 / (spatial_sigma ** 2),
                             inv2cs=0.5 / (color_sigma ** 2))
    return pl.pallas_call(
        kern,
        grid=(bc, h_pad // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, h_pad, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((copy_rows, wp), jnp.float32),
                        pltpu.VMEM((tile_h, w), jnp.float32),
                        pltpu.VMEM((tile_h, w), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=jax.default_backend() == "cpu",
    )(padded)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _run_3d(padded, radius, tile_z, out_zhw, sigmas):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spatial_sigma, color_sigma = sigmas
    z_pad, h, w = out_zhw  # z_pad is a multiple of tile_z
    bc, zp, hp, wp = padded.shape
    kern = functools.partial(_kernel_3d, radius=radius, tile_z=tile_z, height=h, width=w,
                             inv2ss=0.5 / (spatial_sigma ** 2),
                             inv2cs=0.5 / (color_sigma ** 2))
    return pl.pallas_call(
        kern,
        grid=(bc, z_pad // tile_z),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tile_z, h, w), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, z_pad, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_z + 2 * radius, hp, wp), jnp.float32),
                        pltpu.VMEM((tile_z, h, w), jnp.float32),
                        pltpu.VMEM((tile_z, h, w), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=jax.default_backend() == "cpu",
    )(padded)


def bilateral_filter_pallas(img: jnp.ndarray, spatial_sigma: float = 5.0,
                            color_sigma: float = 0.5, truncate: float = 2.0):
    """Bilateral filter on (B, C, *spatial) via the Pallas slab kernel.

    Returns None when the configuration is unsupported (radius too large for the
    unrolled neighborhood, or the halo/temporary budget exceeds VMEM) so callers can
    fall back to the XLA stencil implementation.
    """
    img = jnp.asarray(img, jnp.float32)
    sd = img.ndim - 2
    if sd not in (2, 3):
        return None
    radius = max(int(truncate * spatial_sigma + 0.5), 1)
    if (sd == 2 and radius > 6) or (sd == 3 and radius > 2):
        return None
    b, c = img.shape[:2]
    spatial = img.shape[2:]
    if any(s <= radius for s in spatial):
        return None
    flat = img.reshape((b * c,) + spatial)
    sigmas = (float(spatial_sigma), float(color_sigma))
    offsets = (2 * radius + 1) ** sd
    if sd == 2:
        h, w = spatial
        wp = _round_up(w + 2 * radius, 128)
        # size the row slab so relayout temporaries stay within budget
        tile_h = max(8, (_VMEM_TEMP_BUDGET // (offsets * wp * 4)) // 8 * 8)
        tile_h = min(tile_h, _round_up(h, 8))
        h_pad = _round_up(h, tile_h)
        rows = _round_up(tile_h + 2 * radius, 8)
        src_rows = h_pad - tile_h + rows  # the last slab reads this many rows
        padded = jnp.pad(flat, [(0, 0), (radius, src_rows - h - radius),
                                (radius, wp - w - radius)], mode="edge")
        out = _run_2d(padded, radius, tile_h, (h_pad, w), sigmas)
        out = out[:, :h, :]
    else:
        z, h, w = spatial
        hp = _round_up(h + 2 * radius, 8)
        wp = _round_up(w + 2 * radius, 128)
        tile_z = max(1, _VMEM_TEMP_BUDGET // (offsets * hp * wp * 4))
        tile_z = min(tile_z, z)
        z_pad = _round_up(z, tile_z)
        if (tile_z + 2 * radius) * hp * wp * 4 > 8 * 2 ** 20:
            return None
        padded = jnp.pad(flat, [(0, 0), (radius, z_pad - z + radius),
                                (radius, hp - h - radius), (radius, wp - w - radius)],
                         mode="edge")
        out = _run_3d(padded, radius, tile_z, (z_pad, h, w), sigmas)
        out = out[:, :z, :, :]
    return out.reshape((b, c) + spatial)
