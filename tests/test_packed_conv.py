"""Space-to-depth packed conv numerics: exact match to lax conv (f32, CPU).

Reference behaviour target: the stride-1 SAME 3^3 convs of ResidualUnit
(monai/networks/blocks/convolutions.py:174) — the packed path must be a
bit-for-bit-tolerance drop-in. ops/packed_conv.py docstring has the derivation.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monai_tpu.ops.packed_conv import (
    depth_to_space,
    pack_conv3x3_weights,
    pack_factors,
    packed_conv3x3,
    space_to_depth,
)


def _ref_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=dn)


@pytest.mark.parametrize("shape,ci,co", [
    ((2, 8, 8, 8), 16, 16),    # UNet L1 regime
    ((1, 12, 8, 4), 16, 32),   # asymmetric spatial, channel growth
    ((2, 4, 4, 4), 32, 32),    # partial pack (2,2,1 -> 128)
    ((1, 6, 6, 6), 8, 8),      # tiny channels, full 8x pack
    ((1, 8, 8, 8), 3, 16),     # non-power-of-two CI
])
def test_packed_conv_matches_lax(shape, ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(shape[0], *shape[1:], ci).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 3, ci, co) * 0.2).astype(np.float32))
    pack = pack_factors(ci, co, shape[1:])
    assert pack is not None
    y_ref = _ref_conv(x, w)
    y_packed = packed_conv3x3(x, w, None, pack)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_conv_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 3, 16, 16) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    y = packed_conv3x3(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_conv(x, w) + b),
                               rtol=2e-4, atol=2e-4)


def test_packed_conv_grad_matches():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 3, 16, 16) * 0.2).astype(np.float32))

    g_ref = jax.grad(lambda w: jnp.sum(_ref_conv(x, w) ** 2))(w)
    g_pk = jax.grad(lambda w: jnp.sum(packed_conv3x3(x, w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref), rtol=1e-3, atol=1e-3)


def test_s2d_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 6, 4, 5).astype(np.float32))
    for pack in [(2, 2, 2), (2, 1, 2), (1, 1, 2)]:
        y = depth_to_space(space_to_depth(x, pack), pack, 5)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_pack_factors_policy():
    assert pack_factors(16, 16, (48, 48, 48)) == (2, 2, 2)
    assert pack_factors(32, 32, (24, 24, 24)) == (1, 2, 2)
    assert pack_factors(64, 64, (12, 12, 12)) == (1, 1, 2)
    assert pack_factors(128, 128, (6, 6, 6)) is None       # already lane-wide
    assert pack_factors(16, 16, (7, 9, 5)) is None          # odd spatial
    assert pack_factors(16, 16, (48, 48)) is None           # not 3D


def test_residual_unit_uses_packed_path():
    """ResidualUnit output is unchanged when the packed conv path is enabled."""
    from flax import nnx

    from monai_tpu.networks.blocks.convolutions import ResidualUnit

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 16).astype(np.float32))
    ru = ResidualUnit(3, 16, 16, strides=1, subunits=2, rngs=nnx.Rngs(0))
    old = os.environ.get("MONAI_TPU_PACKED_CONV")
    try:
        os.environ["MONAI_TPU_PACKED_CONV"] = "0"
        y_plain = np.asarray(ru(x))
        os.environ["MONAI_TPU_PACKED_CONV"] = "1"
        y_packed = np.asarray(ru(x))
    finally:
        if old is None:
            os.environ.pop("MONAI_TPU_PACKED_CONV", None)
        else:
            os.environ["MONAI_TPU_PACKED_CONV"] = old
    np.testing.assert_allclose(y_packed, y_plain, rtol=2e-4, atol=2e-4)
