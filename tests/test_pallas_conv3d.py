"""Correctness of the Pallas 3x3x3 conv kernel vs lax.conv_general_dilated.

Runs in pallas interpret mode on CPU (MONAI_TPU_PALLAS_INTERPRET=1); the same
kernel was validated compiled on the real v5e chip (see ops/pallas_conv3d.py
docstring for the measured performance table)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monai_tpu.ops.pallas_conv3d import (_conv3d_pallas_fwd, _xla_conv,
                                         conv3d_3x3_same, _supported)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("MONAI_TPU_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("shape,ci,co", [
    ((2, 4, 8, 8), 32, 32),
    ((1, 6, 6, 6), 64, 32),
    ((2, 4, 6, 10), 128, 128),
    ((1, 3, 5, 7), 16, 24),
])
def test_pallas_conv_matches_xla(shape, ci, co):
    rng = np.random.RandomState(0)
    n, d, h, w = shape
    x = jnp.asarray(rng.randn(n, d, h, w, ci), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.1, jnp.float32)
    got = _conv3d_pallas_fwd(x, wt)
    ref = _xla_conv(x, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_gradients_match_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 6, 6, 32), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, 3, 32, 16) * 0.1, jnp.float32)

    def loss_custom(x, w):
        return jnp.sum(conv3d_3x3_same(x, w) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_xla_conv(x, w) ** 2)

    gx, gw = jax.grad(loss_custom, argnums=(0, 1))(x, wt)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-3, rtol=1e-3)


def test_supported_gate():
    assert _supported((2, 4, 8, 8, 32), (3, 3, 3, 32, 32))
    assert not _supported((2, 4, 8, 8, 32), (5, 5, 5, 32, 32))  # kernel != 3
    assert not _supported((2, 4, 8, 8, 16), (3, 3, 3, 32, 32))  # channel mismatch


def test_factory_conv_unchanged_numerics():
    """PallasConv (the 3D factory conv) must equal nnx.Conv when the kernel is off."""
    from flax import nnx

    from monai_tpu.networks.layers.factories import Conv

    rng = np.random.RandomState(0)
    c = Conv["conv", 3](8, 4, kernel_size=3, strides=1, rngs=nnx.Rngs(0))
    ref = nnx.Conv(8, 4, kernel_size=(3, 3, 3), strides=(1, 1, 1), padding="SAME",
                   rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.randn(2, 6, 6, 6, 8), jnp.float32)
    np.testing.assert_allclose(np.asarray(c(x)), np.asarray(ref(x)), atol=1e-6)
