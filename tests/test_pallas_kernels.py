"""Pallas kernel correctness vs the XLA stencil reference (CPU runs in interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from monai_tpu.ops.filtering import bilateral_filter
from monai_tpu.ops.pallas_filtering import bilateral_filter_pallas


@pytest.mark.parametrize("shape,ss", [((1, 1, 37, 100), 1.5), ((2, 2, 64, 64), 2.0)])
def test_pallas_bilateral_2d_matches_xla(shape, ss):
    x = jnp.asarray(np.random.RandomState(0).rand(*shape).astype(np.float32))
    ref = bilateral_filter(x, ss, 0.3)
    out = bilateral_filter_pallas(x, ss, 0.3)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_bilateral_3d_matches_xla():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 1, 9, 20, 100).astype(np.float32))
    ref = bilateral_filter(x, 1.0, 0.3)
    out = bilateral_filter_pallas(x, 1.0, 0.3)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_bilateral_fallback_none_for_large_radius():
    x = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    assert bilateral_filter_pallas(x, spatial_sigma=5.0, color_sigma=0.3) is None


def test_bilateral_use_pallas_flag_falls_back():
    x = jnp.asarray(np.random.RandomState(2).rand(1, 1, 16, 64).astype(np.float32))
    a = bilateral_filter(x, 1.0, 0.3)
    b = bilateral_filter(x, 1.0, 0.3, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
