"""Sliding-window inference tests (golden behavior vs the reference)."""
import jax.numpy as jnp
import numpy as np
import pytest

from monai_tpu.inferers import SimpleInferer, SlidingWindowInferer, sliding_window_inference


def _pred(w):
    return jnp.concatenate([w * 2.0, w.sum(axis=1, keepdims=True)], axis=1)


@pytest.mark.parametrize("mode", ["constant", "gaussian"])
@pytest.mark.parametrize("overlap", [0.25, 0.5])
def test_sliding_window_identity_predictor(mode, overlap, rng):
    x = rng.rand(1, 1, 20, 22).astype(np.float32)
    out = sliding_window_inference(jnp.asarray(x), roi_size=(8, 8), sw_batch_size=3,
                                   predictor=lambda w: w, overlap=overlap, mode=mode)
    # with an identity predictor stitching must reproduce the input exactly
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_sliding_window_channel_expansion(rng):
    x = rng.rand(1, 2, 20, 22, 18).astype(np.float32)
    out = sliding_window_inference(jnp.asarray(x), roi_size=(8, 8, 8), sw_batch_size=4,
                                   predictor=_pred, overlap=0.25, mode="gaussian")
    assert out.shape == (1, 3, 20, 22, 18)
    np.testing.assert_allclose(np.asarray(out[:, :2]), x * 2, atol=1e-3)


def test_sliding_window_roi_larger_than_image(rng):
    x = rng.rand(1, 1, 6, 6).astype(np.float32)
    out = sliding_window_inference(jnp.asarray(x), roi_size=(8, 8), sw_batch_size=1,
                                   predictor=lambda w: w, overlap=0.25)
    assert out.shape == (1, 1, 6, 6)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_sliding_window_inferer_class(rng):
    x = rng.rand(2, 1, 16, 16).astype(np.float32)
    inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=2, overlap=0.5, mode="gaussian")
    out = inferer(jnp.asarray(x), lambda w: w + 1)
    np.testing.assert_allclose(np.asarray(out), x + 1, atol=1e-4)


def test_simple_inferer(rng):
    x = jnp.asarray(rng.rand(2, 3).astype(np.float32))
    assert np.allclose(np.asarray(SimpleInferer()(x, lambda v: v * 3)), np.asarray(x) * 3)
