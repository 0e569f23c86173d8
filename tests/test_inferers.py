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


def test_sliding_window_adapt_halves_on_oom(rng, monkeypatch):
    """SlidingWindowInfererAdapt (reference: inferer.py:555): RESOURCE_EXHAUSTED from
    the single-program stitch halves sw_batch_size and retries; the result must match
    the plain inferer's output at the surviving batch size."""
    from monai_tpu.inferers import SlidingWindowInfererAdapt

    x = rng.rand(1, 1, 20, 22).astype(np.float32)
    calls = []

    import monai_tpu.inferers.inferer as inferer_mod
    real_sw = inferer_mod.sliding_window_inference

    def fake_sw(inputs, roi_size, sw_batch_size, network, *a, **kw):
        calls.append(sw_batch_size)
        if sw_batch_size > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted).")
        return real_sw(inputs, roi_size, sw_batch_size, network, *a, **kw)

    monkeypatch.setattr(inferer_mod, "sliding_window_inference", fake_sw)
    inferer = SlidingWindowInfererAdapt(roi_size=(8, 8), sw_batch_size=8, overlap=0.25,
                                        mode="gaussian")
    out = inferer(jnp.asarray(x), lambda w: w)
    assert calls == [8, 4, 2]
    assert inferer.sw_batch_size == 2  # persists for the next volume
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)
    # second volume starts directly at the adapted size
    inferer(jnp.asarray(x), lambda w: w)
    assert calls[-1] == 2


def test_sliding_window_adapt_host_stitch(rng, monkeypatch):
    """At sw_batch_size == 1 a final OOM falls back to host stitching (the TPU analog
    of the reference's CPU-stitching fallback) and still matches the device stitch."""
    from monai_tpu.inferers import SlidingWindowInfererAdapt

    x = rng.rand(1, 1, 20, 22).astype(np.float32)

    import monai_tpu.inferers.inferer as inferer_mod
    real_sw = inferer_mod.sliding_window_inference

    def always_oom(*a, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted).")

    monkeypatch.setattr(inferer_mod, "sliding_window_inference", always_oom)
    inferer = SlidingWindowInfererAdapt(roi_size=(8, 8), sw_batch_size=2, overlap=0.25,
                                        mode="gaussian")
    out = inferer(jnp.asarray(x), lambda w: w * 2.0)
    ref = real_sw(jnp.asarray(x), (8, 8), 1, lambda w: w * 2.0, overlap=0.25, mode="gaussian")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), x * 2.0, atol=1e-4)


def test_sliding_window_adapt_non_oom_raises(rng):
    from monai_tpu.inferers import SlidingWindowInfererAdapt

    x = rng.rand(1, 1, 16, 16).astype(np.float32)
    inferer = SlidingWindowInfererAdapt(roi_size=(8, 8), sw_batch_size=4)

    def bad(w):
        raise ValueError("unrelated failure")

    with pytest.raises(ValueError, match="unrelated"):
        inferer(jnp.asarray(x), bad)
