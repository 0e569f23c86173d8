"""Regression tests for advisor findings (ADVICE.md round 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monai_tpu.inferers.utils import sliding_window_inference


class TestSlidingWindowCacheCorrectness:
    """The jit cache must not bake in importance maps, predictor kwargs, or weights."""

    def test_sigma_scale_change_same_predictor(self):
        def predictor(w):
            # window-relative ramp: overlapping voxels get different values from
            # different windows, so the blending weights affect the result
            return w + jnp.arange(w.shape[-1], dtype=w.dtype)

        vol = jnp.asarray(np.random.RandomState(0).rand(1, 1, 24, 24).astype(np.float32))
        out_a = sliding_window_inference(vol, (16, 16), 2, predictor, overlap=0.5,
                                         mode="gaussian", sigma_scale=0.125)
        out_b = sliding_window_inference(vol, (16, 16), 2, predictor, overlap=0.5,
                                         mode="gaussian", sigma_scale=0.5)
        # same predictor object + shapes but different blending: results must differ
    # (identical everywhere only if the sigma were baked into the cached closure)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    def test_roi_weight_map_change_same_predictor(self):
        def predictor(w):
            return w + jnp.arange(w.shape[-1], dtype=w.dtype)

        vol = jnp.asarray(np.random.RandomState(1).rand(1, 1, 24, 24).astype(np.float32))
        w1 = np.ones((16, 16), dtype=np.float32)
        w2 = np.linspace(0.1, 1.0, 256, dtype=np.float32).reshape(16, 16)
        out_1 = sliding_window_inference(vol, (16, 16), 2, predictor, overlap=0.5,
                                         roi_weight_map=w1)
        out_2 = sliding_window_inference(vol, (16, 16), 2, predictor, overlap=0.5,
                                         roi_weight_map=w2)
        assert not np.allclose(np.asarray(out_1), np.asarray(out_2))

    def test_array_kwarg_change_same_predictor(self):
        def predictor(w, scale):
            return w * scale

        vol = jnp.asarray(np.random.RandomState(2).rand(1, 1, 24, 24).astype(np.float32))
        out_1 = sliding_window_inference(vol, (16, 16), 2, predictor, 0.5,
                                         scale=jnp.asarray(1.0).reshape(1))
        out_3 = sliding_window_inference(vol, (16, 16), 2, predictor, 0.5,
                                         scale=jnp.asarray(3.0).reshape(1))
        np.testing.assert_allclose(np.asarray(out_3), 3 * np.asarray(out_1), rtol=1e-5)

    def test_nnx_module_weight_update_same_predictor(self):
        from flax import nnx

        class Scaler(nnx.Module):
            def __init__(self):
                self.w = nnx.Param(jnp.asarray(1.0))

            def __call__(self, x):
                return x * self.w.value

        net = Scaler()
        vol = jnp.asarray(np.random.RandomState(3).rand(1, 1, 24, 24).astype(np.float32))
        out_1 = sliding_window_inference(vol, (16, 16), 2, net, 0.5)
        net.w.value = jnp.asarray(5.0)  # in-place weight update, same module object
        out_5 = sliding_window_inference(vol, (16, 16), 2, net, 0.5)
        np.testing.assert_allclose(np.asarray(out_5), 5 * np.asarray(out_1), rtol=1e-5)


class TestSSIMKernelParams:
    def _mk(self, seed=0):
        rng = np.random.RandomState(seed)
        a = rng.rand(2, 1, 32, 32).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(2, 1, 32, 32).astype(np.float32), 0, 1)
        return jnp.asarray(a), jnp.asarray(b)

    def test_win_size_used(self):
        from monai_tpu.metrics import SSIMMetric

        a, b = self._mk()
        m11 = SSIMMetric(spatial_dims=2, win_size=11)
        m5 = SSIMMetric(spatial_dims=2, win_size=5)
        v11 = float(np.mean(np.asarray(m11._compute_metric(a, b))))
        v5 = float(np.mean(np.asarray(m5._compute_metric(a, b))))
        assert v11 != v5

    def test_uniform_kernel_matches_skimage_semantics(self):
        from monai_tpu.metrics import SSIMMetric

        a, b = self._mk(1)
        mg = SSIMMetric(spatial_dims=2, kernel_type="gaussian")
        mu = SSIMMetric(spatial_dims=2, kernel_type="uniform")
        vg = float(np.mean(np.asarray(mg._compute_metric(a, b))))
        vu = float(np.mean(np.asarray(mu._compute_metric(a, b))))
        assert vg != vu
        assert 0 < vu <= 1.0

    def test_bad_kernel_type_raises(self):
        from monai_tpu.metrics import SSIMMetric

        with pytest.raises(ValueError):
            SSIMMetric(spatial_dims=2, kernel_type="triangle")

    def test_ssim_vs_torch_reference(self):
        """Golden check vs the reference implementation on CPU torch."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            from monai.metrics.regression import SSIMMetric as RefSSIM
        except Exception:
            pytest.skip("reference MONAI not importable")
        finally:
            sys.path.remove("/root/reference")

        from monai_tpu.metrics import SSIMMetric

        rng = np.random.RandomState(7)
        a = rng.rand(2, 1, 24, 24).astype(np.float32)
        b = np.clip(a + 0.05 * rng.randn(2, 1, 24, 24).astype(np.float32), 0, 1)
        for ktype, ksize in (("gaussian", 11), ("uniform", 7)):
            ours = SSIMMetric(spatial_dims=2, kernel_type=ktype, win_size=ksize)
            ref = RefSSIM(spatial_dims=2, kernel_type=ktype, win_size=ksize)
            v_ours = np.asarray(ours._compute_metric(jnp.asarray(a), jnp.asarray(b)))
            v_ref = ref._compute_metric(torch.from_numpy(a), torch.from_numpy(b)).numpy()
            np.testing.assert_allclose(np.mean(v_ours), np.mean(v_ref), atol=2e-4)


class TestCheckpointSaverConfig:
    def test_fixed_filename_with_n_saved_raises(self, tmp_path):
        from monai_tpu.handlers import CheckpointSaver

        with pytest.raises(ValueError):
            CheckpointSaver(save_dir=str(tmp_path), save_dict={}, save_key_metric=True,
                            key_metric_filename="best.ckpt", key_metric_n_saved=2)

    def test_fixed_filename_single_ok(self, tmp_path):
        from monai_tpu.handlers import CheckpointSaver

        CheckpointSaver(save_dir=str(tmp_path), save_dict={}, save_key_metric=True,
                        key_metric_filename="best.ckpt", key_metric_n_saved=1)
