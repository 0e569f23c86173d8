"""TrainableBilateralFilter: per-axis learnable sigmas, multi-channel, gradients
(reference: monai/networks/layers/filtering.py:184,349)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from monai_tpu.networks.layers.filtering import (
    TrainableBilateralFilter,
    TrainableJointBilateralFilter,
)


@pytest.fixture()
def img2d():
    return jnp.asarray(np.random.RandomState(0).rand(2, 1, 12, 14).astype(np.float32))


class TestTrainableBilateral:
    def test_per_axis_sigmas_are_independent_params(self):
        f = TrainableBilateralFilter(spatial_sigma=(1.0, 2.0, 3.0))
        assert f.sigma_spatial[...].shape == (3,)
        assert float(f.sigma_x) == 1.0 and float(f.sigma_y) == 2.0 and float(f.sigma_z) == 3.0

    def test_anisotropic_sigma_changes_output(self, img2d):
        iso = TrainableBilateralFilter(spatial_sigma=(1.0, 1.0))
        aniso = TrainableBilateralFilter(spatial_sigma=(1.0, 3.0))
        out_i = iso(img2d)
        out_a = aniso(img2d)
        assert out_i.shape == img2d.shape
        assert not np.allclose(np.asarray(out_i), np.asarray(out_a))

    def test_multichannel_equals_per_channel(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 3, 10, 10).astype(np.float32))
        f = TrainableBilateralFilter(spatial_sigma=(1.5, 1.5))
        full = f(x)
        per = jnp.concatenate([f(x[:, c:c + 1]) for c in range(3)], axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(per), atol=1e-6)

    def test_gradients_flow_to_each_sigma(self, img2d):
        f = TrainableBilateralFilter(spatial_sigma=(1.0, 2.0), color_sigma=0.5)

        def loss(model):
            return jnp.sum(model(img2d) ** 2)

        grads = nnx.grad(loss)(f)
        g_sp = np.asarray(grads["sigma_spatial"].value)
        g_c = float(np.asarray(grads["sigma_color"].value))
        assert g_sp.shape == (2,)
        assert np.all(np.abs(g_sp) > 0) and g_sp[0] != g_sp[1]
        assert abs(g_c) > 0

    def test_smoothing_reduces_noise_variance(self):
        rng = np.random.RandomState(2)
        clean = np.zeros((1, 1, 16, 16), np.float32)
        clean[..., 4:12, 4:12] = 1.0
        noisy = clean + 0.1 * rng.randn(*clean.shape).astype(np.float32)
        f = TrainableBilateralFilter(spatial_sigma=(2.0, 2.0), color_sigma=0.5)
        out = np.asarray(f(jnp.asarray(noisy)))
        assert np.mean((out - clean) ** 2) < np.mean((noisy - clean) ** 2)


class TestTrainableJointBilateral:
    def test_guidance_shapes_must_match(self, img2d):
        f = TrainableJointBilateralFilter(spatial_sigma=(1.0, 1.0))
        with pytest.raises(ValueError):
            f(img2d, img2d[..., :-1])

    def test_guidance_drives_edges(self):
        # flat input, edged guidance: output stays flat-ish per guidance region
        guidance = np.zeros((1, 1, 12, 12), np.float32)
        guidance[..., :, 6:] = 1.0
        rng = np.random.RandomState(3)
        x = rng.rand(1, 1, 12, 12).astype(np.float32)
        f = TrainableJointBilateralFilter(spatial_sigma=(2.0, 2.0), color_sigma=0.1)
        out = np.asarray(f(jnp.asarray(x), jnp.asarray(guidance)))
        # smoothing happens within guidance-constant regions: variance drops there
        assert out[..., :, :6].std() < x[..., :, :6].std()

    def test_gradients_flow(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32))
        g = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32))
        f = TrainableJointBilateralFilter(spatial_sigma=(1.0, 1.5))

        def loss(model):
            return jnp.mean(model(x, g))

        grads = nnx.grad(loss)(f)
        assert np.all(np.abs(np.asarray(grads["sigma_spatial"].value)) > 0)
