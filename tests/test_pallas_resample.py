"""Fused Pallas separable-resample kernel vs the einsum path and grid_pull oracle
(interpret mode on the CPU test mesh; exactness on real TPU is asserted by the same
comparison in ops/pallas_resample.py's development bench)."""
import numpy as np
import pytest
import jax.numpy as jnp

from monai_tpu.ops.pallas_resample import pallas_separable_resample_3d
from monai_tpu.ops.resample import affine_resample
from monai_tpu.ops.separable import separable_affine_resample


@pytest.fixture(scope="module")
def img():
    return jnp.asarray(np.random.RandomState(0).rand(2, 24, 20, 28).astype(np.float32))


M = np.diag([0.75, 1.3, 0.5, 1.0])
M[:3, 3] = [0.4, -1.2, 2.5]
OUT = (32, 16, 40)


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("bound", ["zeros", "border", "reflection"])
def test_matches_einsum_path(img, order, bound):
    got = pallas_separable_resample_3d(img, M, OUT, order=order, bound=bound, interpret=True)
    want = separable_affine_resample(img, M, OUT, order=order, bound=bound)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("bound", ["zeros", "border", "reflection"])
def test_matches_grid_pull_oracle(img, bound):
    got = pallas_separable_resample_3d(img, M, OUT, order=1, bound=bound, interpret=True)
    want = affine_resample(img, jnp.asarray(M), OUT, mode=1, padding_mode=bound)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_identity_roundtrip(img):
    eye = np.eye(4)
    got = pallas_separable_resample_3d(img, eye, img.shape[1:], order=1, bound="zeros",
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(img), atol=1e-5)


def test_upscale_downscale_shapes(img):
    m = np.diag([2.0, 0.4, 1.0, 1.0])
    got = pallas_separable_resample_3d(img, m, (12, 50, 28), order=1, bound="border",
                                       interpret=True)
    assert got.shape == (2, 12, 50, 28)
    want = separable_affine_resample(img, m, (12, 50, 28), order=1, bound="border")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_falls_back_on_bad_config(img):
    # 2D input is not supported by the 3D kernel: returns None for caller fallback
    assert pallas_separable_resample_3d(img[:, 0], M[:3, :3], (16, 40), interpret=True) is None
