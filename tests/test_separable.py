"""Separable (MXU matmul) resample vs the gather reference path."""
import numpy as np
import pytest

from monai_tpu.ops.resample import affine_resample
from monai_tpu.ops.separable import interp_matrix, is_separable, separable_affine_resample


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("bound", ["zeros", "border", "reflection"])
def test_separable_matches_gather(order, bound, rng):
    img = rng.rand(2, 20, 24, 18).astype(np.float32)
    # offsets chosen to avoid exact .5 coordinate ties (tie-breaking is float noise)
    M = np.diag([1.31, 0.73, 1.87, 1.0])
    M[:3, 3] = [2.53, -1.21, 0.77]
    out_ref = affine_resample(img, M, (16, 30, 10), mode=order, padding_mode=bound)
    out_sep = separable_affine_resample(img, M, (16, 30, 10), order=order, bound=bound)
    np.testing.assert_allclose(np.asarray(out_sep), np.asarray(out_ref), atol=1e-4)


def test_is_separable():
    assert is_separable(np.diag([2.0, 0.5, 1.0, 1.0]))
    m = np.eye(4)
    m[0, 1] = 0.1
    assert not is_separable(m)


def test_interp_matrix_partition_of_unity():
    W = interp_matrix(10, 7, 1.3, 0.2, 1, "border")
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-6)


def test_jax_path(rng):
    import jax.numpy as jnp

    img = rng.rand(1, 12, 14).astype(np.float32)
    M = np.diag([1.5, 0.8, 1.0])
    M[:2, 2] = [0.3, -0.4]
    out_np = separable_affine_resample(img, M, (8, 18), order=1, bound="border")
    out_j = separable_affine_resample(jnp.asarray(img), M, (8, 18), order=1, bound="border")
    np.testing.assert_allclose(np.asarray(out_j), out_np, atol=1e-5)
