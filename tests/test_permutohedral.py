"""Exact permutohedral lattice (ops/permutohedral.py) — behavior tests.

Reference: monai/csrc/filtering/permutohedral/* (hash-table lattice); same
algorithm, sorted-dense TPU formulation. Invariants tested here are exact
properties of the algorithm, not tolerances tuned to this implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monai_tpu.ops.filtering import phl_filter
from monai_tpu.ops.permutohedral import permutohedral_filter


def _brute_gauss(data, feat):
    """Exact Gaussian filtering in feature space: W_ij = exp(-|fi-fj|^2/2)."""
    b, c = data.shape[:2]
    n = int(np.prod(data.shape[2:]))
    f = feat.reshape(b, -1, n)
    x = data.reshape(b, c, n)
    d2 = ((f[:, :, :, None] - f[:, :, None, :]) ** 2).sum(1)
    w = np.exp(-0.5 * d2)
    num = np.einsum("bnm,bcm->bcn", w, x)
    den = w.sum(-1)[:, None]
    return (num / den).reshape(data.shape)


def test_identical_features_give_global_mean():
    # all points share one simplex -> output is exactly the data mean
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 3, 50).astype(np.float32))
    feat = jnp.ones((1, 7, 50), jnp.float32) * 0.37
    out = permutohedral_filter(data, feat)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(data).mean(-1, keepdims=True), data.shape),
                               atol=1e-5)


def test_separated_clusters_do_not_mix():
    rng = np.random.RandomState(1)
    data = np.zeros((1, 1, 80), np.float32)
    data[0, 0, :40] = 1.0
    feat = np.zeros((1, 4, 80), np.float32)
    feat[0, :, 40:] = 50.0  # 50 sigma away
    feat += rng.randn(1, 4, 80).astype(np.float32) * 0.01
    out = np.asarray(permutohedral_filter(jnp.asarray(data), jnp.asarray(feat)))
    np.testing.assert_allclose(out[0, 0, :40], 1.0, atol=1e-3)
    np.testing.assert_allclose(out[0, 0, 40:], 0.0, atol=1e-3)


def test_matches_brute_force_gaussian():
    # the lattice approximates the true feature-space Gaussian; rank the
    # agreement by correlation + moderate pointwise tolerance
    rng = np.random.RandomState(2)
    n = 200
    data = rng.randn(1, 2, n).astype(np.float32)
    feat = rng.randn(1, 3, n).astype(np.float32) * 2.0
    out = np.asarray(permutohedral_filter(jnp.asarray(data), jnp.asarray(feat)))
    ref = _brute_gauss(data, feat)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.95, f"lattice vs brute-force correlation too low: {corr}"
    assert float(np.max(np.abs(out - ref))) < 0.5 * float(np.max(np.abs(ref)))


def test_sigmas_scale_features():
    rng = np.random.RandomState(3)
    data = jnp.asarray(rng.randn(1, 1, 60).astype(np.float32))
    feat = jnp.asarray(rng.randn(1, 2, 60).astype(np.float32))
    a = permutohedral_filter(data, feat / 2.0)
    b = permutohedral_filter(data, feat, sigmas=(2.0, 2.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_high_dim_features_and_jit():
    # F=9 (beyond the grid path) under jit, batch 2
    rng = np.random.RandomState(4)
    data = jnp.asarray(rng.randn(2, 2, 16, 16).astype(np.float32))
    feat = jnp.asarray(rng.randn(2, 9, 16, 16).astype(np.float32))
    out = jax.jit(permutohedral_filter)(data, feat)
    assert out.shape == data.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_differentiable():
    rng = np.random.RandomState(5)
    data = jnp.asarray(rng.randn(1, 1, 30).astype(np.float32))
    feat = jnp.asarray(rng.randn(1, 2, 30).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(permutohedral_filter(x, feat) ** 2))(data)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_phl_filter_dispatches_high_dim_to_lattice():
    # F=8 on a >4096-voxel input used to raise NotImplementedError
    rng = np.random.RandomState(6)
    data = jnp.asarray(rng.randn(1, 1, 40, 40, 4).astype(np.float32))
    feat = jnp.asarray(rng.randn(1, 8, 40, 40, 4).astype(np.float32))
    out = phl_filter(data, feat)
    assert out.shape == data.shape
    assert np.all(np.isfinite(np.asarray(out)))
