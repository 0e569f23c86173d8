"""PHL filter: exact dense path, feature-grid splat-blur-slice path, and the CRF
block on realistically-sized volumes (reference: monai/networks/layers/filtering.py:66
PHLFilter; monai/networks/blocks/crf.py:23 — the reference's exact hash lattice is
replaced by a regular feature-space grid, bound documented in ops/filtering.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monai_tpu.networks.blocks.crf import CRF
from monai_tpu.ops.filtering import _phl_grid_filter, phl_filter


def _two_region_image(shape=(16, 16, 16), lo=0.0, hi=1.0, noise=0.05, seed=0):
    rng = np.random.RandomState(seed)
    img = np.full(shape, lo, np.float32)
    img[: shape[0] // 2] = hi
    img += rng.randn(*shape).astype(np.float32) * noise
    return img


class TestPHLExact:
    def test_sigma_scaling_matches_prescaled_features(self):
        rng = np.random.RandomState(1)
        data = jnp.asarray(rng.rand(1, 2, 8, 8).astype(np.float32))
        feat = jnp.asarray(rng.rand(1, 3, 8, 8).astype(np.float32))
        sigmas = (0.5, 2.0, 1.5)
        out_sig = phl_filter(data, feat, sigmas=sigmas)
        pre = feat / jnp.asarray(sigmas).reshape(1, 3, 1, 1)
        out_pre = phl_filter(data, pre)
        np.testing.assert_allclose(out_sig, out_pre, atol=1e-6)

    def test_similar_features_average(self):
        # two well-separated feature clusters: output ≈ within-cluster mean
        img = _two_region_image((8, 8, 8), noise=0.0)
        data = jnp.asarray(img)[None, None]
        feat = data * 100.0  # clusters 100σ apart → no cross-talk
        out = np.asarray(phl_filter(data, feat))
        assert abs(out[0, 0, 0, 0, 0] - 1.0) < 1e-3
        assert abs(out[0, 0, -1, 0, 0] - 0.0) < 1e-3


class TestPHLGrid:
    def test_grid_close_to_exact_small_input(self):
        # force the grid path on an input small enough for the exact path
        rng = np.random.RandomState(2)
        data = jnp.asarray(rng.rand(1, 1, 10, 10).astype(np.float32))
        feat = jnp.asarray((rng.rand(1, 2, 10, 10) * 4.0).astype(np.float32))
        exact = np.asarray(phl_filter(data, feat))
        grid = np.asarray(_phl_grid_filter(data, feat, 100))
        # nearest splat + unit blur + linear slice is an approximation: demand
        # high correlation and bounded error, not bitwise parity
        err = np.abs(grid - exact).max()
        assert err < 0.25, err
        cc = np.corrcoef(grid.ravel(), exact.ravel())[0, 1]
        assert cc > 0.9, cc

    def test_large_input_edge_preserving(self):
        # 13k voxels > 4096 → grid path; distinct feature regions must not bleed
        img = _two_region_image((24, 24, 24), noise=0.05)
        data = jnp.asarray(img)[None, None]
        feat = data / 0.1  # regions 10σ apart
        out = np.asarray(phl_filter(data, feat))
        assert out.shape == data.shape and np.isfinite(out).all()
        hi = out[0, 0, :12].mean()
        lo = out[0, 0, 12:].mean()
        assert hi > 0.9 and lo < 0.1
        # and within-region variance shrinks (noise is filtered)
        assert out[0, 0, :12].std() < img[:12].std()

    def test_large_input_differentiable(self):
        # the reference PHL backward raises NotImplementedError; ours autodiffs
        img = _two_region_image((24, 24, 24))
        data = jnp.asarray(img)[None, None]
        feat = data / 0.2

        def loss(d):
            return jnp.sum(phl_filter(d, feat) ** 2)

        g = jax.grad(loss)(data)
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0

    def test_high_feature_dim_routes_to_exact_lattice(self):
        # F=6 feature dims exceed the regular-grid path's bound; since r4 these
        # route to the exact permutohedral lattice instead of raising.
        import monai_tpu.ops.permutohedral as perm

        calls = []
        orig = perm.permutohedral_filter

        def spy(data, features, **kw):
            calls.append(features.shape)
            return orig(data, features, **kw)

        import monai_tpu.ops.filtering as filt

        rng = np.random.RandomState(3)
        # >4096 voxels (grid/lattice territory) with F=6 > grid bound of 5
        data = jnp.asarray(rng.rand(1, 1, 18, 18, 18).astype(np.float32))
        feat = jnp.asarray(rng.rand(1, 6, 18, 18, 18).astype(np.float32))
        old = perm.permutohedral_filter
        perm.permutohedral_filter = spy
        try:
            out = np.asarray(filt.phl_filter(data, feat))
        finally:
            perm.permutohedral_filter = old
        assert calls and calls[0][1] == 6
        assert out.shape == data.shape and np.isfinite(out).all()


class TestCRFVolume:
    def test_crf_full_volume(self):
        # (1, 2, 24, 24, 24) logits + 1-channel guide → bilateral features F=4;
        # previously raised NotImplementedError for >4096 voxels
        img = _two_region_image((24, 24, 24), noise=0.1)
        ref = jnp.asarray(img)[None, None]
        logits = jnp.concatenate([ref * 2 - 1, 1 - ref * 2], axis=1)
        out = np.asarray(CRF(iterations=2)(logits, ref))
        assert out.shape == logits.shape
        np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-4)
        # CRF sharpens towards the dominant class within each region
        assert out[0, 0, :12].mean() > 0.8
        assert out[0, 0, 12:].mean() < 0.2
