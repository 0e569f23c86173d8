"""Pushpull parity tail: spline orders 2-7 and the reference's 8 bound modes
(reference: monai/csrc/ext.cpp:35-75, resample/pushpull_cpu.cpp).

Oracle: scipy.ndimage.map_coordinates with prefilter=False computes exactly the
direct B-spline weighted sum of raw samples — the same definition as grid_pull —
with matching grid boundary modes:
  zero=grid-constant, replicate=nearest, dct2=grid-mirror, dct1=mirror, dft=grid-wrap.
dst1/dst2 (antisymmetric) have no scipy analog; they are checked against an
explicit antisymmetric extension of the signal.
"""
import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from monai_tpu.ops.resample import grid_pull, resolve_bound

SCIPY_MODE = {"zeros": "grid-constant", "border": "nearest", "reflection": "grid-mirror",
              "mirror": "mirror", "wrap": "grid-wrap"}


def _case(seed=0, shape=(9, 11), n_pts=200, span=4.0):
    rng = np.random.RandomState(seed)
    img = rng.rand(1, *shape).astype(np.float64)
    coords = rng.uniform(-span, shape[0] + span, size=(n_pts, len(shape))).astype(np.float64)
    for d in range(len(shape)):
        coords[:, d] = rng.uniform(-span, shape[d] - 1 + span, n_pts)
    return img, coords


class TestSplineOrdersVsScipy:
    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
    @pytest.mark.parametrize("bound", ["zeros", "border", "reflection", "mirror", "wrap"])
    def test_2d(self, order, bound):
        img, coords = _case()
        interp = "bspline" if order == 3 else order
        got = grid_pull(img, coords[None], interpolation=interp, bound=bound)[0, 0]
        want = map_coordinates(img[0], coords.T, order=order, prefilter=False,
                               mode=SCIPY_MODE[bound], cval=0.0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)

    @pytest.mark.parametrize("order", [2, 4, 5])
    def test_3d(self, order):
        rng = np.random.RandomState(1)
        img = rng.rand(2, 6, 7, 8).astype(np.float64)
        coords = np.stack([rng.uniform(-2, 7, 50), rng.uniform(-2, 8, 50),
                           rng.uniform(-2, 9, 50)], axis=-1)
        got = grid_pull(img, coords[None], interpolation=order, bound="reflection")[:, 0]
        for c in range(2):
            want = map_coordinates(img[c], coords.T, order=order, prefilter=False,
                                   mode="grid-mirror")
            np.testing.assert_allclose(np.asarray(got[c]), want, atol=1e-9)

    @pytest.mark.parametrize("order", [6, 7])
    def test_high_orders_beyond_scipy(self, order):
        """scipy stops at order 5; check partition of unity (constant reproduction)
        and a brute-force 1-D B-spline evaluation."""
        from math import comb, factorial

        rng = np.random.RandomState(5)
        const = np.full((1, 12, 13), 3.25)
        pts = np.stack([rng.uniform(1, 10, 30), rng.uniform(1, 11, 30)], axis=-1)
        got = np.asarray(grid_pull(const, pts[None], interpolation=order, bound="border"))[0, 0]
        np.testing.assert_allclose(got, 3.25, atol=1e-9)

        def bspline(n, u):
            x = u + (n + 1) / 2.0
            return sum(((-1) ** k) * comb(n + 1, k) * max(x - k, 0.0) ** n
                       for k in range(n + 2)) / factorial(n)

        sig = rng.rand(16)
        xs = rng.uniform(4.0, 11.0, 20)  # interior, no boundary effects
        want = np.array([sum(bspline(order, x - i) * sig[i] for i in range(16)) for x in xs])
        got1 = np.asarray(grid_pull(sig[None], xs[:, None][None], interpolation=order,
                                    bound="zeros"))[0, 0]
        np.testing.assert_allclose(got1, want, atol=1e-10)

    def test_keys_cubic_unchanged_for_torch_parity(self):
        """order=3 (default) stays Keys bicubic (torch grid_sample semantics), while
        'bspline' gives the reference csrc cubic — they must differ off-grid."""
        img, coords = _case(2)
        keys = np.asarray(grid_pull(img, coords[None], interpolation=3, bound="border")[0, 0])
        bsp = np.asarray(grid_pull(img, coords[None], interpolation="bspline", bound="border")[0, 0])
        assert not np.allclose(keys, bsp)


class TestAntisymmetricBounds:
    """dst1/dst2 checked against brute-force antisymmetric extensions."""

    @staticmethod
    def _extended_lookup(sig, idx, bound):
        n = len(sig)
        out = np.zeros_like(idx, dtype=np.float64)
        for j, i in enumerate(idx):
            i = int(i)
            if bound == "dst2":  # antireflect about -0.5 / n-0.5
                u = i % (2 * n)
                out[j] = sig[u] if u < n else -sig[2 * n - 1 - u]
            else:  # dst1: nodes at -1 and n, antisymmetric around them
                u = (i + 1) % (2 * (n + 1))
                if u == 0 or u == n + 1:
                    out[j] = 0.0
                elif u <= n:
                    out[j] = sig[u - 1]
                else:
                    out[j] = -sig[2 * n + 1 - u]
        return out

    @pytest.mark.parametrize("bound", ["dst1", "dst2"])
    def test_integer_taps_match_extension(self, bound):
        rng = np.random.RandomState(3)
        sig = rng.rand(7)
        img = sig[None, :]  # (C=1, n)
        idx = np.arange(-10, 17, dtype=np.float64)
        got = np.asarray(grid_pull(img, idx[:, None][None], interpolation=0, bound=bound))[0, 0]
        want = self._extended_lookup(sig, idx.round().astype(int), bound)
        np.testing.assert_allclose(got, want, atol=1e-12)

    @pytest.mark.parametrize("bound", ["dst1", "dst2"])
    @pytest.mark.parametrize("order", [1, 3])
    def test_interp_matches_manual_extension(self, bound, order):
        rng = np.random.RandomState(4)
        sig = rng.rand(6)
        img = sig[None, :]
        pts = rng.uniform(-6, 12, 40)
        interp = "bspline" if order == 3 else order
        got = np.asarray(grid_pull(img, pts[:, None][None], interpolation=interp, bound=bound))[0, 0]
        # build an explicitly-extended signal and sample it with zero bound
        offset = 24
        ext_idx = np.arange(-offset, len(sig) + offset, dtype=np.float64)
        ext = self._extended_lookup(sig, ext_idx.astype(int), bound)
        got_ext = np.asarray(grid_pull(ext[None, :], (pts + offset)[:, None][None],
                                       interpolation=interp, bound="zeros"))[0, 0]
        np.testing.assert_allclose(got, got_ext, atol=1e-10)


class TestBoundAliases:
    def test_aliases_resolve(self):
        assert resolve_bound("zeros") == resolve_bound("constant") == "zero"
        assert resolve_bound("border") == resolve_bound("nearest") == "replicate"
        assert resolve_bound("reflection") == resolve_bound("dct2")
        assert resolve_bound("circular") == resolve_bound("dft")

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            resolve_bound("banana")

    def test_sliding_requires_flow_channels(self):
        img, coords = _case()  # 1 channel, 2 spatial dims
        with pytest.raises(ValueError, match="flow fields"):
            grid_pull(img, coords[None], interpolation=2, bound="sliding")

    def test_sliding_cannot_be_dimension_specific(self):
        with pytest.raises(ValueError, match="per-dimension"):
            resolve_bound(["sliding", "dct2"])


class TestSlidingBound:
    """'sliding' bound (reference: resample_utils.h:86 — deformation-fields-only
    mixture of DCT2 and DST2; the reference's own kernel bodies are TODO stubs,
    pushpull_cpu.cpp:594-660, so validation is against the definition): flow
    channel c is antisymmetric (dst2) across faces normal to dim c — no flow
    through the wall — and symmetric (dct2) across the others — free slip."""

    @staticmethod
    def _flow(shape=(9, 11), seed=0):
        rng = np.random.RandomState(seed)
        return rng.rand(len(shape), *shape).astype(np.float64)

    # order 3 is requested as "bspline" so the uniform-dct2 reference leg uses the
    # same tap engine as the mixture (plain 3 + dct2 is the Keys-cubic torch path)
    @pytest.mark.parametrize("order", [0, 1, 2, "bspline", 5])
    @pytest.mark.parametrize("oob_dim", [0, 1])
    def test_channel_mixture_vs_single_bound_engine(self, order, oob_dim):
        # coords out of bounds ONLY along oob_dim: sliding channel c must then
        # equal the (scipy-validated) single-bound engine with dst2 if c == oob_dim
        # else dct2 — a non-circular check of the per-channel mixture.
        shape = (9, 11)
        flow = self._flow(shape)
        rng = np.random.RandomState(3)
        n = 100
        # keep the non-OOB dim far enough inside that even the widest tested kernel
        # (order 5: taps floor(c)-2 .. floor(c)+3) never touches a boundary there
        coords = np.stack([rng.uniform(3.0, shape[d] - 4.0, n) for d in range(2)], -1)
        coords[:, oob_dim] = rng.uniform(-4.0, shape[oob_dim] + 3.0, n)
        got = np.asarray(grid_pull(flow, coords[None], interpolation=order, bound="sliding"))
        for c in range(2):
            want_bound = "dst2" if c == oob_dim else "dct2"
            want = np.asarray(grid_pull(flow[c:c + 1], coords[None],
                                        interpolation=order, bound=want_bound))
            np.testing.assert_allclose(got[c], want[0], atol=1e-10)

    def test_no_flow_through_the_wall(self):
        # linear interpolation exactly at a face (coordinate -0.5 along dim c):
        # the NORMAL flow component must vanish (dst2 is antisymmetric about the
        # edge), the tangential one is untouched (dct2 is symmetric: no constraint).
        shape = (8, 10)
        flow = self._flow(shape, seed=4) + 0.5  # keep values away from 0
        n = 20
        rng = np.random.RandomState(5)
        ys = rng.uniform(1.0, shape[1] - 2.0, n)
        coords = np.stack([np.full(n, -0.5), ys], -1)  # on the dim-0 face
        out = np.asarray(grid_pull(flow, coords[None], interpolation=1, bound="sliding"))
        np.testing.assert_allclose(out[0], 0.0, atol=1e-12)       # normal component
        assert np.all(np.abs(out[1]) > 1e-3)                       # tangential survives

    @pytest.mark.parametrize("order", [1, 2, 4])
    def test_push_is_adjoint_of_sliding_pull(self, order):
        from monai_tpu.ops.resample import grid_push

        rng = np.random.RandomState(13)
        shape = (7, 9)
        u = rng.rand(2, *shape)
        n_pts = 64
        coords = np.stack([rng.uniform(-2, shape[d] + 1, n_pts) for d in range(2)], -1)
        v = rng.rand(2, n_pts)
        pull_u = np.asarray(grid_pull(u, coords[None], interpolation=order, bound="sliding"))
        push_v = np.asarray(grid_push(v, coords, shape, interpolation=order, bound="sliding"))
        lhs = float((push_v * u).sum())
        rhs = float((pull_u.reshape(2, -1) * v).sum())
        assert abs(lhs - rhs) < 1e-8 * max(1.0, abs(lhs))

    def test_count_sliding_is_dct2(self):
        from monai_tpu.ops.resample import grid_count

        rng = np.random.RandomState(17)
        coords = rng.uniform(-2, 9, (30, 2))
        a = np.asarray(grid_count(coords, (7, 8), interpolation=2, bound="sliding"))
        b = np.asarray(grid_count(coords, (7, 8), interpolation=2, bound="dct2"))
        np.testing.assert_allclose(a, b)

    def test_grad_sliding_matches_finite_differences(self):
        from monai_tpu.ops.resample import grid_grad

        rng = np.random.RandomState(19)
        shape = (9, 9)
        flow = rng.rand(2, *shape)
        pts = np.stack([rng.uniform(-2, 10, 12), rng.uniform(-2, 10, 12)], -1)
        g = np.asarray(grid_grad(flow, pts[None], interpolation=2, bound="sliding"))
        eps = 1e-4
        for d in range(2):
            dp = pts.copy(); dp[:, d] += eps
            dm = pts.copy(); dm[:, d] -= eps
            f_p = np.asarray(grid_pull(flow, dp[None], interpolation=2, bound="sliding"))
            f_m = np.asarray(grid_pull(flow, dm[None], interpolation=2, bound="sliding"))
            fd = (f_p - f_m) / (2 * eps)
            np.testing.assert_allclose(g[:, 0, :, d], fd[:, 0], atol=1e-5)

    @pytest.mark.parametrize("order", [1, 3])
    def test_per_dim_bound_tuple(self, order):
        # per-dim bounds (reference: spatial_transforms.py:93 "[W, H, D] order"):
        # OOB along only one dim must match the uniform bound of that dim.
        shape = (9, 11)
        img = np.random.RandomState(23).rand(1, *shape)
        rng = np.random.RandomState(29)
        n = 50
        for oob_dim, want_bound in ((0, "dft"), (1, "dct1")):
            coords = np.stack([rng.uniform(1.0, shape[d] - 2.0, n) for d in range(2)], -1)
            coords[:, oob_dim] = rng.uniform(-4.0, shape[oob_dim] + 3.0, n)
            got = np.asarray(grid_pull(img, coords[None], interpolation=order,
                                       bound=("dft", "dct1")))
            want = np.asarray(grid_pull(img, coords[None], interpolation=order,
                                        bound=want_bound))
            np.testing.assert_allclose(got, want, atol=1e-10)


class TestAdjointTail:
    """grid_push/count/grad parity tail (VERDICT r2 missing #4): orders 2-7 and the
    non-torch bounds now route through the same tap engine as grid_pull, so push
    must satisfy the exact adjoint identity <push(v), u> == <v, pull(u)> and
    grid_grad must match finite differences of pull.
    Reference: monai/csrc/ext.cpp:35-75 (push/count/grad bound for orders 0-7)."""

    @pytest.mark.parametrize("order", [2, "bspline", 4, 5, 6, 7])
    @pytest.mark.parametrize("bound", ["zeros", "border", "reflection", "mirror", "wrap"])
    def test_push_is_adjoint_of_pull(self, order, bound):
        # order 3 with torch bounds is the Keys-cubic fast path (torch grid_sample
        # semantics, not the tap engine) — its B-spline form is the 'bspline' alias
        from monai_tpu.ops.resample import grid_push

        rng = np.random.RandomState((order if isinstance(order, int) else 3) * 10 + 1)
        shape = (7, 9)
        u = rng.rand(1, *shape)
        n_pts = 64
        coords = np.stack([rng.uniform(-2, shape[d] + 1, n_pts) for d in range(2)], -1)
        v = rng.rand(1, n_pts)
        interp = order
        pull_u = np.asarray(grid_pull(u, coords[None], interpolation=interp, bound=bound))
        push_v = np.asarray(grid_push(v, coords, shape, interpolation=interp, bound=bound))
        lhs = float((push_v * u).sum())
        rhs = float((pull_u.reshape(1, -1) * v).sum())
        assert abs(lhs - rhs) < 1e-8 * max(1.0, abs(lhs))

    @pytest.mark.parametrize("bound", ["dst1", "dst2"])
    def test_push_adjoint_antisymmetric_bounds(self, bound):
        from monai_tpu.ops.resample import grid_push

        rng = np.random.RandomState(3)
        shape = (8,)
        u = rng.rand(1, *shape)
        coords = rng.uniform(-3, shape[0] + 2, (40, 1))
        v = rng.rand(1, 40)
        for order in (2, 5):
            pull_u = np.asarray(grid_pull(u, coords[None], interpolation=order, bound=bound))
            push_v = np.asarray(grid_push(v, coords, shape, interpolation=order, bound=bound))
            lhs = float((push_v * u).sum())
            rhs = float((pull_u.reshape(1, -1) * v).sum())
            assert abs(lhs - rhs) < 1e-8 * max(1.0, abs(lhs))

    def test_push_bspline_alias(self):
        from monai_tpu.ops.resample import grid_push

        rng = np.random.RandomState(5)
        shape = (6, 6)
        coords = rng.uniform(0, 5, (30, 2))
        v = rng.rand(1, 30)
        a = np.asarray(grid_push(v, coords, shape, interpolation="bspline", bound="zeros"))
        b = np.asarray(grid_push(v, coords, shape, interpolation=3, bound="zeros"))
        # B-spline splat must differ from the Keys-cubic fast path off-grid
        assert not np.allclose(a, b)
        # ... and must integrate mass correctly for interior points (partition of unity)
        interior = rng.uniform(2.5, 3.5, (20, 2))
        m = np.asarray(grid_push(np.ones((1, 20)), interior, shape,
                                 interpolation="bspline", bound="zeros"))
        np.testing.assert_allclose(m.sum(), 20.0, rtol=1e-6)

    @pytest.mark.parametrize("order", [2, 4, 7])
    def test_count_is_push_of_ones(self, order):
        from monai_tpu.ops.resample import grid_count, grid_push

        rng = np.random.RandomState(7)
        shape = (7, 8)
        coords = rng.uniform(-1, 8, (25, 2))
        cnt = np.asarray(grid_count(coords, shape, interpolation=order, bound="mirror"))
        ones = np.asarray(grid_push(np.ones((1, 25)), coords, shape,
                                    interpolation=order, bound="mirror"))[0]
        # grid_count splats f32 ones; the explicit push here runs f64
        np.testing.assert_allclose(cnt, ones, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("order", [2, 4, 5])
    @pytest.mark.parametrize("bound", ["zeros", "reflection", "wrap"])
    def test_grad_matches_finite_differences(self, order, bound):
        from monai_tpu.ops.resample import grid_grad

        rng = np.random.RandomState(11)
        shape = (9, 9)
        img = rng.rand(1, *shape)
        pts = np.stack([rng.uniform(1, 7, 12), rng.uniform(1, 7, 12)], -1)
        g = np.asarray(grid_grad(img, pts[None], interpolation=order, bound=bound))
        eps = 1e-4
        for d in range(2):
            dp = pts.copy(); dp[:, d] += eps
            dm = pts.copy(); dm[:, d] -= eps
            f_p = np.asarray(grid_pull(img, dp[None], interpolation=order, bound=bound))
            f_m = np.asarray(grid_pull(img, dm[None], interpolation=order, bound=bound))
            fd = (f_p - f_m)[0, 0] / (2 * eps)
            np.testing.assert_allclose(g[0, 0, :, d], fd, rtol=2e-3, atol=2e-3)
