"""grid_pull/push parity with torch grid_sample + adjointness."""
import numpy as np
import pytest

from monai_tpu.ops.resample import affine_grid, affine_resample, grid_pull, grid_push

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_ref(img, coords, mode, pad, align):
    t = torch.from_numpy(img)[None]
    n = np.array(img.shape[1:], dtype=np.float32)
    norm = 2 * coords / (n - 1) - 1 if align else (2 * coords + 1) / n - 1
    g = torch.from_numpy(norm[..., ::-1].copy())[None]
    return F.grid_sample(t, g, mode=mode, padding_mode=pad, align_corners=align)[0].numpy()


MODES = [("bilinear", 1), ("nearest", 0), ("bicubic", 3)]
PADS = ["zeros", "border", "reflection"]


@pytest.mark.parametrize("mode,order", MODES)
@pytest.mark.parametrize("pad", PADS)
@pytest.mark.parametrize("align", [True, False])
def test_grid_pull_2d_matches_torch(mode, order, pad, align, rng):
    img = rng.rand(2, 12, 13).astype(np.float32)
    coords = (rng.rand(7, 9, 2) * 18 - 3).astype(np.float32)
    ref = _torch_ref(img, coords, mode, pad, align)
    out = grid_pull(img, coords, order, pad, align_corners=align)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_grid_pull_3d_matches_torch(rng):
    img = rng.rand(1, 8, 9, 10).astype(np.float32)
    coords = (rng.rand(5, 6, 7, 3) * 11 - 1).astype(np.float32)
    t = torch.from_numpy(img)[None]
    n = np.array(img.shape[1:], dtype=np.float32)
    norm = 2 * coords / (n - 1) - 1
    g = torch.from_numpy(norm[..., ::-1].copy())[None]
    ref = F.grid_sample(t, g, mode="bilinear", padding_mode="zeros", align_corners=True)[0].numpy()
    out = grid_pull(img, coords, 1, "zeros", align_corners=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_push_is_adjoint_of_pull(rng):
    x = rng.rand(1, 10, 11).astype(np.float64)
    g = rng.rand(6, 5, 2) * 11
    y = rng.rand(1, 6, 5).astype(np.float64)
    lhs = (grid_pull(x, g, 1, "zeros") * y).sum()
    rhs = (x * grid_push(y.reshape(1, -1), g.reshape(-1, 2), (10, 11), 1, "zeros")).sum()
    assert abs(lhs - rhs) < 1e-10


def test_affine_resample_identity(rng):
    img = rng.rand(2, 12, 13).astype(np.float32)
    out = affine_resample(img, np.eye(3), (12, 13), mode=1)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_jax_numpy_backends_agree(rng):
    import jax.numpy as jnp

    img = rng.rand(2, 12, 13).astype(np.float32)
    coords = (rng.rand(7, 9, 2) * 14 - 1).astype(np.float32)
    out_np = grid_pull(img, coords, 1, "zeros")
    out_j = grid_pull(jnp.asarray(img), jnp.asarray(coords), 1, "zeros")
    np.testing.assert_allclose(np.asarray(out_j), out_np, atol=1e-5)
