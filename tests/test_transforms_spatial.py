"""Spatial & croppad transform tests: lazy==eager, invertibility, integer fast path."""
import numpy as np
import pytest

from monai_tpu.data import MetaImage
from monai_tpu.ops.gaussian import gaussian_filter
from monai_tpu.transforms import (
    CenterSpatialCrop,
    Compose,
    CropForeground,
    Flip,
    Orientation,
    RandAffine,
    RandCropByPosNegLabel,
    RandFlip,
    Resize,
    ResizeWithPadOrCrop,
    Rotate,
    Rotate90,
    Spacing,
    SpatialCrop,
    SpatialPad,
    Zoom,
)


@pytest.fixture()
def img(rng):
    data = gaussian_filter(rng.rand(1, 16, 20, 24).astype(np.float32), 2.0)
    return MetaImage(np.asarray(data), affine=np.diag([1.5, 2.0, 1.0, 1]))


def test_flip_matches_numpy(img):
    out = Flip(spatial_axis=0)(img)
    np.testing.assert_allclose(out.data, np.flip(img.data, 1))
    assert len(img.pending_operations) == 0  # input not polluted


def test_rot90_matches_numpy(img):
    out = Rotate90(k=1, spatial_axes=(0, 1))(img)
    np.testing.assert_allclose(out.data, np.rot90(img.data, k=1, axes=(1, 2)))
    out3 = Rotate90(k=3, spatial_axes=(1, 2))(img)
    np.testing.assert_allclose(out3.data, np.rot90(img.data, k=3, axes=(2, 3)))


def test_crop_pad_inverse(img):
    c = CenterSpatialCrop((8, 10, 12))
    out = c(img)
    assert out.shape == (1, 8, 10, 12)
    inv = c.inverse(out)
    assert inv.shape == img.shape
    np.testing.assert_allclose(inv.affine, img.affine)

    p = SpatialPad((20, 24, 28))
    outp = p(img)
    assert outp.shape == (1, 20, 24, 28)
    invp = p.inverse(outp)
    assert invp.shape == img.shape
    np.testing.assert_allclose(invp.data, img.data)


def test_integer_chain_lazy_equals_eager(img):
    t = [Flip(spatial_axis=0), Rotate90(k=1), CenterSpatialCrop((8, 10, 12))]
    out_lazy = Compose(t, lazy=True)(img)
    out_eager = Compose(t, lazy=False)(img)
    np.testing.assert_allclose(out_lazy.data, out_eager.data)
    np.testing.assert_allclose(out_lazy.affine, out_eager.affine)


def test_interp_chain_lazy_close_to_eager(img):
    t = [Rotate(0.3), Zoom(1.2)]
    out_lazy = Compose(t, lazy=True)(img)
    out_eager = Compose(t, lazy=False)(img)
    assert out_lazy.shape == out_eager.shape
    # fused single resample vs two resamples: close but not identical on smooth data
    assert np.abs(out_lazy.data - out_eager.data).max() < 0.05
    np.testing.assert_allclose(out_lazy.affine, out_eager.affine, atol=1e-6)


def test_spacing(img):
    sp = Spacing(pixdim=(1.0, 1.0, 1.0))
    out = sp(img)
    np.testing.assert_allclose(out.pixdim, [1.0, 1.0, 1.0])
    assert out.shape[1:] == (24, 39, 24)
    inv = sp.inverse(out)
    np.testing.assert_allclose(inv.affine, img.affine)
    assert inv.shape == img.shape


def test_orientation(rng):
    img_lps = MetaImage(rng.rand(1, 8, 9, 10).astype(np.float32),
                        affine=np.diag([-1.0, -1.0, 1.0, 1.0]))
    out = Orientation(axcodes="RAS")(img_lps)
    np.testing.assert_allclose(out.data, np.flip(img_lps.data, (1, 2)))
    assert np.all(np.diag(out.affine)[:3] > 0)


def test_resize(img):
    out = Resize((8, 10, 12))(img)
    assert out.shape == (1, 8, 10, 12)
    out2 = Resize(32, size_mode="longest")(img)
    assert max(out2.shape[1:]) == 32


def test_rand_affine_roundtrip(img):
    ra = RandAffine(prob=1.0, rotate_range=0.2, scale_range=0.1, translate_range=3)
    ra.set_random_state(42)
    out = ra(img)
    inv = ra.inverse(out)
    np.testing.assert_allclose(inv.affine, img.affine, atol=1e-9)
    assert inv.shape == img.shape


def test_rand_flip_prob_zero(img):
    rf = RandFlip(prob=0.0, spatial_axis=0)
    out = rf(img)
    np.testing.assert_allclose(out.data, img.data)
    inv = rf.inverse(out)
    np.testing.assert_allclose(inv.data, img.data)


def test_crop_foreground(rng):
    data = np.zeros((1, 10, 10, 10), dtype=np.float32)
    data[0, 3:7, 2:8, 4:6] = 1.0
    img = MetaImage(data)
    cf = CropForeground(margin=0)
    out = cf(img)
    assert out.shape == (1, 4, 6, 2)
    inv = cf.inverse(out)
    assert inv.shape == img.shape
    np.testing.assert_allclose(inv.data, img.data)


def test_rand_crop_by_pos_neg(rng):
    label = np.zeros((1, 12, 12, 12), dtype=np.float32)
    label[0, 4:8, 4:8, 4:8] = 1
    img = MetaImage(rng.rand(1, 12, 12, 12).astype(np.float32))
    cropper = RandCropByPosNegLabel(spatial_size=(6, 6, 6), pos=1, neg=0, num_samples=3)
    cropper.set_random_state(0)
    outs = cropper(img, label=MetaImage(label))
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (1, 6, 6, 6)


def test_resize_with_pad_or_crop(img):
    t = ResizeWithPadOrCrop((20, 16, 28))
    out = t(img)
    assert out.shape == (1, 20, 16, 28)
    inv = t.inverse(out)
    assert inv.shape == img.shape
