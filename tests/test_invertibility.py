"""Systematic invertibility harness for spatial/crop/pad transforms
(reference harnesses: tests/croppers.py, tests/padders.py, tests/test_inverse.py).

For each invertible transform: forward -> inverse must restore the original spatial
shape and affine, clear the applied-operations stack, and (for pure index-ops like
flips/crops/pads) restore the original voxel values in the preserved region.
"""
import numpy as np
import pytest

import monai_tpu.transforms as T
from monai_tpu.data import MetaImage, create_test_image_3d

AFFINE = np.diag([1.2, 1.2, 2.0, 1.0])
SHAPE = (1, 24, 24, 16)


def _img(seed=0):
    # smooth blobby phantom: interpolation roundtrips preserve structure, unlike noise
    arr, _ = create_test_image_3d(*SHAPE[1:], rad_max=6, noise_max=0.2,
                                  random_state=np.random.RandomState(seed))
    return MetaImage(arr.astype(np.float32)[None], affine=AFFINE.copy())


EXACT_CASES = [
    # transforms whose inverse restores voxel values exactly (index ops)
    ("Flip", lambda: T.Flip(spatial_axis=(0, 2))),
    ("Rotate90", lambda: T.Rotate90(k=1, spatial_axes=(0, 1))),
    ("SpatialPad", lambda: T.SpatialPad(spatial_size=(30, 30, 20))),
    ("BorderPad", lambda: T.BorderPad(spatial_border=3)),
    ("DivisiblePad", lambda: T.DivisiblePad(k=16)),
    ("RandFlip", lambda: T.RandFlip(prob=1.0, spatial_axis=(1,))),
    ("RandRotate90", lambda: T.RandRotate90(prob=1.0, spatial_axes=(0, 1))),
    ("Orientation", lambda: T.Orientation(axcodes="LPS")),
]

SHAPE_CASES = [
    # interpolating transforms: inverse restores shape+affine (values approximate)
    ("Spacing", lambda: T.Spacing(pixdim=(1.5, 1.5, 1.5))),
    ("Resize", lambda: T.Resize(spatial_size=(20, 18, 12), mode="trilinear")),
    ("Zoom", lambda: T.Zoom(zoom=1.4, keep_size=True)),
    ("Rotate", lambda: T.Rotate(angle=(0.4, 0, 0), keep_size=True)),
    ("RandAffine", lambda: T.RandAffine(prob=1.0, rotate_range=(0.3, 0, 0),
                                        padding_mode="zeros")),
    ("RandZoom", lambda: T.RandZoom(prob=1.0, min_zoom=0.85, max_zoom=0.95, keep_size=True)),
]

CROP_CASES = [
    # crops: inverse pads back to the original extent (cropped-away voxels are zero)
    ("SpatialCrop", lambda: T.SpatialCrop(roi_center=(12, 12, 8), roi_size=(16, 16, 10))),
    ("CenterSpatialCrop", lambda: T.CenterSpatialCrop(roi_size=(16, 16, 10))),
    ("RandSpatialCrop", lambda: T.RandSpatialCrop(roi_size=(16, 16, 10), random_size=False)),
    ("ResizeWithPadOrCrop", lambda: T.ResizeWithPadOrCrop(spatial_size=(30, 18, 20))),
    ("CropForeground", lambda: T.CropForeground(select_fn=lambda x: x > 0.5, margin=1)),
]


def _roundtrip(build):
    t = build()
    img = _img()
    fwd = t(img)
    inv = t.inverse(fwd)
    return img, fwd, inv


@pytest.mark.parametrize("name,build", EXACT_CASES, ids=[c[0] for c in EXACT_CASES])
def test_exact_roundtrip(name, build):
    img, fwd, inv = _roundtrip(build)
    assert tuple(inv.shape) == SHAPE, name
    np.testing.assert_allclose(np.asarray(inv.affine), AFFINE, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(inv.data), np.asarray(img.data), atol=1e-5,
                               err_msg=name)
    assert not inv.applied_operations, name


@pytest.mark.parametrize("name,build", SHAPE_CASES, ids=[c[0] for c in SHAPE_CASES])
def test_shape_affine_roundtrip(name, build):
    img, fwd, inv = _roundtrip(build)
    assert tuple(inv.shape) == SHAPE, name
    np.testing.assert_allclose(np.asarray(inv.affine), AFFINE, atol=1e-3, err_msg=name)
    assert not inv.applied_operations, name
    # interior correlation stays high through the interpolation roundtrip
    a = np.asarray(img.data)[0, 4:-4, 4:-4, 3:-3].ravel()
    b = np.asarray(inv.data)[0, 4:-4, 4:-4, 3:-3].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.7, (name, corr)


@pytest.mark.parametrize("name,build", CROP_CASES, ids=[c[0] for c in CROP_CASES])
def test_crop_roundtrip_restores_extent(name, build):
    img, fwd, inv = _roundtrip(build)
    assert tuple(inv.shape) == SHAPE, name
    np.testing.assert_allclose(np.asarray(inv.affine), AFFINE, atol=1e-4, err_msg=name)
    assert not inv.applied_operations, name
    # the kept region must be restored exactly: every nonzero voxel of inv equals img
    inv_a, img_a = np.asarray(inv.data), np.asarray(img.data)
    kept = inv_a != 0
    np.testing.assert_allclose(inv_a[kept], img_a[kept], atol=1e-5, err_msg=name)


class TestComposeInverse:
    def test_compose_inverts_full_chain(self):
        chain = T.Compose([
            T.Spacing(pixdim=(1.5, 1.5, 1.5)),
            T.Flip(spatial_axis=(0,)),
            T.CenterSpatialCrop(roi_size=(14, 14, 10)),
            T.SpatialPad(spatial_size=(18, 18, 12)),
        ])
        img = _img()
        out = chain(img)
        assert len(out.applied_operations) == 4
        inv = chain.inverse(out)
        assert tuple(inv.shape) == SHAPE
        np.testing.assert_allclose(np.asarray(inv.affine), AFFINE, atol=1e-3)
        assert not inv.applied_operations

    def test_dict_invertd(self):
        data = {"image": _img(), "label": _img(1)}
        chain = T.Compose([
            T.Spacingd(keys=["image", "label"], pixdim=(1.5, 1.5, 1.5),
                       mode=["bilinear", "nearest"], allow_missing_keys=True),
            T.RandFlipd(keys=["image", "label"], prob=1.0, spatial_axis=(0,),
                        allow_missing_keys=True),
        ])
        out = chain(data)
        # Invertd-style: apply the chain's inverse on a prediction-like entry
        out["pred"] = out["image"].new_like(np.asarray(out["image"].data))
        out["pred"].applied_operations = list(out["image"].applied_operations)
        inv = T.Invertd(keys="pred", transform=chain, orig_keys="image")(out)
        assert tuple(inv["pred"].shape) == SHAPE

    def test_multi_sample_crop_inverse(self):
        t = T.RandSpatialCropSamples(roi_size=(12, 12, 8), num_samples=3, random_size=False)
        img = _img()
        samples = t(img)
        assert len(samples) == 3
        for s in samples:
            inv = t.inverse(s)
            assert tuple(inv.shape) == SHAPE
