"""Live parity vs the PyTorch reference for crop/pad transforms
(reference: monai/transforms/croppad/array.py)."""
import numpy as np
import pytest

import monai_tpu.transforms as T
from monai_tpu.data import MetaImage

from _ref import REF, allclose, to_np

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


def _pair(shape=(1, 16, 14), seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(*shape).astype(np.float32)
    import torch
    return (MetaImage(x.copy(), affine=np.eye(4)),
            REF.data.MetaTensor(torch.from_numpy(x.copy()), affine=torch.eye(4)))


def _check(ours, ref, name, check_affine=True):
    if isinstance(ours, (list, tuple)):
        assert len(ours) == len(ref), f"{name}: {len(ours)} vs {len(ref)} samples"
        for i, (o, r) in enumerate(zip(ours, ref)):
            _check(o, r, f"{name}[{i}]", check_affine)
        return
    allclose(ours, ref, atol=1e-5, rtol=1e-5, msg=name)
    if check_affine and isinstance(ours, MetaImage) and hasattr(ref, "affine"):
        np.testing.assert_allclose(np.asarray(ours.affine), to_np(ref.affine),
                                   atol=1e-5, err_msg=f"{name} affine")


def _run(name, kwargs, seed=None, shape=(1, 16, 14), check_affine=True):
    ours_img, ref_img = _pair(shape)
    ours_t = getattr(T, name)(**kwargs)
    ref_t = getattr(REF.transforms, name)(**kwargs)
    if seed is not None:
        ours_t.set_random_state(seed)
        ref_t.set_random_state(seed)
    _check(ours_t(ours_img), ref_t(ref_img), name, check_affine)


DETERMINISTIC = [
    ("SpatialPad", dict(spatial_size=(20, 20))),
    ("SpatialPad", dict(spatial_size=(20, 20), method="end")),
    ("SpatialPad", dict(spatial_size=(20, 20), mode="reflect")),
    ("SpatialPad", dict(spatial_size=(20, 20), mode="edge")),
    ("SpatialPad", dict(spatial_size=(20, 20), mode="constant", constant_values=3.0)),
    ("SpatialPad", dict(spatial_size=(10, 20))),  # partial: only pad dims that need it
    ("BorderPad", dict(spatial_border=2)),
    ("BorderPad", dict(spatial_border=(1, 3))),
    ("BorderPad", dict(spatial_border=(1, 2, 3, 4))),
    ("DivisiblePad", dict(k=5)),
    ("DivisiblePad", dict(k=(4, 8), method="end")),
    ("SpatialCrop", dict(roi_center=(8, 7), roi_size=(8, 6))),
    ("SpatialCrop", dict(roi_start=(2, 3), roi_end=(12, 11))),
    ("SpatialCrop", dict(roi_slices=[slice(1, 9), slice(2, 10)])),
    ("CenterSpatialCrop", dict(roi_size=(8, 9))),
    ("CenterSpatialCrop", dict(roi_size=(32, 9))),  # roi bigger than image in one dim
    ("CenterScaleCrop", dict(roi_scale=(0.6, 0.5))),
    ("ResizeWithPadOrCrop", dict(spatial_size=(20, 10))),
    ("ResizeWithPadOrCrop", dict(spatial_size=(8, 20), mode="edge")),
]


@pytest.mark.parametrize("name,kwargs", DETERMINISTIC,
                         ids=[f"{n}-{i}" for i, (n, _) in enumerate(DETERMINISTIC)])
def test_deterministic_croppad_parity(name, kwargs):
    _run(name, kwargs)


def test_crop_foreground_parity():
    import torch
    x = np.zeros((1, 16, 14), dtype=np.float32)
    x[0, 4:12, 3:9] = np.random.RandomState(1).rand(8, 6) + 0.5
    for kw in (dict(), dict(margin=2), dict(k_divisible=4), dict(allow_smaller=True)):
        ours_t = T.CropForeground(**kw)
        ref_t = REF.transforms.CropForeground(**kw)
        ours = ours_t(MetaImage(x.copy(), affine=np.eye(4)))
        ref = ref_t(REF.data.MetaTensor(torch.from_numpy(x.copy()), affine=torch.eye(4)))
        _check(ours, ref, f"CropForeground-{kw}")


def test_bounding_rect_parity():
    x = np.zeros((2, 16, 14), dtype=np.float32)
    x[0, 4:12, 3:9] = 1.0
    x[1, 2:5, 6:13] = 1.0
    ours = T.BoundingRect()(x.copy())
    import torch
    ref = REF.transforms.BoundingRect()(torch.from_numpy(x.copy()))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


RANDOM = [
    ("RandSpatialCrop", dict(roi_size=(8, 6), random_size=False)),
    ("RandSpatialCrop", dict(roi_size=(8, 6), random_size=True)),
    ("RandSpatialCrop", dict(roi_size=(8, 6), random_center=False, random_size=False)),
    ("RandScaleCrop", dict(roi_scale=0.6, random_size=False)),
]


@pytest.mark.parametrize("name,kwargs", RANDOM,
                         ids=[f"{n}-{i}" for i, (n, _) in enumerate(RANDOM)])
def test_random_croppad_parity(name, kwargs):
    _run(name, kwargs, seed=11)


def test_rand_spatial_crop_samples_parity():
    import torch
    x = np.random.RandomState(0).rand(1, 16, 14).astype(np.float32)
    ours_t = T.RandSpatialCropSamples(roi_size=(8, 6), num_samples=3, random_size=False)
    ref_t = REF.transforms.RandSpatialCropSamples(roi_size=(8, 6), num_samples=3, random_size=False)
    ours_t.set_random_state(5)
    ref_t.set_random_state(5)
    ours = ours_t(MetaImage(x.copy(), affine=np.eye(4)))
    ref = ref_t(REF.data.MetaTensor(torch.from_numpy(x.copy()), affine=torch.eye(4)))
    _check(list(ours), list(ref), "RandSpatialCropSamples")


def test_rand_weighted_crop_parity():
    import torch
    x = np.random.RandomState(0).rand(1, 16, 14).astype(np.float32)
    w = np.zeros((1, 16, 14), dtype=np.float32)
    w[0, 10, 4] = 1.0
    ours_t = T.RandWeightedCrop(spatial_size=(6, 6), num_samples=2)
    ref_t = REF.transforms.RandWeightedCrop(spatial_size=(6, 6), num_samples=2)
    ours_t.set_random_state(3)
    ref_t.set_random_state(3)
    ours = ours_t(MetaImage(x.copy(), affine=np.eye(4)), weight_map=w)
    ref = ref_t(REF.data.MetaTensor(torch.from_numpy(x.copy()), affine=torch.eye(4)),
                weight_map=torch.from_numpy(w.copy()))
    _check(list(ours), list(ref), "RandWeightedCrop")


def test_rand_crop_by_pos_neg_label_parity():
    import torch
    x = np.random.RandomState(0).rand(1, 16, 14).astype(np.float32)
    lbl = np.zeros((1, 16, 14), dtype=np.float32)
    lbl[0, 5:10, 4:9] = 1.0
    kw = dict(spatial_size=(6, 6), pos=1, neg=1, num_samples=4)
    ours_t = T.RandCropByPosNegLabel(**kw)
    ref_t = REF.transforms.RandCropByPosNegLabel(**kw)
    ours_t.set_random_state(9)
    ref_t.set_random_state(9)
    ours = ours_t(MetaImage(x.copy(), affine=np.eye(4)), label=lbl)
    ref = ref_t(REF.data.MetaTensor(torch.from_numpy(x.copy()), affine=torch.eye(4)),
                label=torch.from_numpy(lbl.copy()))
    _check(list(ours), list(ref), "RandCropByPosNegLabel")


def test_rand_crop_by_label_classes_parity():
    import torch
    x = np.random.RandomState(0).rand(1, 16, 14).astype(np.float32)
    lbl = np.zeros((1, 16, 14), dtype=np.int64)
    lbl[0, 5:10, 4:9] = 1
    lbl[0, 11:14, 10:13] = 2
    kw = dict(spatial_size=(6, 6), ratios=[1, 2, 3], num_classes=3, num_samples=4)
    ours_t = T.RandCropByLabelClasses(**kw)
    ref_t = REF.transforms.RandCropByLabelClasses(**kw)
    ours_t.set_random_state(13)
    ref_t.set_random_state(13)
    ours = ours_t(MetaImage(x.copy(), affine=np.eye(4)), label=lbl)
    ref = ref_t(REF.data.MetaTensor(torch.from_numpy(x.copy()), affine=torch.eye(4)),
                label=torch.from_numpy(lbl.copy()))
    _check(list(ours), list(ref), "RandCropByLabelClasses")


def test_croppad_invertibility_vs_reference():
    """Inverted crops/pads must restore original shape AND match the reference's
    inverted output voxel-for-voxel."""
    import torch
    x = np.random.RandomState(0).rand(1, 16, 14).astype(np.float32)
    for name, kwargs in [("SpatialPad", dict(spatial_size=(20, 20))),
                         ("CenterSpatialCrop", dict(roi_size=(8, 9))),
                         ("BorderPad", dict(spatial_border=2))]:
        ours_t = getattr(T, name)(**kwargs)
        ref_t = getattr(REF.transforms, name)(**kwargs)
        o = ours_t(MetaImage(x.copy(), affine=np.eye(4)))
        r = ref_t(REF.data.MetaTensor(torch.from_numpy(x.copy()), affine=torch.eye(4)))
        o_inv = ours_t.inverse(o)
        r_inv = ref_t.inverse(r)
        _check(o_inv, r_inv, f"{name}.inverse", check_affine=True)
