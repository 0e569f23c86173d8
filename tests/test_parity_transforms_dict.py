"""Live parity vs the PyTorch reference for DICT transforms: shared randomness
across keys, per-key modes, and Compose pipelines (reference:
monai/transforms/*/dictionary.py)."""
import numpy as np
import pytest

import monai_tpu.transforms as T
from monai_tpu.data import MetaImage

from _ref import REF, allclose, to_np

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


def _data(seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(1, 16, 14).astype(np.float32)
    seg = (rng.rand(1, 16, 14) > 0.5).astype(np.float32)
    import torch
    ours = {"image": MetaImage(img.copy(), affine=np.eye(4)),
            "label": MetaImage(seg.copy(), affine=np.eye(4))}
    ref = {"image": REF.data.MetaTensor(torch.from_numpy(img.copy()), affine=torch.eye(4)),
           "label": REF.data.MetaTensor(torch.from_numpy(seg.copy()), affine=torch.eye(4))}
    return ours, ref


def _check_dict(ours, ref, name, keys=("image", "label"), atol=1e-4):
    if isinstance(ours, (list, tuple)):
        assert len(ours) == len(ref)
        for i, (o, r) in enumerate(zip(ours, ref)):
            _check_dict(o, r, f"{name}[{i}]", keys, atol)
        return
    for k in keys:
        allclose(ours[k], ref[k], atol=atol, rtol=atol, msg=f"{name}:{k}")


DICT_CASES = [
    ("RandFlipd", dict(keys=["image", "label"], prob=1.0, spatial_axis=0)),
    ("RandRotate90d", dict(keys=["image", "label"], prob=1.0, max_k=3)),
    ("RandRotated", dict(keys=["image", "label"], range_x=0.4, prob=1.0,
                         mode=["bilinear", "nearest"])),
    ("RandZoomd", dict(keys=["image", "label"], prob=1.0, min_zoom=0.8, max_zoom=1.2,
                       mode=["bilinear", "nearest"])),
    ("RandAffined", dict(keys=["image", "label"], prob=1.0, rotate_range=0.3,
                         translate_range=2.0, mode=["bilinear", "nearest"],
                         padding_mode="zeros")),
    ("RandGaussianNoised", dict(keys=["image"], prob=1.0, std=0.1)),
    ("RandShiftIntensityd", dict(keys=["image"], offsets=1.0, prob=1.0)),
    ("RandBiasFieldd", dict(keys=["image"], prob=1.0)),
    ("RandCoarseDropoutd", dict(keys=["image", "label"], holes=2, spatial_size=4, prob=1.0)),
    # pixdim 1.2 produces no exact .5 coordinate ties (2i mod 10 != 5); tie voxels
    # are inherently unstable under torch's normalized-coordinate round-trip and are
    # bounded separately below
    ("Spacingd", dict(keys=["image", "label"], pixdim=(1.2, 1.2),
                      mode=["bilinear", "nearest"])),
    ("Flipd", dict(keys=["image", "label"], spatial_axis=1)),
    ("Resized", dict(keys=["image", "label"], spatial_size=(20, 18),
                     mode=["bilinear", "nearest"])),
    ("ScaleIntensityd", dict(keys=["image"], minv=0.0, maxv=1.0)),
    ("NormalizeIntensityd", dict(keys=["image"])),
    ("SpatialPadd", dict(keys=["image", "label"], spatial_size=(20, 20))),
    ("CenterSpatialCropd", dict(keys=["image", "label"], roi_size=(10, 10))),
]


@pytest.mark.parametrize("name,kwargs", DICT_CASES, ids=[c[0] for c in DICT_CASES])
def test_dict_transform_parity(name, kwargs):
    ours_d, ref_d = _data()
    ours_t = getattr(T, name)(**kwargs)
    ref_t = getattr(REF.transforms, name)(**kwargs)
    if hasattr(ours_t, "set_random_state"):
        ours_t.set_random_state(23)
        ref_t.set_random_state(23)
    keys = tuple(kwargs["keys"])
    _check_dict(ours_t(ours_d), ref_t(ref_d), name, keys=keys)


def test_rand_crop_by_pos_neg_labeld_parity():
    import torch
    ours_d, ref_d = _data()
    kw = dict(keys=["image", "label"], label_key="label", spatial_size=(8, 8),
              pos=1, neg=1, num_samples=3)
    ours_t = T.RandCropByPosNegLabeld(**kw)
    ref_t = REF.transforms.RandCropByPosNegLabeld(**kw)
    ours_t.set_random_state(31)
    ref_t.set_random_state(31)
    _check_dict(ours_t(ours_d), ref_t(ref_d), "RandCropByPosNegLabeld")


def test_rand_spatial_crop_samplesd_parity():
    kw = dict(keys=["image", "label"], roi_size=(8, 8), num_samples=2, random_size=False)
    ours_d, ref_d = _data()
    ours_t = T.RandSpatialCropSamplesd(**kw)
    ref_t = REF.transforms.RandSpatialCropSamplesd(**kw)
    ours_t.set_random_state(17)
    ref_t.set_random_state(17)
    _check_dict(ours_t(ours_d), ref_t(ref_d), "RandSpatialCropSamplesd")


def test_crop_foregroundd_parity():
    import torch
    rng = np.random.RandomState(1)
    img = np.zeros((1, 16, 14), dtype=np.float32)
    img[0, 4:12, 3:9] = rng.rand(8, 6) + 0.5
    ours_d = {"image": MetaImage(img.copy(), affine=np.eye(4))}
    ref_d = {"image": REF.data.MetaTensor(torch.from_numpy(img.copy()), affine=torch.eye(4))}
    kw = dict(keys=["image"], source_key="image", margin=1)
    ours = T.CropForegroundd(**kw)(ours_d)
    ref = REF.transforms.CropForegroundd(**kw)(ref_d)
    _check_dict(ours, ref, "CropForegroundd", keys=("image",))


def test_compose_pipeline_parity():
    """A realistic training pipeline: every step seeded, final outputs equal."""
    import torch
    ours_d, ref_d = _data(3)
    ours_c = T.Compose([
        T.ScaleIntensityd(keys="image"),
        T.RandFlipd(keys=["image", "label"], prob=1.0, spatial_axis=0),
        T.RandShiftIntensityd(keys="image", offsets=0.5, prob=1.0),
        T.SpatialPadd(keys=["image", "label"], spatial_size=(20, 20)),
    ])
    ref_c = REF.transforms.Compose([
        REF.transforms.ScaleIntensityd(keys="image"),
        REF.transforms.RandFlipd(keys=["image", "label"], prob=1.0, spatial_axis=0),
        REF.transforms.RandShiftIntensityd(keys="image", offsets=0.5, prob=1.0),
        REF.transforms.SpatialPadd(keys=["image", "label"], spatial_size=(20, 20)),
    ])
    ours_c.set_random_state(99)
    ref_c.set_random_state(99)
    _check_dict(ours_c(ours_d), ref_c(ref_d), "Compose")


def test_compose_inverse_parity():
    ours_d, ref_d = _data(4)
    ours_c = T.Compose([T.Spacingd(keys=["image"], pixdim=(1.4, 1.4)),
                        T.SpatialPadd(keys=["image"], spatial_size=(24, 24)),
                        T.Flipd(keys=["image"], spatial_axis=0)])
    ref_c = REF.transforms.Compose([
        REF.transforms.Spacingd(keys=["image"], pixdim=(1.4, 1.4)),
        REF.transforms.SpatialPadd(keys=["image"], spatial_size=(24, 24)),
        REF.transforms.Flipd(keys=["image"], spatial_axis=0)])
    ours_out = ours_c(ours_d)
    ref_out = ref_c(ref_d)
    ours_inv = ours_c.inverse(ours_out)
    ref_inv = ref_c.inverse(ref_out)
    _check_dict(ours_inv, ref_inv, "Compose.inverse", keys=("image",), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_inv["image"].affine),
                               to_np(ref_inv["image"].affine), atol=1e-5)


def test_oneof_someof_randomorder_seeded():
    """Container transforms pick the same branches under the same seed."""
    ours_d, ref_d = _data(5)
    ours_c = T.OneOf([T.RandFlipd(keys=["image"], prob=1.0, spatial_axis=0),
                      T.RandShiftIntensityd(keys=["image"], offsets=1.0, prob=1.0)])
    ref_c = REF.transforms.OneOf([
        REF.transforms.RandFlipd(keys=["image"], prob=1.0, spatial_axis=0),
        REF.transforms.RandShiftIntensityd(keys=["image"], offsets=1.0, prob=1.0)])
    ours_c.set_random_state(7)
    ref_c.set_random_state(7)
    _check_dict(ours_c(ours_d), ref_c(ref_d), "OneOf", keys=("image",))


def test_invertd_restores_label_space():
    """Invertd applies the recorded inverse to predictions."""
    ours_d, _ = _data(6)
    pipeline = T.Compose([T.Spacingd(keys=["image"], pixdim=(1.5, 1.5)),
                          T.SpatialPadd(keys=["image"], spatial_size=(24, 24))])
    out = pipeline(ours_d)
    out["pred"] = MetaImage(np.asarray(out["image"].data).copy(),
                            affine=np.asarray(out["image"].affine).copy())
    out["pred"].applied_operations = list(out["image"].applied_operations)
    inverter = T.Invertd(keys="pred", transform=pipeline, orig_keys="image")
    restored = inverter(out)
    assert np.asarray(restored["pred"].data).shape == (1, 16, 14)
    np.testing.assert_allclose(np.asarray(restored["pred"].affine), np.eye(4), atol=1e-6)


def test_spacingd_nearest_tie_voxels_bounded():
    """With an inexact pixdim (1.3), exact .5-tie voxels may round differently from
    torch's normalized-coordinate path; everything else must match."""
    import torch
    ours_d, ref_d = _data(8)
    kw = dict(keys=["label"], pixdim=(1.3, 1.3), mode="nearest")
    ours = T.Spacingd(**kw)(ours_d)
    ref = REF.transforms.Spacingd(**kw)(ref_d)
    o, r = np.asarray(ours["label"].data), to_np(ref["label"])
    assert o.shape == r.shape
    frac = (o != r).mean()
    assert frac < 0.08, f"too many differing voxels: {frac:.3f}"
