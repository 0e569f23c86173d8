"""Live parity vs the reference for the deepgrow crop/guidance/restore transforms
(reference: monai/apps/deepgrow/transforms.py:349-980)."""
import numpy as np
import pytest

from _ref import REF

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


def _seg_sample():
    rng = np.random.RandomState(0)
    img = rng.rand(1, 24, 24, 24).astype(np.float32)
    lab = np.zeros((1, 24, 24, 24), np.float32)
    lab[0, 8:16, 6:14, 10:20] = 1
    return img, lab


def test_spatial_crop_foregroundd_parity():
    from monai.apps.deepgrow.transforms import SpatialCropForegroundd as RefT

    from monai_tpu.apps.deepgrow.transforms import SpatialCropForegroundd

    img, lab = _seg_sample()
    data = {"image": img.copy(), "label": lab.copy(),
            "image_meta_dict": {}, "label_meta_dict": {}}
    ours = SpatialCropForegroundd(keys=["image", "label"], source_key="label",
                                  spatial_size=[16, 16, 16])(dict(data))
    ref = RefT(keys=["image", "label"], source_key="label",
               spatial_size=[16, 16, 16])({k: (v.copy() if hasattr(v, "copy") else dict(v))
                                           for k, v in data.items()})
    np.testing.assert_allclose(np.asarray(ours["image"]), np.asarray(ref["image"]), atol=1e-6)
    np.testing.assert_array_equal(ours["image_meta_dict"]["foreground_start_coord"],
                                  np.asarray(ref["image_meta_dict"]["foreground_start_coord"]))
    np.testing.assert_array_equal(ours["image_meta_dict"]["foreground_end_coord"],
                                  np.asarray(ref["image_meta_dict"]["foreground_end_coord"]))


def test_add_guidance_from_points_2d_and_3d():
    from monai.apps.deepgrow.transforms import AddGuidanceFromPointsd as RefT

    from monai_tpu.apps.deepgrow.transforms import AddGuidanceFromPointsd

    img = np.random.RandomState(0).rand(10, 20, 20).astype(np.float32)  # (D, H, W)
    base = {"image": img, "image_meta_dict": {"spatial_shape": [20, 20, 10]},
            "foreground": [[3, 5, 4], [7, 9, 4]], "background": [[2, 2, 4]]}
    for dims in (2, 3):
        ours = AddGuidanceFromPointsd(ref_image="image", spatial_dims=dims)(dict(base))
        ref = RefT(ref_image="image", spatial_dims=dims)(dict(base))
        assert ours["guidance"] == ref["guidance"], (dims, ours["guidance"], ref["guidance"])


def test_spatial_crop_guidanced_and_resize_guidanced():
    from monai.apps.deepgrow.transforms import (ResizeGuidanced as RefRG,
                                                SpatialCropGuidanced as RefSC)

    from monai_tpu.apps.deepgrow.transforms import ResizeGuidanced, SpatialCropGuidanced

    img, _ = _seg_sample()
    guidance = [[[10, 8, 12], [14, 10, 16]], [[4, 4, 4]]]
    data = {"image": img.copy(), "guidance": [list(guidance[0]), list(guidance[1])],
            "image_meta_dict": {}}
    ours = SpatialCropGuidanced(keys="image", guidance="guidance",
                                spatial_size=[12, 12, 12], margin=3)(dict(data))
    ref = RefSC(keys="image", guidance="guidance",
                spatial_size=[12, 12, 12], margin=3)(dict(data))
    np.testing.assert_allclose(np.asarray(ours["image"]), np.asarray(ref["image"]), atol=1e-6)
    assert ours["guidance"] == ref["guidance"]

    # now pretend the crop was resized to 20^3 and rescale the clicks
    d2_ours = dict(ours)
    d2_ours["image"] = np.zeros((1, 20, 20, 20), np.float32)
    d2_ref = dict(ref)
    d2_ref["image"] = np.zeros((1, 20, 20, 20), np.float32)
    o = ResizeGuidanced(guidance="guidance", ref_image="image")(d2_ours)
    r = RefRG(guidance="guidance", ref_image="image")(d2_ref)
    assert o["guidance"] == r["guidance"]


def test_fetch2d_sliced_parity():
    from monai.apps.deepgrow.transforms import Fetch2DSliced as RefT

    from monai_tpu.apps.deepgrow.transforms import Fetch2DSliced

    img = np.random.RandomState(1).rand(10, 16, 16).astype(np.float32)
    data = {"image": img, "guidance": [[[1, 2]], [], 4], "image_meta_dict": {}}
    ours = Fetch2DSliced(keys="image")(dict(data))
    ref = RefT(keys="image")(dict(data))
    np.testing.assert_allclose(np.asarray(ours["image"]), np.asarray(ref["image"]))
    assert tuple(ours["image_meta_dict"]["slice_idx"]) == tuple(ref["image_meta_dict"]["slice_idx"])


def test_restore_labeld_roundtrip():
    """Crop -> resize -> RestoreLabeld puts the label back at its original place."""
    from monai_tpu.apps.deepgrow.transforms import RestoreLabeld, SpatialCropGuidanced
    from monai_tpu.transforms.spatial_array import Resize

    img, lab = _seg_sample()
    data = {"image": img.copy(), "guidance": [[[10, 8, 12]], []],
            "image_meta_dict": {"spatial_shape": [24, 24, 24],
                                "original_affine": np.eye(4)}}
    d = SpatialCropGuidanced(keys="image", guidance="guidance", spatial_size=[12, 12, 12],
                             margin=4)(data)
    cropped_shape = d["image"].shape
    pred = np.asarray(Resize(spatial_size=(16, 16, 16), mode="nearest")(np.asarray(d["image"])))
    d["pred"] = pred
    d["pred_meta_dict"] = {}
    out = RestoreLabeld(keys="pred", ref_image="image", mode="nearest")(d)
    res = out["pred"]
    assert res.shape == (24, 24, 24)
    # the restored region must carry the cropped content's mass
    box_start = d["image_meta_dict"]["foreground_start_coord"]
    box_end = d["image_meta_dict"]["foreground_end_coord"]
    inner = res[tuple(slice(int(s), int(e)) for s, e in zip(box_start, box_end))]
    assert np.abs(inner).sum() > 0
