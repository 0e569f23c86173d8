"""Live parity vs the PyTorch reference for data-layer utilities: box ops,
collate/decollate, patch iteration, dataset partitioning, importance maps
(reference: monai/data/box_utils.py, monai/data/utils.py)."""
import numpy as np
import pytest

from monai_tpu.data import MetaImage
from monai_tpu.data import box_utils as B
from monai_tpu.data import utils as DU

from _ref import REF, to_np

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


def _boxes(n=6, seed=0, sd=2):
    rng = np.random.RandomState(seed)
    lo = rng.rand(n, sd).astype(np.float32) * 10
    hi = lo + rng.rand(n, sd).astype(np.float32) * 6 + 0.5
    return np.concatenate([lo, hi], axis=1)


# ---------------------------------------------------------------------------
# box ops
# ---------------------------------------------------------------------------

def test_box_area_iou_giou_parity():
    import torch
    b1, b2 = _boxes(6, 0), _boxes(4, 1)
    np.testing.assert_allclose(to_np(B.box_area(b1)),
                               to_np(REF.data.box_utils.box_area(torch.from_numpy(b1))),
                               rtol=1e-5)
    np.testing.assert_allclose(to_np(B.box_iou(b1, b2)),
                               to_np(REF.data.box_utils.box_iou(torch.from_numpy(b1),
                                                                torch.from_numpy(b2))),
                               atol=1e-5)
    np.testing.assert_allclose(to_np(B.box_giou(b1, b2)),
                               to_np(REF.data.box_utils.box_giou(torch.from_numpy(b1),
                                                                 torch.from_numpy(b2))),
                               atol=1e-5)
    np.testing.assert_allclose(to_np(B.box_pair_giou(b1[:4], b2)),
                               to_np(REF.data.box_utils.box_pair_giou(torch.from_numpy(b1[:4]),
                                                                      torch.from_numpy(b2))),
                               atol=1e-5)


def test_box_mode_conversion_parity():
    import torch
    b = _boxes(5, 2, sd=3)
    for dst in ("xyzwhd", "cccwhd", "xxyyzz"):
        ours = B.convert_box_mode(b, src_mode="xyzxyz", dst_mode=dst)
        ref = REF.data.box_utils.convert_box_mode(torch.from_numpy(b), src_mode="xyzxyz",
                                                  dst_mode=dst)
        np.testing.assert_allclose(to_np(ours), to_np(ref), atol=1e-5, err_msg=dst)
        # and back
        ours2 = B.convert_box_mode(to_np(ours), src_mode=dst, dst_mode="xyzxyz")
        np.testing.assert_allclose(to_np(ours2), b, atol=1e-4)


def test_box_clip_and_crop_parity():
    import torch
    b = _boxes(8, 3)
    ours, keep_o = B.spatial_crop_boxes(b, roi_start=(2, 2), roi_end=(12, 12))
    ref, keep_r = REF.data.box_utils.spatial_crop_boxes(torch.from_numpy(b),
                                                        roi_start=(2, 2), roi_end=(12, 12))
    np.testing.assert_allclose(to_np(ours), to_np(ref), atol=1e-5)
    np.testing.assert_array_equal(to_np(keep_o), to_np(keep_r))
    oc = B.clip_boxes_to_image(b, spatial_size=(11, 11))
    rc = REF.data.box_utils.clip_boxes_to_image(torch.from_numpy(b), spatial_size=(11, 11))
    np.testing.assert_allclose(to_np(oc[0]), to_np(rc[0]), atol=1e-5)


def test_nms_parity():
    import torch
    b = _boxes(12, 4)
    scores = np.random.RandomState(5).rand(12).astype(np.float32)
    ours = B.non_max_suppression(b, scores, nms_thresh=0.3)
    ref = REF.data.box_utils.non_max_suppression(torch.from_numpy(b),
                                                 torch.from_numpy(scores), nms_thresh=0.3)
    np.testing.assert_array_equal(np.asarray(ours), to_np(ref))


def test_centers_in_boxes_parity():
    import torch
    b = _boxes(5, 6)
    centers = np.random.RandomState(7).rand(5, 2).astype(np.float32) * 14
    ours = B.centers_in_boxes(centers, b)
    ref = REF.data.box_utils.centers_in_boxes(torch.from_numpy(centers), torch.from_numpy(b))
    np.testing.assert_array_equal(to_np(ours), to_np(ref))


def test_boxes_center_distance_parity():
    import torch
    b1, b2 = _boxes(4, 8), _boxes(3, 9)
    od, oc1, oc2 = B.boxes_center_distance(b1, b2)
    rd, rc1, rc2 = REF.data.box_utils.boxes_center_distance(torch.from_numpy(b1),
                                                            torch.from_numpy(b2))
    np.testing.assert_allclose(to_np(od), to_np(rd), atol=1e-4)
    np.testing.assert_allclose(to_np(oc1), to_np(rc1), atol=1e-5)


# ---------------------------------------------------------------------------
# patch iteration / importance map / partitioning
# ---------------------------------------------------------------------------

def test_dense_patch_slices_parity():
    for image_size, patch_size, interval in [((24, 24), (8, 8), (6, 6)),
                                             ((20, 30), (10, 10), (10, 10)),
                                             ((16, 16, 8), (8, 8, 8), (4, 4, 4))]:
        ours = DU.dense_patch_slices(image_size, patch_size, interval)
        ref = REF.data.utils.dense_patch_slices(image_size, patch_size, interval)
        assert ours == list(ref), (image_size, patch_size, interval)


def test_iter_patch_slices_parity():
    ours = list(DU.iter_patch_slices((12, 12), (6, 6), (4, 4)))
    ref = list(REF.data.utils.iter_patch_slices((12, 12), (6, 6), (4, 4)))
    assert ours == ref


def test_iter_patch_parity():
    # patch_size 0 on the channel dim = keep whole dim (the reference idiom)
    x = np.arange(64, dtype=np.float32).reshape(1, 8, 8)
    ours = [(np.asarray(p), np.asarray(c)) for p, c in DU.iter_patch(
        x.copy(), patch_size=(0, 4, 4), overlap=0.0, copy_back=False)]
    ref = [(np.asarray(p), np.asarray(c)) for p, c in REF.data.utils.iter_patch(
        x.copy(), patch_size=(0, 4, 4), overlap=0.0, copy_back=False)]
    assert len(ours) == len(ref) == 4
    for (op, oc), (rp, rc) in zip(ours, ref):
        np.testing.assert_array_equal(op, rp)
        np.testing.assert_array_equal(oc, rc)


def test_compute_importance_map_parity():
    import torch
    for mode in ("constant", "gaussian"):
        ours = DU.compute_importance_map((12, 12), mode=mode, sigma_scale=0.125)
        ref = REF.data.utils.compute_importance_map((12, 12), mode=mode, sigma_scale=0.125,
                                                    device="cpu")
        np.testing.assert_allclose(to_np(ours), to_np(ref), atol=1e-4, err_msg=mode)


def test_partition_dataset_parity():
    data = list(range(23))
    for kw in (dict(num_partitions=4), dict(num_partitions=4, shuffle=True, seed=42),
               dict(num_partitions=3, even_divisible=True, shuffle=False),
               dict(ratios=[2, 1], shuffle=False)):
        ours = DU.partition_dataset(data, **kw)
        ref = REF.data.utils.partition_dataset(data, **kw)
        assert [list(p) for p in ours] == [list(p) for p in ref], kw


def test_partition_dataset_classes_parity():
    data = list(range(20))
    classes = [i % 3 for i in range(20)]
    ours = DU.partition_dataset_classes(data, classes, num_partitions=4, shuffle=False)
    ref = REF.data.utils.partition_dataset_classes(data, classes, num_partitions=4,
                                                   shuffle=False)
    assert [list(p) for p in ours] == [list(p) for p in ref]


def test_select_cross_validation_folds_parity():
    parts = [[1, 2], [3, 4], [5, 6], [7, 8]]
    ours = DU.select_cross_validation_folds(parts, folds=[0, 2])
    ref = REF.data.utils.select_cross_validation_folds(parts, folds=[0, 2])
    assert list(ours) == list(ref)


# ---------------------------------------------------------------------------
# collate / decollate
# ---------------------------------------------------------------------------

def test_list_data_collate_and_decollate_roundtrip():
    rng = np.random.RandomState(0)
    items = [{"img": MetaImage(rng.rand(1, 4, 4).astype(np.float32), affine=np.eye(4)),
              "lbl": i, "name": f"s{i}"} for i in range(3)]
    batch = DU.list_data_collate(items)
    assert np.asarray(batch["img"].data).shape == (3, 1, 4, 4)
    out = DU.decollate_batch(batch)
    assert len(out) == 3
    for i, item in enumerate(out):
        np.testing.assert_allclose(np.asarray(item["img"].data),
                                   np.asarray(items[i]["img"].data))
        assert item["name"] == f"s{i}"


def test_pad_list_data_collate():
    rng = np.random.RandomState(0)
    items = [{"img": rng.rand(1, 4 + i, 4).astype(np.float32)} for i in range(3)]
    batch = DU.pad_list_data_collate(items)
    assert np.asarray(batch["img"].data if isinstance(batch["img"], MetaImage)
                      else batch["img"]).shape == (3, 1, 6, 4)


def test_decollate_nested_structures():
    batch = {"pred": np.ones((2, 3)), "meta": {"ids": ["a", "b"], "k": 5},
             "lst": [np.zeros((2,)), "shared"]}
    out = DU.decollate_batch(batch)
    assert len(out) == 2
    assert out[0]["meta"]["ids"] == "a" and out[1]["meta"]["ids"] == "b"
    assert out[0]["meta"]["k"] == 5 and out[1]["meta"]["k"] == 5


def test_get_valid_patch_size_and_random_patch():
    assert DU.get_valid_patch_size((10, 10), (4, 20)) == (4, 10)
    rng = np.random.RandomState(3)
    sl = DU.get_random_patch((10, 10), (4, 4), rand_state=rng)
    assert all(0 <= s.start and s.stop <= 10 for s in sl)
