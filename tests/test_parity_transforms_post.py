"""Live parity vs the PyTorch reference for post-processing transforms
(reference: monai/transforms/post/array.py)."""
import numpy as np
import pytest

import monai_tpu.transforms as T

from _ref import REF, allclose, to_np

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


def _run(name, kwargs, x, call_kwargs=None, atol=1e-4):
    import torch
    ours = getattr(T, name)(**kwargs)(x.copy(), **(call_kwargs or {}))
    ref = getattr(REF.transforms, name)(**kwargs)(torch.from_numpy(x.copy()), **(call_kwargs or {}))
    allclose(ours, ref, atol=atol, rtol=atol, msg=name)


def _logits(shape=(3, 12, 12), seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _binary_blobs(seed=1):
    x = np.zeros((1, 16, 16), dtype=np.float32)
    x[0, 2:6, 2:6] = 1
    x[0, 9:15, 9:15] = 1
    x[0, 3, 12] = 1  # small isolated speck
    return x


ACTIVATION_CASES = [
    ("Activations", dict(sigmoid=True)),
    ("Activations", dict(softmax=True)),
    ("Activations", dict(other=lambda x: x * 2)),
]


@pytest.mark.parametrize("name,kwargs", ACTIVATION_CASES, ids=["sigmoid", "softmax", "other"])
def test_activations_parity(name, kwargs):
    import torch
    x = _logits()
    kw_ref = dict(kwargs)
    if "other" in kwargs:
        kw_ref["other"] = lambda t: t * 2
    ours = getattr(T, name)(**kwargs)(x.copy())
    ref = getattr(REF.transforms, name)(**kw_ref)(torch.from_numpy(x.copy()))
    allclose(ours, ref, msg=name)


ASDISCRETE_CASES = [
    dict(argmax=True),
    dict(argmax=True, to_onehot=3),
    dict(threshold=0.5),
    dict(to_onehot=3),
    dict(argmax=True, dim=0, keepdim=True),
    dict(rounding="torchrounding"),
]


@pytest.mark.parametrize("kwargs", ASDISCRETE_CASES,
                         ids=[f"case{i}" for i in range(len(ASDISCRETE_CASES))])
def test_as_discrete_parity(kwargs):
    x = _logits()
    if kwargs.get("to_onehot") and not kwargs.get("argmax"):
        x = np.random.RandomState(0).randint(0, 3, (1, 12, 12)).astype(np.float32)
    if "threshold" in kwargs or "rounding" in kwargs:
        x = np.random.RandomState(0).rand(2, 12, 12).astype(np.float32)
    _run("AsDiscrete", kwargs, x)


def test_keep_largest_connected_component_behavior():
    # reference needs skimage.measure (absent) — assert CC semantics directly
    x = _binary_blobs()
    out = to_np(T.KeepLargestConnectedComponent(applied_labels=[1])(x.copy()))
    assert out[0, 9:15, 9:15].sum() == 36  # largest blob kept
    assert out[0, 2:6, 2:6].sum() == 0  # smaller blob dropped
    assert out[0, 3, 12] == 0  # speck dropped
    out2 = to_np(T.KeepLargestConnectedComponent(applied_labels=[1], num_components=2)(x.copy()))
    assert out2[0, 9:15, 9:15].sum() == 36 and out2[0, 2:6, 2:6].sum() == 16
    assert out2[0, 3, 12] == 0


def test_keep_largest_cc_multiclass_behavior():
    x = np.zeros((1, 16, 16), dtype=np.float32)
    x[0, 2:6, 2:6] = 1
    x[0, 9:15, 9:15] = 2
    x[0, 1, 12] = 2
    x[0, 12, 2] = 1
    out = to_np(T.KeepLargestConnectedComponent(applied_labels=[1, 2])(x.copy()))
    assert out[0, 2:6, 2:6].sum() == 16 and (out[0, 9:15, 9:15] == 2).all()
    assert out[0, 1, 12] == 0 and out[0, 12, 2] == 0  # per-class specks dropped


def test_remove_small_objects_behavior():
    x = _binary_blobs()
    out = to_np(T.RemoveSmallObjects(min_size=5)(x.copy()))
    assert out[0, 3, 12] == 0  # 1-px speck removed
    assert out[0, 2:6, 2:6].sum() == 16 and out[0, 9:15, 9:15].sum() == 36
    out2 = to_np(T.RemoveSmallObjects(min_size=20)(x.copy()))
    assert out2[0, 2:6, 2:6].sum() == 0 and out2[0, 9:15, 9:15].sum() == 36


def test_fill_holes_parity():
    x = np.zeros((1, 12, 12), dtype=np.float32)
    x[0, 2:9, 2:9] = 1
    x[0, 4:6, 4:6] = 0  # hole
    _run("FillHoles", dict(), x)
    _run("FillHoles", dict(applied_labels=[1]), x)


def test_label_to_contour_parity():
    x = np.zeros((1, 12, 12), dtype=np.float32)
    x[0, 3:9, 3:9] = 1
    _run("LabelToContour", dict(kernel_type="Laplace"), x, atol=1e-3)


def test_sobel_gradients_parity():
    x = np.random.RandomState(0).rand(1, 12, 12).astype(np.float32)
    _run("SobelGradients", dict(kernel_size=3), x, atol=1e-3)
    _run("SobelGradients", dict(kernel_size=5, spatial_axes=[0]), x, atol=1e-3)


def test_mean_ensemble_parity():
    import torch
    preds = [np.random.RandomState(i).rand(2, 8, 8).astype(np.float32) for i in range(3)]
    ours = T.MeanEnsemble()([p.copy() for p in preds])
    ref = REF.transforms.MeanEnsemble()([torch.from_numpy(p.copy()) for p in preds])
    allclose(ours, ref, msg="MeanEnsemble")
    w = [1.0, 2.0, 3.0]
    ours = T.MeanEnsemble(weights=w)([p.copy() for p in preds])
    ref = REF.transforms.MeanEnsemble(weights=w)([torch.from_numpy(p.copy()) for p in preds])
    allclose(ours, ref, msg="MeanEnsemble-weighted")


def test_vote_ensemble_parity():
    import torch
    preds = [np.random.RandomState(i).randint(0, 3, (1, 8, 8)).astype(np.float32)
             for i in range(5)]
    ours = T.VoteEnsemble(num_classes=3)([p.copy() for p in preds])
    ref = REF.transforms.VoteEnsemble(num_classes=3)([torch.from_numpy(p.copy()) for p in preds])
    allclose(ours, ref, msg="VoteEnsemble")


def test_prob_nms_parity():
    import torch
    x = np.random.RandomState(0).rand(12, 12).astype(np.float32)
    ours = T.ProbNMS(spatial_dims=2, prob_threshold=0.5, box_size=4)(x.copy())
    ref = REF.transforms.ProbNMS(spatial_dims=2, prob_threshold=0.5, box_size=4)(
        torch.from_numpy(x.copy()))
    assert len(ours) == len(ref)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o, dtype=np.float64),
                                   np.asarray([float(v) for v in r], dtype=np.float64),
                                   atol=1e-5)


def test_distance_transform_edt_parity():
    x = np.zeros((1, 12, 12), dtype=np.float32)
    x[0, 3:9, 4:10] = 1
    _run("DistanceTransformEDT", dict(), x, atol=1e-4)


def test_median_smooth_invert_roundtrip():
    # Invert applies the tracked inverse on predictions: spot-check via Compose
    from monai_tpu.data import MetaImage
    x = np.random.RandomState(0).rand(1, 12, 12).astype(np.float32)
    c = T.Compose([T.Flip(spatial_axis=0), T.SpatialPad(spatial_size=(16, 16))])
    out = c(MetaImage(x.copy(), affine=np.eye(4)))
    back = c.inverse(out)
    np.testing.assert_allclose(np.asarray(back.data), x, atol=1e-6)
