"""Lazy-vs-eager consistency for EVERY lazy spatial/croppad transform
(reference harness: tests/lazy_transforms_utils.py:30 test_resampler_lazy).

For each transform: eager output (lazy=False) must match the output of the same
transform executed lazily inside Compose(lazy=True) (pending ops fused and flushed
once at the end), and metadata (affine/shape) must agree.
"""
import numpy as np
import pytest

import monai_tpu.transforms as T
from monai_tpu.data import MetaImage

AFFINE = np.diag([1.2, 1.2, 2.0, 1.0])


def _img3d(seed=0, shape=(1, 24, 24, 16)):
    return MetaImage(np.random.RandomState(seed).rand(*shape).astype(np.float32),
                     affine=AFFINE.copy())


# every lazy array transform with canonical constructor args
LAZY_CASES = [
    ("Spacing", lambda: T.Spacing(pixdim=(1.5, 1.5, 1.5), mode="bilinear")),
    ("Orientation", lambda: T.Orientation(axcodes="RAS")),
    ("Flip", lambda: T.Flip(spatial_axis=(0, 1))),
    ("Resize", lambda: T.Resize(spatial_size=(20, 18, 12), mode="trilinear")),
    ("Rotate", lambda: T.Rotate(angle=(0.3, 0.0, 0.0), mode="bilinear", keep_size=True)),
    ("Rotate90", lambda: T.Rotate90(k=1, spatial_axes=(0, 1))),
    ("Zoom", lambda: T.Zoom(zoom=1.3, mode="trilinear", keep_size=True)),
    ("Affine", lambda: T.Affine(rotate_params=(0.2, 0, 0), scale_params=(1.1, 0.9, 1.0),
                                padding_mode="zeros", image_only=True)),
    ("SpatialCrop", lambda: T.SpatialCrop(roi_center=(12, 12, 8), roi_size=(16, 16, 10))),
    ("CenterSpatialCrop", lambda: T.CenterSpatialCrop(roi_size=(16, 16, 10))),
    ("CenterScaleCrop", lambda: T.CenterScaleCrop(roi_scale=(0.6, 0.6, 0.8))),
    ("SpatialPad", lambda: T.SpatialPad(spatial_size=(30, 30, 20))),
    ("BorderPad", lambda: T.BorderPad(spatial_border=2)),
    ("DivisiblePad", lambda: T.DivisiblePad(k=8)),
    ("ResizeWithPadOrCrop", lambda: T.ResizeWithPadOrCrop(spatial_size=(28, 20, 12))),
]

RAND_LAZY_CASES = [
    ("RandFlip", lambda: T.RandFlip(prob=1.0, spatial_axis=(0,))),
    ("RandAxisFlip", lambda: T.RandAxisFlip(prob=1.0)),
    ("RandRotate90", lambda: T.RandRotate90(prob=1.0, spatial_axes=(0, 1))),
    ("RandRotate", lambda: T.RandRotate(prob=1.0, range_x=0.4, keep_size=True)),
    ("RandZoom", lambda: T.RandZoom(prob=1.0, min_zoom=0.8, max_zoom=1.2, keep_size=True)),
    ("RandAffine", lambda: T.RandAffine(prob=1.0, rotate_range=(0.2, 0, 0),
                                        scale_range=(0.1, 0.1, 0.1), padding_mode="zeros")),
    ("RandSpatialCrop", lambda: T.RandSpatialCrop(roi_size=(16, 16, 10), random_size=False)),
    ("RandScaleCrop", lambda: T.RandScaleCrop(roi_scale=(0.7, 0.7, 0.8), random_size=False)),
]


def _run_pair(build, seed=None):
    """Return (eager_out, lazy_out) for identical transform instances/randomness.
    Seeding happens AFTER Compose construction (Compose reseeds its transforms)."""
    t_eager = build()
    t_lazy = build()
    comp = T.Compose([t_lazy], lazy=True)
    if seed is not None:
        t_eager.set_random_state(seed)
        t_lazy.set_random_state(seed)
    eager = t_eager(_img3d())
    lazy = comp(_img3d())
    return eager, lazy


@pytest.mark.parametrize("name,build", LAZY_CASES, ids=[c[0] for c in LAZY_CASES])
def test_lazy_equals_eager(name, build):
    eager, lazy = _run_pair(build)
    assert tuple(eager.shape) == tuple(lazy.shape), name
    np.testing.assert_allclose(np.asarray(lazy.affine), np.asarray(eager.affine),
                               atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(lazy.data), np.asarray(eager.data),
                               atol=2e-3, err_msg=name)


@pytest.mark.parametrize("name,build", RAND_LAZY_CASES, ids=[c[0] for c in RAND_LAZY_CASES])
def test_lazy_equals_eager_random(name, build):
    eager, lazy = _run_pair(build, seed=42)
    assert tuple(eager.shape) == tuple(lazy.shape), name
    np.testing.assert_allclose(np.asarray(lazy.affine), np.asarray(eager.affine),
                               atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(lazy.data), np.asarray(eager.data),
                               atol=2e-3, err_msg=name)


class TestLazyFusion:
    def test_chain_fuses_to_one_applied_op(self):
        chain = T.Compose([
            T.Spacing(pixdim=(1.5, 1.5, 1.5)),
            T.Flip(spatial_axis=(0,)),
            T.Resize(spatial_size=(20, 20, 12)),
        ], lazy=True)
        out = chain(_img3d())
        # the lazy engine fuses the whole chain into ONE resample, but tracing keeps
        # one applied-op record per transform for invertibility
        assert len(out.applied_operations) == 3
        assert not out.pending_operations

    def test_lazy_chain_matches_eager_chain(self):
        ts = [T.Spacing(pixdim=(1.5, 1.5, 1.5)), T.Flip(spatial_axis=(1,)),
              T.Resize(spatial_size=(20, 20, 12))]
        eager = T.Compose(ts, lazy=False)(_img3d())
        lazy = T.Compose([type(t) for t in []] or ts, lazy=True)(_img3d())
        np.testing.assert_allclose(np.asarray(lazy.data), np.asarray(eager.data), atol=5e-3)
        np.testing.assert_allclose(np.asarray(lazy.affine), np.asarray(eager.affine), atol=1e-4)

    def test_dict_lazy_pipeline(self):
        data = {"image": _img3d(), "label": _img3d(1)}
        chain = T.Compose([
            T.Spacingd(keys=["image", "label"], pixdim=(1.5, 1.5, 1.5),
                       mode=["bilinear", "nearest"]),
            T.Flipd(keys=["image", "label"], spatial_axis=(0,)),
        ], lazy=True)
        out = chain(data)
        assert tuple(out["image"].shape) == tuple(out["label"].shape)
        np.testing.assert_allclose(np.asarray(out["image"].affine),
                                   np.asarray(out["label"].affine), atol=1e-5)
