"""Regression tests for components added late in round 1 (modeled on the reference's
per-component unit tests)."""
import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx


def test_affine_transform_identity_and_shift():
    from monai_tpu.networks.layers import AffineTransform

    img = jnp.asarray(np.random.RandomState(0).rand(1, 1, 8, 10).astype(np.float32))
    ident = np.eye(3, dtype=np.float32)[None][:, :2]
    out = AffineTransform(align_corners=True)(img, jnp.asarray(ident))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_nacl_loss_golden():
    from monai_tpu.losses import NACLLoss

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 3, 16, 16).astype(np.float32))
    t = jnp.asarray(rs.randint(0, 3, (2, 16, 16)))
    # golden value computed against the reference implementation
    assert abs(float(NACLLoss(classes=3, dim=2)(x, t)) - 1.1692228) < 1e-4


def test_coco_metric_shapes():
    from monai_tpu.apps.detection.metrics import COCOMetric, matching_batch
    from monai_tpu.data.box_utils import box_iou

    def np_iou(a, b):
        return np.asarray(box_iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))

    rs = np.random.RandomState(0)

    def rand_boxes(n):
        lo = rs.rand(n, 3) * 15
        return np.concatenate([lo, lo + rs.rand(n, 3) * 5 + 0.5], axis=1).astype(np.float32)

    metric = COCOMetric(classes=["c0"], iou_list=[0.1], max_detection=[10], verbose=False)
    res = matching_batch(np_iou, metric.iou_thresholds, [rand_boxes(4)],
                         [np.zeros(4, np.int64)], [rs.rand(4)], [rand_boxes(2)],
                         [np.zeros(2, np.int64)])
    scores, _ = metric(res)
    assert "mAP_IoU_0.10_0.50_0.05_MaxDet_10" in scores


def test_nrrd_reader_roundtrip(tmp_path):
    import zlib

    from monai_tpu.data import NrrdReader

    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    header = (b"NRRD0004\ntype: short\ndimension: 3\nsizes: 2 3 4\n"
              b"endian: little\nencoding: gzip\n\n")
    path = tmp_path / "t.nrrd"
    path.write_bytes(header + zlib.compress(arr.T.tobytes()))
    data, meta = NrrdReader().get_data(NrrdReader().read(str(path)))
    np.testing.assert_array_equal(data, arr)


def test_morphology_roundtrip():
    from monai_tpu.transforms import dilate, erode

    m = np.zeros((1, 1, 8, 8))
    m[0, 0, 2:6, 2:6] = 1
    assert float(np.sum(np.asarray(erode(m)))) == 4.0
    assert float(np.sum(np.asarray(dilate(m)))) == 36.0


def test_fixed_mean_scaling_preserves_mean():
    from monai_tpu.transforms import ScaleIntensityFixedMean

    x = np.asarray([[1.0, 2.0, 3.0]])
    out = np.asarray(ScaleIntensityFixedMean(factor=0.7)(x))
    assert abs(out.mean() - x.mean()) < 1e-6


def test_meta_utility_roundtrip():
    from monai_tpu.data import MetaImage
    from monai_tpu.transforms import FromMetaImaged, ToMetaImaged

    d = {"image": MetaImage(np.ones((1, 4, 4)), meta={"x": 1})}
    d2 = FromMetaImaged(keys="image")(dict(d))
    assert "image_meta_dict" in d2
    d3 = ToMetaImaged(keys="image")(d2)
    assert isinstance(d3["image"], MetaImage) and d3["image"].meta["x"] == 1


def test_diffusion_prepare_batch():
    from monai_tpu.engines import DiffusionPrepareBatch

    pb = DiffusionPrepareBatch(num_train_timesteps=10)
    img, target, args, kw = pb({"image": np.ones((2, 1, 4, 4), np.float32)})
    assert img.shape == target.shape and set(kw) == {"noise", "timesteps"}
    assert int(jnp.max(kw["timesteps"])) < 10


def test_vista3d_transforms():
    from monai_tpu.apps.vista3d import Relabeld, VistaPreTransformd

    d = {"label_prompt": [1, 25], "point_labels": [[0, 1]]}
    out = VistaPreTransformd(keys="image", labels_dict=None)(dict(d))
    assert out["label_prompt"] == [1, 25]
    r = Relabeld(keys="label", label_mappings={"ds": [(1, 7)]})
    res = r({"label": np.asarray([[0, 1]]), "dataset_name": "ds"})
    assert res["label"].tolist() == [[0, 7]]


def test_ms_ssim_identical_is_one():
    from monai_tpu.metrics import MultiScaleSSIMMetric

    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 64, 64).astype(np.float32))
    m = MultiScaleSSIMMetric(spatial_dims=2, weights=(0.5, 0.5))(x, x)
    assert abs(float(np.asarray(m).ravel()[0]) - 1.0) < 1e-6


def test_sharded_sliding_window_matches_unsharded():
    import jax

    from monai_tpu.inferers import sliding_window_inference
    from monai_tpu.networks.nets import UNet
    from monai_tpu.parallel import create_mesh, sharded_sliding_window_inference

    mesh = create_mesh((len(jax.devices()),), ("data",))
    net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8),
               strides=(2,), num_res_units=1, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(net)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    def predictor(w):
        return fwd(state, w)

    vol = jnp.asarray(np.random.RandomState(0).rand(1, 1, 32, 32, 32).astype(np.float32))
    out = sharded_sliding_window_inference(vol, (16, 16, 16), 8, predictor, mesh,
                                           overlap=0.25)
    ref = sliding_window_inference(vol, (16, 16, 16), 8, predictor, overlap=0.25,
                                   mode="gaussian")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
