"""HoVerNet instance post-processing + pathology utils (modeled on the reference's
tests/apps/pathology/transforms/post/* suite; succinct-contour and centroid cases
are the reference's golden values)."""
import numpy as np
import pytest


def test_generate_succinct_contour_golden():
    from monai_tpu.apps.pathology import GenerateSuccinctContour

    data = [
        np.array([[1.5, 0.0], [1.0, 0.5], [0.5, 1.0], [0.0, 1.5]]),
        np.array([[0.0, 2.5], [0.5, 3.0], [1.0, 3.5], [1.5, 4.0]]),
        np.array([[4.0, 1.5], [3.5, 1.0], [3.0, 0.5], [2.5, 0.0]]),
        np.array([[2.5, 4.0], [3.0, 3.5], [3.5, 3.0], [4.0, 2.5]]),
    ]
    result = GenerateSuccinctContour(5, 5)(data)
    np.testing.assert_allclose(result, [[2, 0], [0, 2], [2, 4], [4, 2]])


def test_find_contours_matches_skimage_convention():
    from monai_tpu.apps.pathology import find_contours

    y, x = np.ogrid[0:5, 0:5]
    disk = ((x - 2) ** 2 + (y - 2) ** 2 <= 4).astype(float)
    contours = find_contours(disk, level=0.5)
    assert len(contours) == 4
    np.testing.assert_allclose(contours[0], [[1.5, 0.0], [1.0, 0.5], [0.5, 1.0], [0.0, 1.5]])


def test_generate_instance_centroid_golden():
    from monai_tpu.apps.pathology import GenerateInstanceCentroid
    from monai_tpu.transforms import BoundingRect

    y, x = np.ogrid[0:30, 0:30]
    data = (x - 8) ** 2 + (y - 8) ** 2 <= 4
    bb = BoundingRect()(data[None])
    crop = data[bb[0][0]:bb[0][1], bb[0][2]:bb[0][3]]
    np.testing.assert_allclose(GenerateInstanceCentroid()(crop[None], offset=[6, 6]), [8, 8])


def test_hovernet_instance_and_type_postprocessing():
    from monai_tpu.apps.pathology import (
        HoVerNetInstanceMapPostProcessing,
        HoVerNetNuclearTypePostProcessing,
    )
    from monai_tpu.transforms import ComputeHoVerMaps

    y, x = np.ogrid[0:48, 0:48]
    lab = np.zeros((48, 48), int)
    lab[(x - 12) ** 2 + (y - 12) ** 2 <= 49] = 1
    lab[(x - 34) ** 2 + (y - 32) ** 2 <= 36] = 2
    hover = np.asarray(ComputeHoVerMaps()(lab[None]))
    logits = np.where(lab > 0, 6.0, -6.0)[None]

    info, inst_map = HoVerNetInstanceMapPostProcessing(activation="sigmoid")(logits, hover)
    assert sorted(info) == [1, 2]
    np.testing.assert_allclose(info[1]["centroid"], [12, 12])
    assert info[2]["contour"].ndim == 2

    types = np.zeros((3, 48, 48))
    types[0] = 5.0
    types[1][lab == 1] = 10.0
    types[2][lab == 2] = 10.0
    info, type_map = HoVerNetNuclearTypePostProcessing()(types, info, inst_map)
    assert info[1]["type"] == 1 and info[2]["type"] == 2
    assert set(np.unique(type_map).tolist()) == {0, 1, 2}


def test_watershed_splits_touching_instances():
    from monai_tpu.apps.pathology import Watershed

    img = np.ones((1, 12, 12))
    markers = np.zeros((1, 12, 12), np.int64)
    markers[0, 3, 3] = 1
    markers[0, 8, 8] = 2
    out = Watershed()(img, mask=np.ones((1, 12, 12), bool), markers=markers)
    assert sorted(np.unique(out).tolist()) == [1, 2]


def test_pathology_utils():
    from monai_tpu.apps.pathology import (
        PathologyProbNMS,
        compute_isolated_tumor_cells,
        compute_multi_instance_mask,
    )

    m = np.zeros((40, 40), np.uint8)
    m[5:10, 5:10] = 1
    m[5:9, 20:40] = 1
    multi = compute_multi_instance_mask(m, threshold=2)
    assert sorted(np.unique(multi).tolist()) == [0, 1, 2]
    assert compute_isolated_tumor_cells(multi, threshold=12) == [1]

    pm = np.zeros((10, 10))
    pm[3, 3] = 0.9
    out = PathologyProbNMS(spatial_dims=2, prob_threshold=0.4, box_size=4)(pm, resolution_level=1)
    assert out[0][1:] == [7, 7]


def test_sliding_window_dict_output_matches_per_head():
    import jax.numpy as jnp
    from flax import nnx

    from monai_tpu.inferers import sliding_window_inference

    class TwoHead(nnx.Module):
        def __init__(self, *, rngs):
            self.c1 = nnx.Conv(1, 2, (3, 3), padding="SAME", rngs=rngs)
            self.c2 = nnx.Conv(1, 3, (3, 3), padding="SAME", rngs=rngs)

        def __call__(self, x):
            xin = jnp.transpose(x, (0, 2, 3, 1))
            return {"a": jnp.transpose(self.c1(xin), (0, 3, 1, 2)),
                    "b": jnp.transpose(self.c2(xin), (0, 3, 1, 2))}

    net = TwoHead(rngs=nnx.Rngs(1))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 32, 32).astype(np.float32))
    both = sliding_window_inference(x, (16, 16), 4, net, overlap=0.25, mode="gaussian")
    only_a = sliding_window_inference(x, (16, 16), 4, lambda w: net(w)["a"],
                                      overlap=0.25, mode="gaussian")
    np.testing.assert_allclose(np.asarray(both["a"]), np.asarray(only_a), atol=1e-6)


def test_sliding_window_hovernet_inferer_valid_conv():
    import jax.numpy as jnp
    from flax import nnx

    from monai_tpu.apps.pathology import SlidingWindowHoVerNetInferer

    class ToyHoVer(nnx.Module):
        def __init__(self, *, rngs):
            self.conv = nnx.Conv(1, 4, (3, 3), padding="VALID", rngs=rngs)

        def __call__(self, x):
            xin = jnp.transpose(x, (0, 2, 3, 1))
            y = jnp.transpose(self.conv(xin), (0, 3, 1, 2))
            return {"np": y[:, :2], "hv": y[:, 2:]}

    net = ToyHoVer(rngs=nnx.Rngs(0))
    inferer = SlidingWindowHoVerNetInferer(roi_size=(16, 16), sw_batch_size=4,
                                           overlap=0.25, extra_input_padding=(2, 2, 2, 2))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 32, 32).astype(np.float32))
    res = inferer(x, net)
    assert res["np"].shape == (1, 2, 32, 32) and res["hv"].shape == (1, 2, 32, 32)
    assert np.isfinite(np.asarray(res["np"])).all()
