"""Tests for adaptors, ApplyTransformToPoints, and dict grid ops
(modeled on reference tests/test_adaptors.py and test_apply_transform_to_points*)."""
import numpy as np

import monai_tpu.transforms as T
from monai_tpu.data import MetaImage


def test_adaptor_single_output():
    def add(a, b):
        return a + b

    out = T.adaptor(add, "c")({"a": 1, "b": 2, "extra": 0})
    assert out["c"] == 3 and out["extra"] == 0


def test_adaptor_input_map_and_multi_output():
    def stats(x):
        return x.min(), x.max()

    out = T.adaptor(stats, ["lo", "hi"], inputs={"img": "x"})({"img": np.arange(5)})
    assert out["lo"] == 0 and out["hi"] == 4


def test_apply_alias_and_to_kwargs():
    def f(data):
        data["y"] = data["x"] * 2
        return data

    out = T.apply_alias(f, {"a": "x"})({"a": 3})
    assert out["y"] == 6 and "a" in out and "x" not in out
    assert T.to_kwargs(lambda p, q: p + q)({"p": 1, "q": 2}) == 3


def test_apply_transform_to_points_roundtrip():
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    aff[:3, 3] = [10, 20, 30]
    pts = MetaImage(np.array([[[10.0, 20.0, 30.0], [12.0, 22.0, 32.0]]]), affine=np.eye(4))
    t = T.ApplyTransformToPoints(invert_affine=True)
    image_space = t(pts, affine=aff)
    np.testing.assert_allclose(np.asarray(image_space.data)[0, 0], [0, 0, 0])
    np.testing.assert_allclose(np.asarray(image_space.data)[0, 1], [1, 1, 1])
    back = t.inverse(image_space)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(pts.data))


def test_apply_transform_to_points_dict_refer_key():
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    aff[:3, 3] = [10, 20, 30]
    d = {
        "pts": MetaImage(np.array([[[10.0, 20.0, 30.0]]]), affine=np.eye(4)),
        "img": MetaImage(np.zeros((1, 4, 4, 4)), affine=aff),
    }
    t = T.ApplyTransformToPointsd(keys=["pts"], refer_keys="img")
    out = t(d)
    np.testing.assert_allclose(np.asarray(out["pts"].data)[0, 0], [0, 0, 0])
    inv = t.inverse(out)
    np.testing.assert_allclose(np.asarray(inv["pts"].data)[0, 0], [10, 20, 30])


def test_grid_split_and_patch_dict():
    d = {"image": np.arange(2 * 8 * 8, dtype=np.float32).reshape(2, 8, 8),
         "label": np.ones((1, 8, 8), np.float32)}
    cells = T.GridSplitd(keys=["image", "label"], grid=(2, 2))(d)
    assert len(cells) == 4
    assert cells[0]["image"].shape == (2, 4, 4) and cells[0]["label"].shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(cells[0]["image"]), d["image"][:, :4, :4])

    patched = T.GridPatchd(keys=["image"], patch_size=(4, 4))(dict(d))
    assert patched["image"].shape == (4, 2, 4, 4)

    rgp = T.RandGridPatchd(keys=["image", "label"], patch_size=(4, 4), max_offset=2)
    rgp.set_random_state(0)
    out = rgp(dict(d))
    # both keys share the same offset, so shapes match
    assert out["image"].shape[0] == out["label"].shape[0]
    assert out["image"].shape[2:] == (4, 4)
