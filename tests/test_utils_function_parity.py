"""Live parity for the utility-function long tail added for surface completeness:
transforms helpers, dual-backend unification ops, data/metrics/misc functions
(reference: monai/transforms/utils.py, utils_pytorch_numpy_unification.py,
monai/data/utils.py, monai/utils/misc.py)."""
import numpy as np
import pytest

from _ref import REF

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


def test_rescale_and_copypaste_parity():
    import monai.transforms.utils as rtu

    import monai_tpu.transforms.utils as otu

    rng = np.random.RandomState(0)
    arr = rng.rand(3, 8, 8).astype(np.float32) * 7 - 2
    np.testing.assert_allclose(np.asarray(otu.rescale_array(arr.copy(), 0, 1)),
                               np.asarray(rtu.rescale_array(arr.copy(), 0, 1)), atol=1e-6)
    np.testing.assert_allclose(otu.rescale_array_int_max(arr.copy()),
                               rtu.rescale_array_int_max(arr.copy()), atol=1)
    np.testing.assert_allclose(otu.rescale_instance_array(arr.copy()),
                               rtu.rescale_instance_array(arr.copy()), atol=1e-6)
    ss_o, ds_o = otu.copypaste_arrays((6, 6), (6, 6), (3, 2), (2, 1), (3, 4))
    ss_r, ds_r = rtu.copypaste_arrays((6, 6), (6, 6), (3, 2), (2, 1), (3, 4))
    assert ss_o == ss_r and ds_o == ds_r
    img = rng.rand(5, 5)
    np.testing.assert_allclose(otu.resize_center(img.copy(), 7, 7, inplace=False),
                               rtu.resize_center(img.copy(), 7, 7, inplace=False))


def test_equalize_hist_parity():
    import monai.transforms.utils as rtu

    import monai_tpu.transforms.utils as otu

    rng = np.random.RandomState(0)
    img = (rng.rand(16, 16) * 255).astype(np.float32)
    o = np.asarray(otu.equalize_hist(img.copy()))
    r = np.asarray(rtu.equalize_hist(img.copy()))
    np.testing.assert_allclose(o, r, atol=2.0)  # skimage-vs-numpy binning tolerance


def test_map_and_generate_sampling_centers_parity():
    import monai.transforms.utils as rtu

    import monai_tpu.transforms.utils as otu

    label = np.zeros((1, 16, 16), dtype=np.int64)
    label[0, 2:7, 3:8] = 1
    label[0, 10:14, 10:14] = 2
    o = otu.map_and_generate_sampling_centers(label, (4, 4), 6, num_classes=3,
                                              rand_state=np.random.RandomState(0), warn=False)
    r = rtu.map_and_generate_sampling_centers(label, (4, 4), 6, num_classes=3,
                                              rand_state=np.random.RandomState(0), warn=False)
    np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_unification_ops_parity():
    import torch
    import monai.transforms.utils_pytorch_numpy_unification as runi

    import monai_tpu.transforms.utils_backend_unification as ouni

    rng = np.random.RandomState(0)
    x = rng.rand(4, 5).astype(np.float32)
    t = torch.from_numpy(x)
    np.testing.assert_allclose(np.asarray(ouni.cumsum(x, 1)), runi.cumsum(t, 1).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ouni.softplus(x)), runi.softplus(t).numpy(), atol=1e-6)
    # the reference's numpy branch returns np.nonzero(x)[0]; its torch branch returns
    # flattened coordinates — we match the numpy behaviour
    np.testing.assert_array_equal(np.asarray(ouni.nonzero(x > 0.5)),
                                  runi.nonzero((x > 0.5)))
    np.testing.assert_allclose(np.asarray(ouni.percentile(x, 30)), np.asarray(runi.percentile(x, 30)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ouni.maximum(x, 1 - x)), runi.maximum(t, 1 - t).numpy())
    ints = rng.randint(0, 3, (6, 4))
    np.testing.assert_array_equal(np.asarray(ouni.mode(ints, -1)),
                                  runi.mode(torch.from_numpy(ints), -1).numpy())
    np.testing.assert_allclose(np.asarray(ouni.std(x, 1, unbiased=True)),
                               runi.std(t, 1, unbiased=True).numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ouni.unravel_index(7, (4, 5))),
                                  runi.unravel_index(torch.tensor(7), (4, 5)).numpy())


def test_croppad_functional_parity():
    import torch
    from monai.transforms.croppad.functional import crop_or_pad_nd as ref_cpnd
    from monai.transforms.croppad.functional import pad_nd as ref_pad_nd
    from monai.transforms.utils import create_translate

    from monai_tpu.transforms import crop_or_pad_nd, pad_nd

    rng = np.random.RandomState(0)
    img = rng.rand(2, 6, 7).astype(np.float32)
    to_pad = [(0, 0), (1, 2), (2, 1)]
    np.testing.assert_allclose(pad_nd(img.copy(), to_pad),
                               ref_pad_nd(torch.from_numpy(img), to_pad).numpy())
    m = create_translate(2, [2, -1])
    o = crop_or_pad_nd(img.copy(), m, (6, 7), mode="constant")
    r = ref_cpnd(torch.from_numpy(img), m, (6, 7), mode="constant").numpy()
    np.testing.assert_allclose(np.asarray(o), r)


def test_data_utils_parity():
    import monai.data as rdata

    import monai_tpu.data as odata

    assert odata.is_supported_format("a/b/x.nii.gz", ["nii.gz"]) == \
        rdata.is_supported_format("a/b/x.nii.gz", ["nii.gz"])
    o = odata.create_file_basename("seg", "/foo/bar/test1/image.png", "/tmp/out_x",
                                   data_root_dir="/foo/bar", separate_folder=True, makedirs=False)
    r = rdata.create_file_basename("seg", "/foo/bar/test1/image.png", "/tmp/out_x",
                                   data_root_dir="/foo/bar", separate_folder=True, makedirs=False)
    assert o == r
    dl = [{"image": i} for i in range(10)]
    assert len(odata.resample_datalist(dl, 2.5, seed=0)) == len(rdata.resample_datalist(dl, 2.5, seed=0))
    m_o, m_r = {"srow_x": 1, "affine": 2}, {"srow_x": 1, "affine": 2}
    odata.remove_extra_metadata(m_o)
    rdata.remove_extra_metadata(m_r)
    assert m_o == m_r


def test_misc_utils_parity():
    import monai.utils.misc as rmisc

    import monai_tpu.utils.misc as omisc

    assert omisc.list_to_dict(["a=1", "b='x'", "c=true", "d"]) == \
        rmisc.list_to_dict(["a=1", "b='x'", "c=true", "d"])
    assert omisc.is_sqrt([16, 25]) == rmisc.is_sqrt([16, 25])
    assert omisc.is_sqrt(15) == rmisc.is_sqrt(15)
    arr = np.zeros((2, 3))
    assert omisc.unsqueeze_right(arr, 4).shape == rmisc.unsqueeze_right(arr, 4).shape
    assert omisc.unsqueeze_left(arr, 4).shape == rmisc.unsqueeze_left(arr, 4).shape
    assert omisc.flatten_dict({"a": 1, "b": {"c": 2}}) == rmisc.flatten_dict({"a": 1, "b": {"c": 2}})
    x = np.arange(24).reshape(2, 3, 4)
    np.testing.assert_array_equal(omisc.sample_slices(x, 1, True, 0, 2),
                                  np.asarray(rmisc.sample_slices(x, 1, True, 0, 2)))


def test_deprecated_decorators():
    from monai_tpu.utils import DeprecatedError
    from monai_tpu.utils.deprecate_utils import deprecated, deprecated_arg

    @deprecated(since="0.0.1", version_val="0.1.0")
    def old_fn():
        return 42

    with pytest.warns(FutureWarning):
        assert old_fn() == 42

    @deprecated(removed="0.0.5", version_val="0.1.0")
    def gone_fn():
        return 0

    with pytest.raises(DeprecatedError):
        gone_fn()

    @deprecated_arg("old", new_name="new", since="0.0.1", version_val="0.1.0")
    def fn2(new=3):
        return new

    assert fn2(old=7) == 7  # renamed through


def test_net_metadata_roundtrip(tmp_path):
    from monai_tpu.data import load_net_with_metadata, save_net_with_metadata

    params = {"layer": {"w": np.random.RandomState(0).rand(3, 3)}}
    save_net_with_metadata(params, str(tmp_path / "net"), meta_values={"task": "t"},
                           more_extra_files={"notes.txt": b"hello"})
    p, meta, extra = load_net_with_metadata(str(tmp_path / "net"),
                                            more_extra_files=("notes.txt",))
    np.testing.assert_allclose(p["layer"]["w"], params["layer"]["w"])
    assert meta["task"] == "t" and extra["notes.txt"] == b"hello"


def test_write_metrics_reports_parity(tmp_path):
    import monai.handlers as rh

    import monai_tpu.handlers as oh

    md = {"dice": np.array([[0.7, 0.9], [0.6, 0.8]])}
    o_dir, r_dir = tmp_path / "ours", tmp_path / "ref"
    oh.write_metrics_reports(str(o_dir), ["a", "b"], {"dice": 0.75}, md, ["mean", "max"])
    rh.write_metrics_reports(str(r_dir), ["a", "b"], {"dice": 0.75}, md, ["mean", "max"])
    import os

    assert sorted(os.listdir(o_dir)) == sorted(os.listdir(r_dir))
    for f in os.listdir(o_dir):
        ours = open(o_dir / f).read()
        ref = open(r_dir / f).read()
        assert ours == ref, (f, ours, ref)


def test_cast_around_norms_and_module_surgery():
    import jax.numpy as jnp
    from flax import nnx

    from monai_tpu.networks import (add_casts_around_norms, look_up_named_module,
                                    replace_modules_temp, set_named_module)

    class Inner(nnx.Module):
        def __init__(self):
            self.norm = nnx.LayerNorm(4, rngs=nnx.Rngs(0))

        def __call__(self, x):
            return self.norm(x)

    class Net(nnx.Module):
        def __init__(self):
            self.inner = Inner()
            self.lin = nnx.Linear(4, 4, rngs=nnx.Rngs(1))

        def __call__(self, x):
            return self.lin(self.inner(x))

    net = Net()
    assert look_up_named_module("inner.norm", net) is net.inner.norm
    n_wrapped = add_casts_around_norms(net)
    assert n_wrapped == 1
    # the wrapped norm computes in f32 but returns the input dtype
    y_norm = net.inner(jnp.ones((2, 4), jnp.bfloat16))
    assert y_norm.dtype == jnp.bfloat16

    net2 = Net()
    with replace_modules_temp(net2, nnx.Linear, lambda old: (lambda x: x)):
        assert not isinstance(net2.lin, nnx.Linear)
    assert isinstance(net2.lin, nnx.Linear)  # restored
