"""TEST_NDARRAYS-style parametrization: every array transform here runs over
numpy, jax, and MetaImage inputs and must produce consistent results
(reference harness: tests/test_utils.py:857 TEST_NDARRAYS applied across
tests/transforms/*)."""
import jax.numpy as jnp
import numpy as np
import pytest

import monai_tpu.transforms as T
from monai_tpu.data import MetaImage

TEST_NDARRAYS = (
    ("numpy", lambda a: np.asarray(a)),
    ("jax", lambda a: jnp.asarray(a)),
    ("meta", lambda a: MetaImage(np.asarray(a), affine=np.eye(4))),
)


def _base(seed=0, shape=(1, 16, 16, 8)):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _payload(x):
    return np.asarray(x.data if isinstance(x, MetaImage) else x)


# deterministic intensity/utility/post transforms with canonical args
DETERMINISTIC = [
    ("ScaleIntensity", lambda: T.ScaleIntensity(minv=0.0, maxv=10.0)),
    ("ScaleIntensityRange", lambda: T.ScaleIntensityRange(a_min=0.0, a_max=1.0, b_min=-1.0,
                                                          b_max=1.0, clip=True)),
    ("NormalizeIntensity", lambda: T.NormalizeIntensity()),
    ("ShiftIntensity", lambda: T.ShiftIntensity(offset=2.5)),
    ("ThresholdIntensity", lambda: T.ThresholdIntensity(threshold=0.5, above=True, cval=0.0)),
    ("AdjustContrast", lambda: T.AdjustContrast(gamma=2.0)),
    ("GaussianSmooth", lambda: T.GaussianSmooth(sigma=1.0)),
    ("GaussianSharpen", lambda: T.GaussianSharpen()),
    ("MedianSmooth", lambda: T.MedianSmooth(radius=1)),
    ("SavitzkyGolaySmooth", lambda: T.SavitzkyGolaySmooth(window_length=5, order=1)),
    ("ScaleIntensityRangePercentiles", lambda: T.ScaleIntensityRangePercentiles(
        lower=5, upper=95, b_min=0.0, b_max=1.0)),
    ("ClipIntensityPercentiles", lambda: T.ClipIntensityPercentiles(lower=5, upper=95)),
    ("HistogramNormalize", lambda: T.HistogramNormalize(num_bins=32)),
    ("Activations-sigmoid", lambda: T.Activations(sigmoid=True)),
    ("AsDiscrete-argmax", lambda: T.AsDiscrete(argmax=True)),
    ("CastToType", lambda: T.CastToType(dtype=np.float64)),
    ("LabelToMask", lambda: T.LabelToMask(select_labels=[1], merge_channels=False)),
]

RANDOM = [
    ("RandGaussianNoise", lambda: T.RandGaussianNoise(prob=1.0, std=0.05)),
    ("RandShiftIntensity", lambda: T.RandShiftIntensity(offsets=2.0, prob=1.0)),
    ("RandScaleIntensity", lambda: T.RandScaleIntensity(factors=0.5, prob=1.0)),
    ("RandAdjustContrast", lambda: T.RandAdjustContrast(prob=1.0, gamma=(0.5, 2.0))),
    ("RandBiasField", lambda: T.RandBiasField(prob=1.0)),
    ("RandGaussianSmooth", lambda: T.RandGaussianSmooth(prob=1.0)),
    ("RandRicianNoise", lambda: T.RandRicianNoise(prob=1.0, std=0.05)),
    ("RandCoarseDropout", lambda: T.RandCoarseDropout(holes=2, spatial_size=4, prob=1.0)),
    ("RandCoarseShuffle", lambda: T.RandCoarseShuffle(holes=2, spatial_size=4, prob=1.0)),
    ("RandHistogramShift", lambda: T.RandHistogramShift(prob=1.0, num_control_points=5)),
    ("RandGibbsNoise", lambda: T.RandGibbsNoise(prob=1.0, alpha=(0.2, 0.4))),
    ("RandKSpaceSpikeNoise", lambda: T.RandKSpaceSpikeNoise(prob=1.0)),
]


@pytest.mark.parametrize("arr_name,to_arr", TEST_NDARRAYS, ids=[t[0] for t in TEST_NDARRAYS])
@pytest.mark.parametrize("t_name,build", DETERMINISTIC, ids=[c[0] for c in DETERMINISTIC])
def test_deterministic_consistent_across_backends(t_name, build, arr_name, to_arr):
    base = _base()
    if t_name.startswith("AsDiscrete") or t_name.startswith("LabelToMask"):
        base = np.stack([base[0], 1 - base[0]])  # 2-channel prob map / label field
        if t_name.startswith("LabelToMask"):
            base = (base > 0.5).astype(np.float32)
    out = build()(to_arr(base))
    ref = build()(np.asarray(base))  # numpy is the reference backend
    np.testing.assert_allclose(_payload(out), _payload(ref), atol=1e-4, rtol=1e-4,
                               err_msg=f"{t_name} on {arr_name}")


@pytest.mark.parametrize("arr_name,to_arr", TEST_NDARRAYS, ids=[t[0] for t in TEST_NDARRAYS])
@pytest.mark.parametrize("t_name,build", RANDOM, ids=[c[0] for c in RANDOM])
def test_random_consistent_across_backends(t_name, build, arr_name, to_arr):
    base = _base()
    t1, t2 = build(), build()
    t1.set_random_state(1234)
    t2.set_random_state(1234)
    out = t1(to_arr(base))
    ref = t2(np.asarray(base))
    assert _payload(out).shape == _payload(ref).shape
    np.testing.assert_allclose(_payload(out), _payload(ref), atol=1e-3, rtol=1e-3,
                               err_msg=f"{t_name} on {arr_name}")


@pytest.mark.parametrize("arr_name,to_arr", TEST_NDARRAYS, ids=[t[0] for t in TEST_NDARRAYS])
def test_meta_tracking_preserved(arr_name, to_arr):
    x = to_arr(_base())
    out = T.ScaleIntensity(minv=0.0, maxv=1.0)(x)
    if isinstance(x, MetaImage):
        assert isinstance(out, MetaImage)
        np.testing.assert_allclose(np.asarray(out.affine), np.eye(4))
