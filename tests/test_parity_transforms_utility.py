"""Live parity vs the PyTorch reference for utility + signal + regularization
transforms (reference: monai/transforms/utility/array.py, signal/array.py,
regularization/array.py)."""
import numpy as np
import pytest

import monai_tpu.transforms as T

from _ref import REF, allclose, to_np

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


def _img(shape=(2, 8, 10), seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _run(name, kwargs, x, seed=None, call_kwargs=None, atol=1e-5):
    import torch
    ours_t = getattr(T, name)(**kwargs)
    ref_t = getattr(REF.transforms, name)(**kwargs)
    if seed is not None:
        ours_t.set_random_state(seed)
        ref_t.set_random_state(seed)
    ours = ours_t(x.copy(), **(call_kwargs or {}))
    ref = ref_t(torch.from_numpy(x.copy()), **(call_kwargs or {}))
    allclose(ours, ref, atol=atol, rtol=atol, msg=name)
    return ours, ref


CASES = [
    ("Identity", dict(), (2, 8, 10)),
    ("AsChannelLast", dict(channel_dim=0), (2, 8, 10)),
    ("RepeatChannel", dict(repeats=3), (1, 8, 10)),
    ("RemoveRepeatedChannel", dict(repeats=2), (4, 8, 10)),
    ("SplitDim", dict(dim=0, keepdim=True), (2, 8, 10)),
    ("SqueezeDim", dict(dim=0), (1, 8, 10)),
    ("Transpose", dict(indices=(1, 0, 2)), (2, 8, 10)),
    ("CastToType", dict(dtype=np.float64), (2, 8, 10)),
    ("AddCoordinateChannels", dict(spatial_dims=(0, 1)), (1, 8, 10)),
]


@pytest.mark.parametrize("name,kwargs,shape", CASES, ids=[c[0] for c in CASES])
def test_utility_parity(name, kwargs, shape):
    import torch
    x = _img(shape)
    ours = getattr(T, name)(**kwargs)(x.copy())
    ref = getattr(REF.transforms, name)(**kwargs)(torch.from_numpy(x.copy()))
    if isinstance(ours, (list, tuple)):
        for o, r in zip(ours, ref):
            allclose(o, r, msg=name)
    else:
        allclose(ours, ref, msg=name)


def test_label_to_mask_parity():
    x = np.random.RandomState(0).randint(0, 4, (1, 8, 10)).astype(np.float32)
    _run("LabelToMask", dict(select_labels=[1, 3]), x)
    onehot = np.eye(4, dtype=np.float32)[x[0].astype(int)].transpose(2, 0, 1)
    _run("LabelToMask", dict(select_labels=[1, 2], merge_channels=True), onehot)


def test_map_label_value_parity():
    x = np.random.RandomState(0).randint(0, 4, (1, 8, 10)).astype(np.float32)
    _run("MapLabelValue", dict(orig_labels=[0, 1, 2, 3], target_labels=[0, 10, 20, 30]), x)
    _run("MapLabelValue", dict(orig_labels=[3, 2, 1, 0], target_labels=[0, 1, 2, 3]), x)


def test_fgbg_to_indices_parity():
    import torch
    x = np.zeros((1, 8, 10), dtype=np.float32)
    x[0, 2:5, 3:7] = 1.0
    ours = T.FgBgToIndices()(x.copy())
    ref = REF.transforms.FgBgToIndices()(torch.from_numpy(x.copy()))
    for o, r in zip(ours, ref):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_classes_to_indices_parity():
    import torch
    x = np.random.RandomState(0).randint(0, 3, (1, 8, 10)).astype(np.float32)
    ours = T.ClassesToIndices(num_classes=3)(x.copy())
    ref = REF.transforms.ClassesToIndices(num_classes=3)(torch.from_numpy(x.copy()))
    for o, r in zip(ours, ref):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_brats_classes_parity():
    x = np.random.RandomState(0).choice([0, 1, 2, 4], (1, 8, 10)).astype(np.float32)
    _run("ConvertToMultiChannelBasedOnBratsClasses", dict(), x)


def test_add_extreme_points_channel_parity():
    import torch
    lbl = np.zeros((1, 10, 12), dtype=np.float32)
    lbl[0, 3:8, 4:10] = 1.0
    x = _img((1, 10, 12))
    ours_t = T.AddExtremePointsChannel()
    ref_t = REF.transforms.AddExtremePointsChannel()
    ours_t.set_random_state(3)
    ref_t.set_random_state(3)
    ours = ours_t(x.copy(), label=lbl, sigma=1.0, rescale_min=-1.0, rescale_max=1.0)
    ref = ref_t(torch.from_numpy(x.copy()), label=torch.from_numpy(lbl.copy()),
                sigma=1.0, rescale_min=-1.0, rescale_max=1.0)
    allclose(ours, ref, atol=1e-4, rtol=1e-4, msg="AddExtremePointsChannel")


def test_intensity_stats_parity():
    import torch
    x = _img((1, 8, 10))
    ours, meta_o = T.IntensityStats(ops=["mean", "std", "max"], key_prefix="orig")(x.copy())
    ref, meta_r = REF.transforms.IntensityStats(ops=["mean", "std", "max"], key_prefix="orig")(
        torch.from_numpy(x.copy()))
    for k in ("orig_mean", "orig_std", "orig_max"):
        assert abs(float(meta_o[k]) - float(meta_r[k])) < 1e-5, k


def test_lambda_parity():
    x = _img()
    _run("Lambda", dict(func=lambda a: a[:, :4]), x)


SIGNAL_CASES = [
    ("SignalRandShift", dict(boundaries=(-0.3, 0.3))),
    ("SignalRandScale", dict(boundaries=(-0.5, 0.5))),
    ("SignalRandAddSine", dict(boundaries=(0.1, 0.3), frequencies=(0.001, 0.02))),
    ("SignalRandAddSquarePulse", dict(boundaries=(0.01, 0.2), frequencies=(0.001, 0.02))),
]


@pytest.mark.parametrize("name,kwargs", SIGNAL_CASES, ids=[c[0] for c in SIGNAL_CASES])
def test_signal_parity(name, kwargs):
    sig = np.sin(np.linspace(0, 12, 100, dtype=np.float32))[None].repeat(2, 0)
    _run(name, kwargs, sig, seed=17, atol=1e-4)


def test_signal_rand_drop_behavior():
    # the reference draws the drop LOCATION from torch's global RNG (signal/array.py),
    # so exact parity is not seedable — assert the semantics instead
    sig = np.ones((2, 100), dtype=np.float32)
    t = T.SignalRandDrop(boundaries=(0.1, 0.3))
    t.set_random_state(17)
    out = to_np(t(sig.copy()))
    n_zeros = int((out[0] == 0).sum())
    assert 5 <= n_zeros <= 31  # round(magnitude*length) with magnitude in [0.1, 0.3]
    assert out.shape == sig.shape


def test_signal_rand_add_gaussian_noise_behavior():
    sig = np.zeros((1, 5000), dtype=np.float32)
    t = T.SignalRandAddGaussianNoise(boundaries=(0.01, 0.02))
    t.set_random_state(17)
    out = to_np(t(sig.copy()))
    assert 0.005 < out.std() < 0.03  # noise std tracks the sampled magnitude


def test_signal_fill_empty_parity():
    sig = np.sin(np.linspace(0, 12, 50, dtype=np.float32))[None]
    sig[0, 10:14] = np.nan
    _run("SignalFillEmpty", dict(replacement=0.5), sig)


def test_signal_remove_frequency_behavior():
    # the reference needs torchaudio.filtfilt (absent) — assert the notch works:
    # a 60 Hz component (at 500 Hz sampling) is strongly attenuated, 5 Hz is kept
    n, fs = 2000, 500.0
    t = np.arange(n) / fs
    base = np.sin(2 * np.pi * 5 * t).astype(np.float32)
    noise = 0.5 * np.sin(2 * np.pi * 60 * t).astype(np.float32)
    out = to_np(T.SignalRemoveFrequency(frequency=60, quality_factor=30,
                                        sampling_freq=fs)((base + noise)[None]))
    spec = np.abs(np.fft.rfft(out[0, 200:-200]))
    freqs = np.fft.rfftfreq(out[0, 200:-200].size, d=1 / fs)
    p60 = spec[np.argmin(np.abs(freqs - 60))]
    p5 = spec[np.argmin(np.abs(freqs - 5))]
    assert p60 < 0.05 * p5


def test_mixup_parity():
    import torch
    x = _img((4, 2, 8, 8))  # batch-first for regularization transforms
    ours_t = T.MixUp(batch_size=4, alpha=0.5)
    ref_t = REF.transforms.MixUp(batch_size=4, alpha=0.5)
    ours_t.set_random_state(5)
    ref_t.set_random_state(5)
    ours = ours_t(x.copy())
    ref = ref_t(torch.from_numpy(x.copy()))
    allclose(ours, ref, atol=1e-5, rtol=1e-5, msg="MixUp")


def test_cutmix_parity():
    import torch
    x = _img((4, 2, 8, 8))
    ours_t = T.CutMix(batch_size=4, alpha=0.5)
    ref_t = REF.transforms.CutMix(batch_size=4, alpha=0.5)
    ours_t.set_random_state(5)
    ref_t.set_random_state(5)
    ours = ours_t(x.copy())
    ref = ref_t(torch.from_numpy(x.copy()))
    allclose(ours, ref, atol=1e-5, rtol=1e-5, msg="CutMix")


def test_cutout_parity():
    import torch
    x = _img((4, 2, 8, 8))
    ours_t = T.CutOut(batch_size=4)
    ref_t = REF.transforms.CutOut(batch_size=4)
    ours_t.set_random_state(5)
    ref_t.set_random_state(5)
    ours = ours_t(x.copy())
    ref = ref_t(torch.from_numpy(x.copy()))
    allclose(ours, ref, atol=1e-5, rtol=1e-5, msg="CutOut")


def test_rand_smooth_field_adjust_contrast_parity():
    x = _img((1, 16, 16))
    _run("RandSmoothFieldAdjustContrast", dict(spatial_size=(16, 16), rand_size=(4, 4),
                                               prob=1.0, gamma=(0.5, 2.0)),
         x, seed=21, atol=2e-3)


def test_rand_smooth_field_adjust_intensity_parity():
    x = _img((1, 16, 16))
    _run("RandSmoothFieldAdjustIntensity", dict(spatial_size=(16, 16), rand_size=(4, 4),
                                                prob=1.0, gamma=(0.1, 1.0)),
         x, seed=21, atol=2e-3)
