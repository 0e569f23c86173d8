"""1-D signal transforms (reference: monai/transforms/signal/array.py:54-422)."""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..utils.backend import to_numpy
from ..utils.type_conversion import convert_to_dst_type
from .transform import RandomizableTransform, Transform

__all__ = ["SignalRandDrop", "SignalRandScale", "SignalRandShift", "SignalRandAddSine",
           "SignalRandAddSquarePulse", "SignalRandAddGaussianNoise", "SignalRandAddSinePartial",
           "SignalRandAddSquarePulsePartial", "SignalFillEmpty", "SignalRemoveFrequency",
           "SignalContinuousWavelet"]


def _paste_slices(tup):
    pos, w, max_w = tup
    wall_min = max(pos, 0)
    wall_max = min(pos + w, max_w)
    block_min = -min(pos, 0)
    block_max = max_w - max(pos + w, max_w)
    block_max = block_max if block_max != 0 else None
    return slice(wall_min, wall_max), slice(block_min, block_max)


def _paste(wall, block, loc):
    loc_zip = zip(loc, block.shape, wall.shape)
    wall_slices, block_slices = zip(*map(_paste_slices, loc_zip))
    wall[wall_slices] = block[block_slices]
    return wall


class SignalRandShift(RandomizableTransform):
    """Randomly shift a signal (reference: signal/array.py:54)."""

    def __init__(self, mode: str | None = "wrap", filling: float | None = 0.0,
                 boundaries: Sequence[float] = (-1.0, 1.0)):
        super().__init__()
        self.filling = filling
        self.mode = mode
        self.boundaries = boundaries

    def __call__(self, signal: Any) -> Any:
        self.randomize(None)
        sig = to_numpy(signal)
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        length = sig.shape[1]
        shift_idx = round(self.magnitude * length)
        from scipy.ndimage import shift

        out = shift(input=sig, mode=self.mode, shift=[0, shift_idx], cval=self.filling)
        res, *_ = convert_to_dst_type(out, signal)
        return res


class SignalRandScale(RandomizableTransform):
    """Random amplitude scale (reference: signal/array.py:—)."""

    def __init__(self, boundaries: Sequence[float] = (-1.0, 1.0)):
        super().__init__()
        self.boundaries = boundaries

    def __call__(self, signal: Any) -> Any:
        self.randomize(None)
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        return signal * self.magnitude


class SignalRandDrop(RandomizableTransform):
    """Randomly zero a contiguous chunk (reference: signal/array.py:—)."""

    def __init__(self, boundaries: Sequence[float] = (0.0, 1.0)):
        super().__init__()
        self.boundaries = boundaries

    def __call__(self, signal: Any) -> Any:
        self.randomize(None)
        sig = to_numpy(signal).copy()
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        length = sig.shape[-1]
        mask = np.zeros(round(self.magnitude * length))
        trange = np.arange(length)
        loc = trange[self.R.choice(len(trange))]
        # the reference's paste() writes the mask across ALL channels (utils.py:2196)
        sig2d = sig if sig.ndim > 1 else sig[None]
        wall_sl, block_sl = _paste_slices((loc, mask.shape[0], length))
        sig2d[:, wall_sl] = mask[block_sl]
        sig = sig2d if sig.ndim > 1 else sig2d[0]
        res, *_ = convert_to_dst_type(sig, signal)
        return res


class SignalRandAddSine(RandomizableTransform):
    """Add a random sine (reference: signal/array.py:—)."""

    def __init__(self, boundaries: Sequence[float] = (0.1, 0.3), frequencies: Sequence[float] = (0.001, 0.02)):
        super().__init__()
        self.boundaries = boundaries
        self.frequencies = frequencies

    def __call__(self, signal: Any) -> Any:
        self.randomize(None)
        sig = to_numpy(signal)
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        self.freqs = self.R.uniform(low=self.frequencies[0], high=self.frequencies[1])
        length = sig.shape[1]
        time = np.arange(0, length, 1)
        sine = self.magnitude * np.sin(self.freqs * time)
        res, *_ = convert_to_dst_type(sig + sine, signal)
        return res


class SignalRandAddSquarePulse(RandomizableTransform):
    """Add a random square pulse (reference: signal/array.py:—)."""

    def __init__(self, boundaries: Sequence[float] = (0.01, 0.2), frequencies: Sequence[float] = (0.001, 0.02)):
        super().__init__()
        self.boundaries = boundaries
        self.frequencies = frequencies

    def __call__(self, signal: Any) -> Any:
        from scipy.signal import square

        self.randomize(None)
        sig = to_numpy(signal)
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        self.freqs = self.R.uniform(low=self.frequencies[0], high=self.frequencies[1])
        length = sig.shape[1]
        time = np.arange(0, length, 1)
        squared = self.magnitude * square(self.freqs * time)
        res, *_ = convert_to_dst_type(sig + squared, signal)
        return res


class SignalRandAddSinePartial(RandomizableTransform):
    """Add a sine to a random fraction of the signal (reference: signal/array.py:—)."""

    def __init__(self, boundaries: Sequence[float] = (0.1, 0.3), frequencies: Sequence[float] = (0.001, 0.02),
                 fraction: Sequence[float] = (0.01, 0.2)):
        super().__init__()
        self.boundaries = boundaries
        self.frequencies = frequencies
        self.fraction = fraction

    def __call__(self, signal: Any) -> Any:
        self.randomize(None)
        sig = to_numpy(signal).copy()
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        self.freqs = self.R.uniform(low=self.frequencies[0], high=self.frequencies[1])
        self.fracs = self.R.uniform(low=self.fraction[0], high=self.fraction[1])
        length = sig.shape[-1]
        time_partial = np.arange(0, round(self.fracs * length), 1)
        sine_partial = self.magnitude * np.sin(self.freqs * time_partial)
        loc = np.arange(length)[self.R.choice(length)]
        out = _paste(sig[-1] if sig.ndim > 1 else sig, sine_partial, (loc,))
        if sig.ndim > 1:
            sig[-1] = out
        else:
            sig = out
        res, *_ = convert_to_dst_type(sig, signal)
        return res


class SignalRandAddGaussianNoise(RandomizableTransform):
    """Add gaussian noise (reference: signal/array.py:—)."""

    def __init__(self, boundaries: Sequence[float] = (0.001, 0.02)):
        super().__init__()
        self.boundaries = boundaries

    def __call__(self, signal: Any) -> Any:
        self.randomize(None)
        sig = to_numpy(signal)
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        length = sig.shape[1]
        gaussiannoise = self.magnitude * self.R.standard_normal(length)
        res, *_ = convert_to_dst_type(sig + gaussiannoise, signal)
        return res


class SignalRandAddSquarePulsePartial(RandomizableTransform):
    """Add a square pulse to a fraction of the signal (reference: signal/array.py:—)."""

    def __init__(self, boundaries: Sequence[float] = (0.01, 0.2), frequencies: Sequence[float] = (0.001, 0.02),
                 fraction: Sequence[float] = (0.01, 0.2)):
        super().__init__()
        self.boundaries = boundaries
        self.frequencies = frequencies
        self.fraction = fraction

    def __call__(self, signal: Any) -> Any:
        from scipy.signal import square

        self.randomize(None)
        sig = to_numpy(signal).copy()
        self.magnitude = self.R.uniform(low=self.boundaries[0], high=self.boundaries[1])
        self.freqs = self.R.uniform(low=self.frequencies[0], high=self.frequencies[1])
        self.fracs = self.R.uniform(low=self.fraction[0], high=self.fraction[1])
        length = sig.shape[-1]
        time_partial = np.arange(0, round(self.fracs * length), 1)
        squared_partial = self.magnitude * square(self.freqs * time_partial)
        loc = np.arange(length)[self.R.choice(length)]
        out = _paste(sig[-1] if sig.ndim > 1 else sig, squared_partial, (loc,))
        if sig.ndim > 1:
            sig[-1] = out
        else:
            sig = out
        res, *_ = convert_to_dst_type(sig, signal)
        return res


class SignalFillEmpty(Transform):
    """Replace NaNs (reference: signal/array.py:—)."""

    def __init__(self, replacement: float = 0.0):
        self.replacement = replacement

    def __call__(self, signal: Any) -> Any:
        out = np.nan_to_num(to_numpy(signal), nan=self.replacement)
        res, *_ = convert_to_dst_type(out, signal)
        return res


class SignalRemoveFrequency(Transform):
    """Notch-filter a frequency (reference: signal/array.py:—)."""

    def __init__(self, frequency: float | None = None, quality_factor: float | None = None,
                 sampling_freq: float | None = None):
        self.frequency = frequency
        self.quality_factor = quality_factor
        self.sampling_freq = sampling_freq

    def __call__(self, signal: Any) -> Any:
        from scipy.signal import iirnotch, lfilter

        b_notch, a_notch = iirnotch(self.frequency, self.quality_factor, self.sampling_freq)
        x = to_numpy(signal).astype(np.float32)
        # torchaudio-style filtfilt (what the reference uses): forward-backward
        # lfilter with ZERO initial conditions and no edge padding — scipy's
        # filtfilt pads with odd extension and differs at the boundaries
        fwd = lfilter(b_notch, a_notch, x, axis=-1)
        out = lfilter(b_notch, a_notch, fwd[..., ::-1], axis=-1)[..., ::-1]
        res, *_ = convert_to_dst_type(out.copy(), signal)
        return res


class SignalContinuousWavelet(Transform):
    """CWT scaleogram (reference: signal/array.py:—).

    Implemented with a direct Morlet convolution bank (scipy.signal.cwt was removed in
    scipy 1.12+)."""

    def __init__(self, type: str = "mexh", length: float = 125.0, frequency: float = 500.0):
        self.length = length
        self.frequency = frequency
        self.type = type

    def _wavelet(self, points: int, a: float) -> np.ndarray:
        x = np.arange(0, points) - (points - 1.0) / 2
        x = x / a
        if self.type in ("mexh", "ricker"):
            w = (1 - x**2) * np.exp(-x**2 / 2)
            return w * (2 / (np.sqrt(3 * a) * np.pi**0.25))
        # default: real morlet
        return np.cos(5 * x) * np.exp(-x**2 / 2)

    def __call__(self, signal: Any) -> Any:
        sig = to_numpy(signal)
        if sig.ndim == 1:
            sig = sig[None]
        frequencies = np.arange(1, self.length + 1)
        coef = np.zeros((sig.shape[0], len(frequencies), sig.shape[-1]))
        for c in range(sig.shape[0]):
            for i, a in enumerate(frequencies):
                n_points = min(10 * int(a), sig.shape[-1])
                wav = self._wavelet(n_points, a)
                coef[c, i] = np.convolve(sig[c], wav, mode="same")
        res, *_ = convert_to_dst_type(coef, signal)
        return res
