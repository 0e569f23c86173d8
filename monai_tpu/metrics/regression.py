"""Regression metrics: MSE/MAE/RMSE/PSNR/SSIM + ROC-AUC/AP + FID/MMD + CumulativeAverage.

Parity targets: monai/metrics/regression.py, rocauc.py, average_precision.py,
fid.py, mmd.py, cumulative_average.py.
"""
from __future__ import annotations

from abc import abstractmethod
from collections.abc import Sequence
from functools import partial
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.enums import Average, MetricReduction, StrEnum
from ..utils.module import look_up_option
from .metric import Cumulative, CumulativeIterationMetric, Metric
from .utils import do_metric_reduction

__all__ = ["RegressionMetric", "MSEMetric", "MAEMetric", "RMSEMetric", "PSNRMetric", "SSIMMetric",
           "ROCAUCMetric", "compute_roc_auc", "AveragePrecisionMetric", "compute_average_precision",
           "CumulativeAverage", "FIDMetric", "compute_frechet_distance", "MMDMetric"]


class RegressionMetric(CumulativeIterationMetric):
    """Base regression metric (reference: regression.py:—)."""

    def __init__(self, reduction: str = MetricReduction.MEAN, get_not_nans: bool = False):
        super().__init__()
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def aggregate(self, reduction=None):
        data = self.get_buffer()
        f, not_nans = do_metric_reduction(data, reduction or self.reduction)
        return (f, not_nans) if self.get_not_nans else f

    def _check_shape(self, y_pred, y) -> None:
        if y_pred.shape != y.shape:
            raise ValueError(f"y_pred and y shapes dont match, received y_pred: [{y_pred.shape}] and y: [{y.shape}]")
        if len(y_pred.shape) < 2:
            raise ValueError("either channel or spatial dimensions required, found only batch dimension")

    @abstractmethod
    def _compute_metric(self, y_pred, y):
        raise NotImplementedError

    def _compute_tensor(self, y_pred, y=None, **kwargs):
        if y is None:
            raise ValueError("y must be provided.")
        self._check_shape(y_pred, y)
        return self._compute_metric(to_numpy(y_pred).astype(np.float64), to_numpy(y).astype(np.float64))


def _flat_mean(x):
    return x.reshape(x.shape[0], -1).mean(axis=1, keepdims=True)


class MSEMetric(RegressionMetric):
    def _compute_metric(self, y_pred, y):
        return _flat_mean((y_pred - y) ** 2)


class MAEMetric(RegressionMetric):
    def _compute_metric(self, y_pred, y):
        return _flat_mean(np.abs(y_pred - y))


class RMSEMetric(RegressionMetric):
    def _compute_metric(self, y_pred, y):
        return np.sqrt(_flat_mean((y_pred - y) ** 2))


class PSNRMetric(RegressionMetric):
    def __init__(self, max_val: float, reduction: str = MetricReduction.MEAN, get_not_nans: bool = False):
        super().__init__(reduction, get_not_nans)
        self.max_val = max_val

    def _compute_metric(self, y_pred, y):
        mse = _flat_mean((y_pred - y) ** 2)
        return 20 * np.log10(self.max_val) - 10 * np.log10(np.maximum(mse, 1e-12))




def _ssim_filter_valid(v: np.ndarray, win_size, sigma, kernel_type: str = "gaussian") -> np.ndarray:
    """Separable gaussian/uniform filtering with VALID (unpadded) output over the
    spatial dims of (B, C, *spatial), matching the reference's conv-without-padding
    SSIM kernels (reference: monai/metrics/regression.py _compute_metric /
    monai/metrics/utils.py KernelType)."""
    from scipy.ndimage import correlate1d

    nsp = v.ndim - 2
    sizes = list(win_size) if isinstance(win_size, (list, tuple)) else [int(win_size)] * nsp
    sigmas = list(sigma) if isinstance(sigma, (list, tuple)) else [float(sigma)] * nsp
    out = v.astype(np.float64)
    halves = []
    for axis in range(2, v.ndim):
        ws = int(sizes[axis - 2])
        if str(kernel_type) == "uniform":
            g = np.full(ws, 1.0 / ws, dtype=np.float64)
        else:
            coords = np.arange(ws, dtype=np.float64) - (ws - 1) / 2.0
            g = np.exp(-(coords ** 2) / (2 * float(sigmas[axis - 2]) ** 2))
            g /= g.sum()
        out = correlate1d(out, g, axis=axis, mode="constant")
        halves.append(ws // 2)
    slicer = tuple([slice(None)] * 2 + [slice(h, s - h) for h, s in zip(halves, v.shape[2:])])
    return out[slicer]


class SSIMMetric(RegressionMetric):
    """(reference: regression.py SSIMMetric)."""

    def __init__(self, spatial_dims: int, data_range: float = 1.0, kernel_type: str = "gaussian",
                 win_size: int = 11, kernel_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
                 reduction: str = MetricReduction.MEAN, get_not_nans: bool = False):
        super().__init__(reduction, get_not_nans)
        self.spatial_dims = spatial_dims
        self.data_range = data_range
        self.kernel_type = str(kernel_type)
        if self.kernel_type not in ("gaussian", "uniform"):
            raise ValueError(f"kernel_type must be 'gaussian' or 'uniform', got {kernel_type}.")
        self.win_size = win_size
        self.kernel_sigma = kernel_sigma
        self.k1, self.k2 = k1, k2

    def _compute_metric(self, y_pred, y):
        c1 = (self.k1 * self.data_range) ** 2
        c2 = (self.k2 * self.data_range) ** 2
        xp_ = to_numpy(y_pred).astype(np.float64)
        yp_ = to_numpy(y).astype(np.float64)

        def filt(v):
            return _ssim_filter_valid(v, self.win_size, self.kernel_sigma, self.kernel_type)

        mu_x, mu_y = filt(xp_), filt(yp_)
        mu_xx, mu_yy, mu_xy = filt(xp_ * xp_), filt(yp_ * yp_), filt(xp_ * yp_)
        sx, sy, sxy = mu_xx - mu_x**2, mu_yy - mu_y**2, mu_xy - mu_x * mu_y
        num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
        den = (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
        ssim = num / den
        return _flat_mean(ssim)


def compute_roc_auc(y_pred, y, average: str = Average.MACRO):
    """ROC AUC (reference: rocauc.py:—)."""
    y_pred = to_numpy(y_pred).astype(np.float64)
    y = to_numpy(y).astype(np.float64)
    y_pred_ndim = y_pred.ndim
    y_ndim = y.ndim
    if y_pred_ndim not in (1, 2):
        raise ValueError(f"Predictions should be of shape (batch_size, num_classes) or (batch_size, ), got {y_pred.shape}.")
    if y_ndim not in (1, 2):
        raise ValueError(f"Targets should be of shape (batch_size, num_classes) or (batch_size, ), got {y.shape}.")
    if y_pred_ndim == 2 and y_pred.shape[1] == 1:
        y_pred = y_pred[:, 0]
        y_pred_ndim = 1
    if y_ndim == 2 and y.shape[1] == 1:
        y = y[:, 0]
    if y_pred_ndim == 1:
        return _calculate(y_pred, y)
    if y.shape != y_pred.shape:
        raise ValueError(f"data shapes of y_pred and y do not match, got {y_pred.shape} and {y.shape}.")
    average = look_up_option(average, Average)
    if average == Average.MICRO:
        return _calculate(y_pred.flatten(), y.flatten())
    y, y_pred = y.T, y_pred.T
    auc_values = [_calculate(y_pred_, y_) for y_pred_, y_ in zip(y_pred, y)]
    if average == Average.NONE:
        return auc_values
    if average == Average.MACRO:
        return float(np.mean(auc_values))
    if average == Average.WEIGHTED:
        weights = [np.sum(y_) for y_ in y]
        return float(np.average(auc_values, weights=weights))
    raise ValueError(f'Unsupported average: {average}.')


def _calculate(y_pred: np.ndarray, y: np.ndarray) -> float:
    """Single-class AUC with tie handling (reference: rocauc.py:—)."""
    if not (np.all((y == 0) | (y == 1))):
        import warnings

        warnings.warn("y values must be 0 or 1; assuming binarized.")
    n = len(y)
    indices = np.argsort(y_pred)
    y = y[indices]
    y_pred = y_pred[indices]
    nneg = auc = tmp_pos = tmp_neg = 0.0
    for i in range(n):
        y_i = y[i]
        if i + 1 < n and y_pred[i] == y_pred[i + 1]:
            tmp_pos += y_i
            tmp_neg += 1 - y_i
            continue
        if tmp_pos + tmp_neg > 0:
            tmp_pos += y_i
            tmp_neg += 1 - y_i
            nneg += tmp_neg
            auc += tmp_pos * (nneg - tmp_neg / 2)
            tmp_pos = tmp_neg = 0
            continue
        if y_i == 1:
            auc += nneg
        else:
            nneg += 1
    denom = nneg * (n - nneg)
    return auc / denom if denom > 0 else float("nan")


class ROCAUCMetric(Cumulative, Metric):
    """Cumulative AUC (reference: rocauc.py ROCAUCMetric)."""

    def __init__(self, average: str = Average.MACRO):
        super().__init__()
        self.average = average

    def __call__(self, y_pred, y):
        self.extend(np.atleast_1d(to_numpy(y_pred)), np.atleast_1d(to_numpy(y)))

    def aggregate(self, average=None):
        buf = self.get_buffer()
        y_pred, y = buf
        return compute_roc_auc(y_pred, y, average or self.average)


def compute_average_precision(y_pred, y, average: str = Average.MACRO):
    """AP (reference: average_precision.py:—)."""
    y_pred = to_numpy(y_pred).astype(np.float64)
    y = to_numpy(y).astype(np.float64)
    if y_pred.ndim == 2 and y_pred.shape[1] == 1:
        y_pred = y_pred[:, 0]
    if y.ndim == 2 and y.shape[1] == 1:
        y = y[:, 0]
    if y_pred.ndim == 1:
        return _calculate_ap(y_pred, y)
    average = look_up_option(average, Average)
    if average == Average.MICRO:
        return _calculate_ap(y_pred.flatten(), y.flatten())
    y, y_pred = y.T, y_pred.T
    ap_values = [_calculate_ap(y_pred_, y_) for y_pred_, y_ in zip(y_pred, y)]
    if average == Average.NONE:
        return ap_values
    if average == Average.MACRO:
        return float(np.mean(ap_values))
    if average == Average.WEIGHTED:
        weights = [np.sum(y_) for y_ in y]
        return float(np.average(ap_values, weights=weights))
    raise ValueError(f'Unsupported average: {average}.')


def _calculate_ap(y_pred: np.ndarray, y: np.ndarray) -> float:
    order = np.argsort(-y_pred, kind="stable")
    y = y[order]
    tps = np.cumsum(y)
    fps = np.cumsum(1 - y)
    precision = tps / np.maximum(tps + fps, 1e-12)
    n_pos = y.sum()
    if n_pos == 0:
        return float("nan")
    return float(np.sum(precision * y) / n_pos)


class AveragePrecisionMetric(Cumulative, Metric):
    def __init__(self, average: str = Average.MACRO):
        super().__init__()
        self.average = average

    def __call__(self, y_pred, y):
        self.extend(np.atleast_1d(to_numpy(y_pred)), np.atleast_1d(to_numpy(y)))

    def aggregate(self, average=None):
        y_pred, y = self.get_buffer()
        return compute_average_precision(y_pred, y, average or self.average)


class CumulativeAverage:
    """Running average with cross-process sync (reference: cumulative_average.py:23)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = None
        self.count = None

    def get_current(self, to_numpy_out: bool = True):
        if self.val is None:
            return 0
        val = np.where(np.isnan(self.val), 0, self.val)
        return val

    def append(self, val, count=1) -> None:
        val = np.asarray(to_numpy(val), dtype=np.float64)
        count = np.asarray(to_numpy(count), dtype=np.float64)
        self.val = val
        nfin = np.isfinite(val)
        count = np.where(nfin, count, 0)
        val = np.where(nfin, val, 0)
        if self.sum is None:
            self.sum = val * count
            self.count = count.astype(np.float64)
        else:
            self.sum = self.sum + val * count
            self.count = self.count + count

    def aggregate(self, to_numpy_out: bool = True):
        if self.sum is None:
            return 0
        from ..utils.dist import evenly_divisible_all_gather

        import jax

        if jax.process_count() > 1:
            sums = evenly_divisible_all_gather(self.sum[None], concat=True)
            counts = evenly_divisible_all_gather(self.count[None], concat=True)
            total_sum, total_count = sums.sum(0), counts.sum(0)
        else:
            total_sum, total_count = self.sum, self.count
        return np.where(total_count > 0, total_sum / np.maximum(total_count, 1), 0.0)

    val = None


def compute_frechet_distance(mu_x: np.ndarray, sigma_x: np.ndarray, mu_y: np.ndarray,
                             sigma_y: np.ndarray, epsilon: float = 1e-6) -> float:
    """FID core (reference: fid.py:—)."""
    from scipy import linalg

    diff = mu_x - mu_y
    covmean, _ = linalg.sqrtm(sigma_x.dot(sigma_y), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma_x.shape[0]) * epsilon
        covmean = linalg.sqrtm((sigma_x + offset).dot(sigma_y + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma_x) + np.trace(sigma_y) - 2 * np.trace(covmean))


class FIDMetric(Metric):
    """Frechet inception distance over feature vectors (reference: fid.py:—)."""

    def __call__(self, y_pred, y):
        y_pred = to_numpy(y_pred).astype(np.float64)
        y = to_numpy(y).astype(np.float64)
        if y_pred.ndim != 2 or y.ndim != 2:
            raise ValueError("Inputs should have (number images, number of features) shape.")
        mu_y_pred = y_pred.mean(0)
        sigma_y_pred = np.cov(y_pred, rowvar=False)
        mu_y = y.mean(0)
        sigma_y = np.cov(y, rowvar=False)
        return compute_frechet_distance(mu_y_pred, sigma_y_pred, mu_y, sigma_y)


class MMDMetric(Metric):
    """Maximum mean discrepancy (reference: mmd.py:—)."""

    def __init__(self, y_mapping=None):
        self.y_mapping = y_mapping

    def __call__(self, y, y_pred):
        y = to_numpy(y).astype(np.float64)
        y_pred = to_numpy(y_pred).astype(np.float64)
        if self.y_mapping is not None:
            y = np.asarray(self.y_mapping(y))
            y_pred = np.asarray(self.y_mapping(y_pred))
        if y_pred.shape != y.shape:
            raise ValueError(f"y_pred and y shapes dont match after being processed by their transforms, received y_pred: {y_pred.shape} and y: {y.shape}")
        y = y.reshape(y.shape[0], -1)
        y_pred = y_pred.reshape(y_pred.shape[0], -1)
        y_y = y @ y.T
        y_pred_y_pred = y_pred @ y_pred.T
        y_pred_y = y_pred @ y.T
        m = y.shape[0]
        n = y_pred.shape[0]
        c1 = 1 / (m * (m - 1)) if m > 1 else 1.0 / m
        a = y_y.sum() - np.trace(y_y)
        c2 = 1 / (n * (n - 1)) if n > 1 else 1.0 / n
        b = y_pred_y_pred.sum() - np.trace(y_pred_y_pred)
        c3 = 2 / (m * n)
        c = y_pred_y.sum()
        return float(c1 * a + c2 * b - c3 * c)


class KernelType(StrEnum):
    """SSIM kernel types (reference: monai/metrics/utils.py KernelType)."""

    GAUSSIAN = "gaussian"
    UNIFORM = "uniform"


class MultiScaleSSIMMetric(RegressionMetric):
    """Multi-scale SSIM (reference: monai/metrics/ms_ssim.py MultiScaleSSIMMetric).

    Contrast-structure terms at each scale (avg-pool 2 between scales) are combined as
    prod(cs_i^w_i) * ssim_L^w_L with the standard 5-scale weights.
    """

    def __init__(self, spatial_dims: int, data_range: float = 1.0,
                 kernel_type: str = KernelType.GAUSSIAN, kernel_size=11,
                 kernel_sigma=1.5, k1: float = 0.01, k2: float = 0.03,
                 weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
                 reduction: str = MetricReduction.MEAN, get_not_nans: bool = False):
        super().__init__(reduction, get_not_nans)
        self.spatial_dims = spatial_dims
        self.data_range = data_range
        self.kernel_type = str(kernel_type)
        if self.kernel_type not in ("gaussian", "uniform"):
            raise ValueError(f"kernel_type must be 'gaussian' or 'uniform', got {kernel_type}.")
        self.kernel_size = kernel_size
        self.kernel_sigma = kernel_sigma
        self.k1, self.k2 = k1, k2
        self.weights = list(weights)

    def _ssim_cs(self, x, y):
        c1 = (self.k1 * self.data_range) ** 2
        c2 = (self.k2 * self.data_range) ** 2

        def filt(v):
            return _ssim_filter_valid(v, self.kernel_size, self.kernel_sigma, self.kernel_type)

        mu_x, mu_y = filt(x), filt(y)
        mu_xx, mu_yy, mu_xy = filt(x * x), filt(y * y), filt(x * y)
        sx, sy, sxy = mu_xx - mu_x ** 2, mu_yy - mu_y ** 2, mu_xy - mu_x * mu_y
        cs = (2 * sxy + c2) / (sx + sy + c2)
        ssim = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
        axes = tuple(range(1, mu_x.ndim))
        return ssim.mean(axis=axes), cs.mean(axis=axes)

    @staticmethod
    def _downsample(v):
        sd = v.ndim - 2
        for axis in range(2, 2 + sd):
            n = v.shape[axis] - v.shape[axis] % 2
            sl0 = [slice(None)] * v.ndim
            sl1 = [slice(None)] * v.ndim
            sl0[axis] = slice(0, n, 2)
            sl1[axis] = slice(1, n, 2)
            v = (v[tuple(sl0)] + v[tuple(sl1)]) / 2.0
        return v

    def _compute_metric(self, y_pred, y):
        x = to_numpy(y_pred).astype(np.float64)
        t = to_numpy(y).astype(np.float64)
        levels = len(self.weights)
        mcs = []
        ssim_val = None
        for i in range(levels):
            ssim_val, cs = self._ssim_cs(x, t)
            if i < levels - 1:
                mcs.append(np.maximum(cs, 0.0))
                x = self._downsample(x)
                t = self._downsample(t)
        terms = np.stack(mcs + [np.maximum(ssim_val, 0.0)], axis=0)  # (levels, B)
        w = np.asarray(self.weights)[:, None]
        ms = np.prod(terms ** w, axis=0)
        return ms[:, None]


def compute_mmd(y, y_pred, y_mapping=None):
    """Functional MMD (reference: metrics/mmd.py:43)."""
    return MMDMetric(y_mapping=y_mapping)(y, y_pred)


def compute_ssim_and_cs(y_pred, y, spatial_dims: int, kernel_size=11, kernel_sigma=1.5,
                        data_range: float = 1.0, kernel_type: str = KernelType.GAUSSIAN,
                        k1: float = 0.01, k2: float = 0.03):
    """Per-sample SSIM and contrast-sensitivity maps reduced to scalars
    (reference: metrics/regression.py:369)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    xp_ = to_numpy(y_pred).astype(np.float64)
    yp_ = to_numpy(y).astype(np.float64)
    ks = kernel_size[0] if isinstance(kernel_size, (list, tuple)) else kernel_size
    sg = kernel_sigma[0] if isinstance(kernel_sigma, (list, tuple)) else kernel_sigma

    def filt(v):
        return _ssim_filter_valid(v, ks, sg, str(kernel_type))

    mu_x, mu_y = filt(xp_), filt(yp_)
    mu_xx, mu_yy, mu_xy = filt(xp_ * xp_), filt(yp_ * yp_), filt(xp_ * yp_)
    sx, sy, sxy = mu_xx - mu_x ** 2, mu_yy - mu_y ** 2, mu_xy - mu_x * mu_y
    cs = (2 * sxy + c2) / (sx + sy + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
    return _flat_mean(ssim), _flat_mean(cs)


def compute_ms_ssim(y_pred, y, spatial_dims: int, data_range: float = 1.0,
                    kernel_type: str = KernelType.GAUSSIAN, kernel_size=11,
                    kernel_sigma=1.5, k1: float = 0.01, k2: float = 0.03,
                    weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)):
    """Functional multi-scale SSIM (reference: metrics/regression.py:504)."""
    metric = MultiScaleSSIMMetric(spatial_dims=spatial_dims, data_range=data_range,
                                  kernel_type=kernel_type, kernel_size=kernel_size,
                                  kernel_sigma=kernel_sigma, k1=k1, k2=k2, weights=weights)
    return metric._compute_metric(to_numpy(y_pred).astype(np.float64),
                                  to_numpy(y).astype(np.float64))


def get_fid_score(y_pred, y):
    """FID between two (N, F) feature batches (reference: fid.py:40)."""
    yp = np.asarray(to_numpy(y_pred), dtype=np.float64)
    yt = np.asarray(to_numpy(y), dtype=np.float64)
    if yt.ndim > 2:
        raise ValueError("Inputs should have (number images, number of features) shape.")
    mu_x, mu_y = yp.mean(axis=0), yt.mean(axis=0)
    sigma_x = np.cov(yp, rowvar=False)
    sigma_y = np.cov(yt, rowvar=False)
    return compute_frechet_distance(mu_x, sigma_x, mu_y, sigma_y)


def compute_mean_error_metrics(y_pred, y, func):
    """Mean of func(y - y_pred) over channel+spatial dims, batch kept (reference:
    regression.py:216)."""
    diff = func(np.asarray(to_numpy(y)) - np.asarray(to_numpy(y_pred)))
    return diff.reshape(diff.shape[0], -1).mean(axis=-1, keepdims=True)
