"""Per-case and summary statistics analyzers
(reference: monai/auto3dseg/analyzer.py:58 Analyzer, :174 ImageStats, :276 FgImageStats,
:357 LabelStats, :526-811 summary/filename analyzers).

Host-side numpy; these run inside the data pipeline, not on the TPU.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import numpy as np

from ..data.meta_image import MetaImage
from ..transforms.transform import MapTransform
from ..utils.backend import to_numpy
from ..utils.enums import DataStatsKeys, ImageStatsKeys, LabelStatsKeys
from .operations import Operations, SampleOperations, SummaryOperations

__all__ = ["Analyzer", "ImageStats", "FgImageStats", "LabelStats", "ImageStatsSumm",
           "FgImageStatsSumm", "LabelStatsSumm", "FilenameStats", "ImageHistogram",
           "ImageHistogramSumm"]


def _arr(x):
    return to_numpy(x.data if isinstance(x, MetaImage) else x)


class Analyzer(MapTransform, ABC):
    """Base analyzer: fills a report template from ops (reference: analyzer.py:58)."""

    def __init__(self, stats_name: str, report_format: dict):
        super().__init__(None)
        self.stats_name = stats_name
        self.report_format = dict(report_format)
        self.ops: dict = {}

    def update_ops(self, key: str, op: Operations):
        self.ops[key] = op
        if key in self.report_format:
            self.report_format[key] = op

    def get_report_format(self) -> dict:
        return {k: (None if isinstance(v, Operations) else v)
                for k, v in self.report_format.items()}

    @abstractmethod
    def __call__(self, data: Any) -> dict:
        ...


class ImageStats(Analyzer):
    """Shape/channels/spacing/intensity per case (reference: analyzer.py:174)."""

    def __init__(self, image_key: str, stats_name: str = DataStatsKeys.IMAGE_STATS):
        report = {ImageStatsKeys.SHAPE: None, ImageStatsKeys.CHANNELS: None,
                  ImageStatsKeys.CROPPED_SHAPE: None, ImageStatsKeys.SPACING: None,
                  ImageStatsKeys.SIZEMM: None, ImageStatsKeys.INTENSITY: None}
        super().__init__(stats_name, report)
        self.image_key = image_key
        self.update_ops(ImageStatsKeys.INTENSITY, SampleOperations())

    def __call__(self, data: dict) -> dict:
        d = dict(data)
        img = d[self.image_key]
        arr = _arr(img)
        if arr.ndim == len(arr.shape) and arr.ndim in (3, 4):
            nda = arr if arr.ndim == 4 else arr[None]
        else:
            nda = np.atleast_3d(arr)[None]
        spacing = [1.0] * (nda.ndim - 1)
        if isinstance(img, MetaImage) and img.affine is not None:
            aff = np.asarray(img.affine)
            n = min(aff.shape[0] - 1, nda.ndim - 1)
            spacing = np.sqrt((aff[:n, :n] ** 2).sum(0)).tolist()
        shape = list(nda.shape[1:])
        report = {
            ImageStatsKeys.SHAPE: [shape],
            ImageStatsKeys.CHANNELS: nda.shape[0],
            ImageStatsKeys.CROPPED_SHAPE: [list(np.asarray(nda[0] > 0).nonzero()[0][[0, -1]])
                                           if np.any(nda[0] > 0) else shape],
            ImageStatsKeys.SPACING: [spacing],
            ImageStatsKeys.SIZEMM: [[s * sp for s, sp in zip(shape, spacing)]],
            ImageStatsKeys.INTENSITY: [self.ops[ImageStatsKeys.INTENSITY].evaluate(nda)],
        }
        d[self.stats_name] = report
        return d


class FgImageStats(Analyzer):
    """Intensity stats restricted to the label foreground (reference: analyzer.py:276)."""

    def __init__(self, image_key: str, label_key: str,
                 stats_name: str = DataStatsKeys.FG_IMAGE_STATS):
        super().__init__(stats_name, {ImageStatsKeys.INTENSITY: None})
        self.image_key = image_key
        self.label_key = label_key
        self.update_ops(ImageStatsKeys.INTENSITY, SampleOperations())

    def __call__(self, data: dict) -> dict:
        d = dict(data)
        img = _arr(d[self.image_key])
        lab = _arr(d[self.label_key])
        fg = img[np.broadcast_to(lab > 0, img.shape)]
        if fg.size == 0:
            fg = np.zeros(1, img.dtype)
        d[self.stats_name] = {
            ImageStatsKeys.INTENSITY: [self.ops[ImageStatsKeys.INTENSITY].evaluate(fg)]}
        return d


class LabelStats(Analyzer):
    """Per-class pixel percentage / intensity / component stats
    (reference: analyzer.py:357)."""

    def __init__(self, image_key: str, label_key: str,
                 stats_name: str = DataStatsKeys.LABEL_STATS, do_ccp: bool = True):
        report = {LabelStatsKeys.LABEL_UID: None, LabelStatsKeys.IMAGE_INTST: None,
                  LabelStatsKeys.LABEL: None, LabelStatsKeys.PIXEL_PCT: None}
        super().__init__(stats_name, report)
        self.image_key = image_key
        self.label_key = label_key
        self.do_ccp = do_ccp
        self.update_ops(LabelStatsKeys.IMAGE_INTST, SampleOperations())

    def __call__(self, data: dict) -> dict:
        from scipy import ndimage as ndi

        d = dict(data)
        img = _arr(d[self.image_key])
        lab = _arr(d[self.label_key])
        if lab.ndim == img.ndim and lab.shape[0] == 1:
            lab2 = lab[0]
        else:
            lab2 = lab
        uids = [int(v) for v in np.unique(lab2)]
        total = lab2.size
        per_label = []
        pixel_pct = []
        for uid in uids:
            mask = lab2 == uid
            entry = {LabelStatsKeys.IMAGE_INTST:
                     self.ops[LabelStatsKeys.IMAGE_INTST].evaluate(
                         img[np.broadcast_to(mask[None] if img.ndim == mask.ndim + 1 else mask,
                                             img.shape)])}
            if self.do_ccp:
                labeled, ncomp = ndi.label(mask)
                sizes = np.bincount(labeled.ravel())[1:].tolist()
                entry[LabelStatsKeys.LABEL_SHAPE] = sizes
                entry[LabelStatsKeys.LABEL_NCOMP] = int(ncomp)
            per_label.append(entry)
            pixel_pct.append({uid: float(mask.sum()) / total})
        d[self.stats_name] = {
            LabelStatsKeys.LABEL_UID: uids,
            LabelStatsKeys.IMAGE_INTST: [e[LabelStatsKeys.IMAGE_INTST] for e in per_label],
            LabelStatsKeys.LABEL: per_label,
            LabelStatsKeys.PIXEL_PCT: pixel_pct,
        }
        return d


def _gather(stats_list: list, key_path: list):
    out = []
    for s in stats_list:
        v = s
        for k in key_path:
            v = v[k]
        out.append(v)
    return out


class ImageStatsSumm(Analyzer):
    """Summarize ImageStats across cases (reference: analyzer.py:526)."""

    def __init__(self, stats_name: str = DataStatsKeys.IMAGE_STATS, average: bool = True):
        super().__init__(stats_name, {})
        self.average = average
        self.summary_op = SummaryOperations()

    def __call__(self, data: list) -> dict:
        stats = [d[self.stats_name] for d in data]
        shapes = np.asarray([s[ImageStatsKeys.SHAPE][0] for s in stats], dtype=np.float64)
        spacings = np.asarray([s[ImageStatsKeys.SPACING][0] for s in stats], dtype=np.float64)
        sample_op = SampleOperations()
        intensity_keys = stats[0][ImageStatsKeys.INTENSITY][0].keys()
        intensity = {k: np.asarray([s[ImageStatsKeys.INTENSITY][0][k] for s in stats])
                     for k in intensity_keys}
        return {
            ImageStatsKeys.SHAPE: sample_op.evaluate(shapes),
            ImageStatsKeys.CHANNELS: sample_op.evaluate(
                np.asarray([s[ImageStatsKeys.CHANNELS] for s in stats], dtype=np.float64)),
            ImageStatsKeys.SPACING: sample_op.evaluate(spacings),
            ImageStatsKeys.INTENSITY: self.summary_op.evaluate(intensity),
        }


class FgImageStatsSumm(Analyzer):
    """Summarize FgImageStats across cases (reference: analyzer.py:616)."""

    def __init__(self, stats_name: str = DataStatsKeys.FG_IMAGE_STATS, average: bool = True):
        super().__init__(stats_name, {})
        self.summary_op = SummaryOperations()

    def __call__(self, data: list) -> dict:
        stats = [d[self.stats_name] for d in data]
        keys = stats[0][ImageStatsKeys.INTENSITY][0].keys()
        intensity = {k: np.asarray([s[ImageStatsKeys.INTENSITY][0][k] for s in stats])
                     for k in keys}
        return {ImageStatsKeys.INTENSITY: self.summary_op.evaluate(intensity)}


class LabelStatsSumm(Analyzer):
    """Summarize LabelStats across cases (reference: analyzer.py:680)."""

    def __init__(self, stats_name: str = DataStatsKeys.LABEL_STATS, average: bool = True,
                 do_ccp: bool = True):
        super().__init__(stats_name, {})
        self.summary_op = SummaryOperations()

    def __call__(self, data: list) -> dict:
        stats = [d[self.stats_name] for d in data]
        all_uids = sorted({u for s in stats for u in s[LabelStatsKeys.LABEL_UID]})
        pct = {}
        for s in stats:
            for entry in s[LabelStatsKeys.PIXEL_PCT]:
                for uid, p in entry.items():
                    pct.setdefault(uid, []).append(p)
        return {
            LabelStatsKeys.LABEL_UID: all_uids,
            LabelStatsKeys.PIXEL_PCT: [{u: float(np.mean(v))} for u, v in sorted(pct.items())],
        }


class FilenameStats(Analyzer):
    """Record the case filename (reference: analyzer.py:811)."""

    def __init__(self, key: str | None, stats_name: str):
        super().__init__(stats_name, {})
        self.key = key

    def __call__(self, data: dict) -> dict:
        d = dict(data)
        name = "None"
        if self.key and self.key in d:
            item = d[self.key]
            if isinstance(item, MetaImage):
                name = str(item.meta.get("filename_or_obj", "None"))
            elif isinstance(item, str):
                name = item
        d[self.stats_name] = name
        return d


class ImageHistogram(Analyzer):
    """Per-channel intensity histogram (reference: analyzer.py:843)."""

    def __init__(self, image_key: str, stats_name: str = DataStatsKeys.IMAGE_HISTOGRAM,
                 hist_bins=None, hist_range=None):
        self.image_key = image_key
        self.hist_bins = ([100] if hist_bins is None
                          else hist_bins if isinstance(hist_bins, list) else [hist_bins])
        self.hist_range = [-500, 500] if hist_range is None else hist_range
        super().__init__(stats_name, {"counts": None, "bin_edges": None})
        self.update_ops(ImageStatsKeys.HISTOGRAM, SampleOperations())
        if not all(isinstance(hr, list) for hr in self.hist_range):
            self.hist_range = [self.hist_range]
        if len(self.hist_bins) != len(self.hist_range):
            raise ValueError(
                f"Number of histogram bins ({len(self.hist_bins)}) and histogram ranges "
                f"({len(self.hist_range)}) need to be the same!")
        for i, (_bins, _range) in enumerate(zip(self.hist_bins, self.hist_range)):
            if not isinstance(_bins, int) or _bins < 0:
                raise ValueError(
                    f"Expected {i + 1}. hist_bins value to be positive integer but got {_bins}")
            if not isinstance(_range, list) or len(_range) != 2:
                raise ValueError(
                    f"Expected {i + 1}. hist_range values to be list of length 2 "
                    f"but received {_range}")

    def __call__(self, data: dict) -> dict:
        d = dict(data)
        ndas = np.asarray(_arr(d[self.image_key]))
        nr_channels = ndas.shape[0]
        if len(self.hist_bins) == 1:
            self.hist_bins = nr_channels * self.hist_bins
        if len(self.hist_bins) != nr_channels:
            raise ValueError(
                f"There is a mismatch between the number of channels ({nr_channels}) "
                f"and number histogram bins ({len(self.hist_bins)}).")
        if len(self.hist_range) == 1:
            self.hist_range = nr_channels * self.hist_range
        if len(self.hist_range) != nr_channels:
            raise ValueError(
                f"There is a mismatch between the number of channels ({nr_channels}) "
                f"and histogram ranges ({len(self.hist_range)}).")
        reports = []
        for channel in range(nr_channels):
            counts, bin_edges = np.histogram(
                ndas[channel], bins=self.hist_bins[channel],
                range=(self.hist_range[channel][0], self.hist_range[channel][1]))
            reports.append({"counts": counts.tolist(), "bin_edges": bin_edges.tolist()})
        d[self.stats_name] = reports
        return d


class ImageHistogramSumm(Analyzer):
    """Sums the per-case histograms channel-wise (reference: analyzer.py:958)."""

    def __init__(self, stats_name: str = DataStatsKeys.IMAGE_HISTOGRAM,
                 average: bool | None = True):
        self.summary_average = average
        super().__init__(stats_name, {ImageStatsKeys.HISTOGRAM: None})
        self.update_ops(ImageStatsKeys.HISTOGRAM, SummaryOperations())

    def __call__(self, data: list) -> dict:
        if not isinstance(data, list):
            raise ValueError(f"Callable {self.__class__} requires list inputs")
        if len(data) == 0:
            raise ValueError(f"Callable {self.__class__} input list is empty")
        if self.stats_name not in data[0]:
            raise KeyError(f"{self.stats_name} is not in input data")
        summ_histogram: list = []
        for d in data:
            if not summ_histogram:
                summ_histogram = d[self.stats_name]
                for k in range(len(summ_histogram)):
                    summ_histogram[k]["counts"] = np.array(summ_histogram[k]["counts"])
            else:
                for k in range(len(summ_histogram)):
                    summ_histogram[k]["counts"] += np.array(d[self.stats_name][k]["counts"])
                    if np.all(np.asarray(summ_histogram[k]["bin_edges"])
                              != np.asarray(d[self.stats_name][k]["bin_edges"])):
                        raise ValueError(
                            f"bin edges are not consistent! {summ_histogram[k]['bin_edges']} "
                            f"vs. {d[self.stats_name][k]['bin_edges']}")
        for k in range(len(summ_histogram)):
            summ_histogram[k]["counts"] = summ_histogram[k]["counts"].tolist()
        return {ImageStatsKeys.HISTOGRAM: summ_histogram}
