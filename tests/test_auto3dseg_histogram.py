"""ImageHistogram / ImageHistogramSumm analyzers (VERDICT r2 missing #6).

Reference: monai/auto3dseg/analyzer.py:843,958.
"""
from __future__ import annotations

import sys

import numpy as np
import pytest

from monai_tpu.auto3dseg import ImageHistogram, ImageHistogramSumm, SegSummarizer
from monai_tpu.utils.enums import DataStatsKeys, ImageStatsKeys

sys.path.insert(0, "/root/reference")
try:
    from monai.auto3dseg.analyzer import ImageHistogram as RefHist
    HAS_REF = True
except Exception:
    HAS_REF = False
finally:
    if "/root/reference" in sys.path:
        sys.path.remove("/root/reference")


def test_image_histogram_basic():
    rng = np.random.RandomState(0)
    data = {"image": rng.rand(1, 10, 10, 10).astype(np.float32)}
    out = ImageHistogram(image_key="image")(dict(data))
    rep = out[DataStatsKeys.IMAGE_HISTOGRAM]
    assert len(rep) == 1 and len(rep[0]["counts"]) == 100
    assert len(rep[0]["bin_edges"]) == 101
    assert sum(rep[0]["counts"]) == 1000  # everything inside [-500, 500]


def test_image_histogram_multichannel_and_validation():
    rng = np.random.RandomState(1)
    data = {"image": rng.randn(2, 8, 8).astype(np.float32)}
    out = ImageHistogram(image_key="image", hist_bins=[10, 20],
                         hist_range=[[-3, 3], [-5, 5]])(dict(data))
    rep = out[DataStatsKeys.IMAGE_HISTOGRAM]
    assert len(rep) == 2
    assert len(rep[0]["counts"]) == 10 and len(rep[1]["counts"]) == 20
    with pytest.raises(ValueError):
        ImageHistogram(image_key="image", hist_bins=[10], hist_range=[[0, 1], [0, 1]])
    with pytest.raises(ValueError):
        ImageHistogram(image_key="image", hist_bins=[-1])
    with pytest.raises(ValueError):
        ImageHistogram(image_key="image", hist_range=[0, 1, 2])


@pytest.mark.skipif(not HAS_REF, reason="reference MONAI not importable")
def test_image_histogram_reference_parity():
    rng = np.random.RandomState(2)
    img = (rng.randn(1, 12, 12, 8) * 100).astype(np.float32)
    ours = ImageHistogram(image_key="image")({"image": img})[DataStatsKeys.IMAGE_HISTOGRAM]
    ref = RefHist(image_key="image")({"image": img})["image_histogram"]
    np.testing.assert_array_equal(ours[0]["counts"], ref[0]["counts"])
    np.testing.assert_allclose(ours[0]["bin_edges"], ref[0]["bin_edges"])


def test_image_histogram_summ_accumulates():
    rng = np.random.RandomState(3)
    cases = [ImageHistogram(image_key="image", hist_bins=16, hist_range=[-2, 2])(
        {"image": rng.randn(1, 6, 6).astype(np.float32)}) for _ in range(3)]
    # the summ analyzer accumulates into the first case's buffers (reference
    # behaviour, analyzer.py:1020) — snapshot expectations first
    expect = np.sum([np.asarray(c[DataStatsKeys.IMAGE_HISTOGRAM][0]["counts"])
                     for c in cases], axis=0)
    summ = ImageHistogramSumm()(cases)
    total = summ[ImageStatsKeys.HISTOGRAM]
    assert len(total) == 1 and len(total[0]["counts"]) == 16
    np.testing.assert_array_equal(total[0]["counts"], expect)
    with pytest.raises(ValueError):
        ImageHistogramSumm()("not a list")
    with pytest.raises(ValueError):
        ImageHistogramSumm()([])


def test_seg_summarizer_histogram_wiring():
    rng = np.random.RandomState(4)
    summ = SegSummarizer("image", "label", hist_bins=8, hist_range=[-2, 2])
    case = summ({"image": rng.randn(1, 8, 8, 8).astype(np.float32),
                 "label": (rng.rand(1, 8, 8, 8) > 0.5).astype(np.float32)})
    assert DataStatsKeys.IMAGE_HISTOGRAM in case
    report = summ.summarize([case, case])
    assert DataStatsKeys.IMAGE_HISTOGRAM in report
    # histogram_only skips the other analyzers
    h_only = SegSummarizer("image", None, hist_bins=8, hist_range=[-2, 2],
                           histogram_only=True)
    case2 = h_only({"image": rng.randn(1, 8, 8).astype(np.float32)})
    assert DataStatsKeys.IMAGE_HISTOGRAM in case2
    assert DataStatsKeys.IMAGE_STATS not in case2
