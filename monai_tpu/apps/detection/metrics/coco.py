"""COCO detection metrics: mAP/AP/mAR/AR over IoU thresholds
(reference: monai/apps/detection/metrics/coco.py:74 COCOMetric; adapted from pycocotools).
"""
from __future__ import annotations

import logging
from collections.abc import Sequence

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["COCOMetric"]


def _stats_single_threshold(tp, fp, dt_scores_sorted, recall_thresholds, num_gt):
    """Recall, box-smoothed precision curve, score thresholds
    (reference: coco.py:500 _compute_stats_single_threshold)."""
    num_recall_th = len(recall_thresholds)
    rc = tp / num_gt
    pr = tp / (fp + tp + np.spacing(1))
    recall = rc[-1] if len(tp) else 0.0
    precision = np.zeros((num_recall_th,))
    th_scores = np.zeros((num_recall_th,))
    pr = pr.tolist()
    for i in range(len(tp) - 1, 0, -1):
        if pr[i] > pr[i - 1]:
            pr[i - 1] = pr[i]
    inds = np.searchsorted(rc, recall_thresholds, side="left")
    for save_idx, array_index in enumerate(inds):
        if array_index < len(pr):
            precision[save_idx] = pr[array_index]
            th_scores[save_idx] = dt_scores_sorted[array_index]
    return recall, precision, th_scores


class COCOMetric:
    """(reference: coco.py:74). Call with the output of ``matching_batch``; returns
    (dict of scalar metrics, None)."""

    def __init__(self, classes: Sequence[str], iou_list: Sequence[float] = (0.1, 0.5, 0.75),
                 iou_range: Sequence[float] = (0.1, 0.5, 0.05),
                 max_detection: Sequence[int] = (1, 5, 100), per_class: bool = True,
                 verbose: bool = True):
        self.verbose = verbose
        self.classes = classes
        self.per_class = per_class
        iou_list_np = np.array(iou_list)
        _iou_range = np.linspace(iou_range[0], iou_range[1],
                                 int(np.round((iou_range[1] - iou_range[0]) / iou_range[2])) + 1,
                                 endpoint=True)
        self.iou_thresholds = np.union1d(iou_list_np, _iou_range)
        self.iou_range = iou_range
        self.iou_list_idx = np.nonzero(iou_list_np[:, None] == self.iou_thresholds[None])[1]
        self.iou_range_idx = np.nonzero(_iou_range[:, None] == self.iou_thresholds[None])[1]
        self.recall_thresholds = np.linspace(0.0, 1.0, 101, endpoint=True)
        self.max_detections = max_detection

    def get_iou_thresholds(self) -> Sequence[float]:
        return list(self.iou_thresholds)

    def __call__(self, *args, **kwargs):
        return self.compute(*args, **kwargs)

    def compute(self, results_list: list[dict]) -> tuple[dict[str, float], None]:
        stats = self._compute_statistics(results_list)
        results: dict[str, float] = {}
        results.update(self._compute_ap(stats))
        results.update(self._compute_ar(stats))
        return results, None

    # --- aggregation -------------------------------------------------------
    def _compute_statistics(self, results_list: list[dict]) -> dict:
        num_iou_th = len(self.iou_thresholds)
        num_recall_th = len(self.recall_thresholds)
        num_classes = len(self.classes)
        num_max = len(self.max_detections)
        precision = -np.ones((num_iou_th, num_recall_th, num_classes, num_max))
        recall = -np.ones((num_iou_th, num_classes, num_max))
        scores = -np.ones((num_iou_th, num_recall_th, num_classes, num_max))
        for cls_idx, cls_name in enumerate(self.classes):
            for max_det_idx, max_det in enumerate(self.max_detections):
                results = [r[cls_idx] for r in results_list if cls_idx in r]
                if not results:
                    logger.warning(f"no results found for COCO metric for class {cls_name}")
                    continue
                dt_scores = np.concatenate([r["dtScores"][:max_det] for r in results])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dt_scores_sorted = dt_scores[inds]
                dt_matches = np.concatenate([r["dtMatches"][:, :max_det] for r in results],
                                            axis=1)[:, inds]
                dt_ignores = np.concatenate([r["dtIgnore"][:, :max_det] for r in results],
                                            axis=1)[:, inds]
                gt_ignore = np.concatenate([r["gtIgnore"] for r in results])
                num_gt = int(np.count_nonzero(gt_ignore == 0))
                if num_gt == 0:
                    logger.warning(f"no ground truth found for COCO metric for class {cls_name}")
                    continue
                tps = np.logical_and(dt_matches, np.logical_not(dt_ignores))
                fps = np.logical_and(np.logical_not(dt_matches), np.logical_not(dt_ignores))
                tp_sum = np.cumsum(tps, axis=1).astype(np.float32)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float32)
                for th_ind, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    r, p, s = _stats_single_threshold(np.array(tp), np.array(fp),
                                                      dt_scores_sorted,
                                                      self.recall_thresholds, num_gt)
                    recall[th_ind, cls_idx, max_det_idx] = r
                    precision[th_ind, :, cls_idx, max_det_idx] = p
                    scores[th_ind, :, cls_idx, max_det_idx] = s
        return {"counts": [num_iou_th, num_recall_th, num_classes, num_max],
                "recall": recall, "precision": precision, "scores": scores}

    @staticmethod
    def _select_ap(stats, iou_idx=None, cls_idx=None, max_det_idx: int = -1) -> float:
        prec = stats["precision"]
        if iou_idx is not None:
            prec = prec[iou_idx]
        if cls_idx is not None:
            prec = prec[..., cls_idx, :]
        return float(np.mean(prec[..., max_det_idx]))

    @staticmethod
    def _select_ar(stats, iou_idx=None, cls_idx=None, max_det_idx: int = -1) -> float:
        rec = stats["recall"]
        if iou_idx is not None:
            rec = rec[iou_idx]
        if cls_idx is not None:
            rec = rec[..., cls_idx, :]
        rec = rec[..., max_det_idx]
        rec = rec[rec > -1]
        return float(np.mean(rec)) if rec.size else -1.0

    def _compute_ap(self, stats) -> dict[str, float]:
        results = {}
        if self.iou_range:
            key = (f"mAP_IoU_{self.iou_range[0]:.2f}_{self.iou_range[1]:.2f}_"
                   f"{self.iou_range[2]:.2f}_MaxDet_{self.max_detections[-1]}")
            results[key] = self._select_ap(stats, iou_idx=self.iou_range_idx, max_det_idx=-1)
            if self.per_class:
                for cls_idx, cls_str in enumerate(self.classes):
                    results[f"{cls_str}_" + key] = self._select_ap(
                        stats, iou_idx=self.iou_range_idx, cls_idx=cls_idx, max_det_idx=-1)
        for idx in self.iou_list_idx:
            key = f"AP_IoU_{self.iou_thresholds[idx]:.2f}_MaxDet_{self.max_detections[-1]}"
            results[key] = self._select_ap(stats, iou_idx=[idx], max_det_idx=-1)
            if self.per_class:
                for cls_idx, cls_str in enumerate(self.classes):
                    results[f"{cls_str}_" + key] = self._select_ap(
                        stats, iou_idx=[idx], cls_idx=cls_idx, max_det_idx=-1)
        return results

    def _compute_ar(self, stats) -> dict[str, float]:
        results = {}
        for max_det_idx, max_det in enumerate(self.max_detections):
            key = (f"mAR_IoU_{self.iou_range[0]:.2f}_{self.iou_range[1]:.2f}_"
                   f"{self.iou_range[2]:.2f}_MaxDet_{max_det}")
            # the reference averages mAR over ALL iou thresholds (union of list+range),
            # not just the range — match it (reference: coco.py _compute_ar)
            results[key] = self._select_ar(stats, max_det_idx=max_det_idx)
            if self.per_class:
                for cls_idx, cls_str in enumerate(self.classes):
                    results[f"{cls_str}_" + key] = self._select_ar(
                        stats, cls_idx=cls_idx, max_det_idx=max_det_idx)
        for idx in self.iou_list_idx:
            key = f"AR_IoU_{self.iou_thresholds[idx]:.2f}_MaxDet_{self.max_detections[-1]}"
            results[key] = self._select_ar(stats, iou_idx=[idx], max_det_idx=-1)
            if self.per_class:
                for cls_idx, cls_str in enumerate(self.classes):
                    results[f"{cls_str}_" + key] = self._select_ar(
                        stats, iou_idx=[idx], cls_idx=cls_idx, max_det_idx=-1)
        return results
