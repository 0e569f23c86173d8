"""Greedy COCO-style box matching (reference:
monai/apps/detection/metrics/matching.py:74 matching_batch; adapted from pycocotools).

Host-side numpy: matching is inherently sequential/greedy per image-class pair and
runs once per validation epoch.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

__all__ = ["matching_batch"]


def matching_batch(iou_fn: Callable, iou_thresholds: Sequence[float],
                   pred_boxes: Sequence[np.ndarray], pred_classes: Sequence[np.ndarray],
                   pred_scores: Sequence[np.ndarray], gt_boxes: Sequence[np.ndarray],
                   gt_classes: Sequence[np.ndarray], gt_ignore=None,
                   max_detections: int = 100) -> list[dict]:
    """Match predictions to ground truth per image and class (reference: matching.py:74)."""
    results = []
    if gt_ignore is None:
        gt_ignore = [np.full(gc.shape, False) for gc in gt_classes]
    for pboxes, pclasses, pscores, gboxes, gclasses, gignore in zip(
            pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes, gt_ignore):
        pboxes = np.asarray(pboxes)
        pclasses = np.asarray(pclasses)
        pscores = np.asarray(pscores)
        gboxes = np.asarray(gboxes)
        gclasses = np.asarray(gclasses)
        gignore = np.asarray(gignore)
        result = {}
        for c in np.union1d(pclasses, gclasses):
            pm = pclasses == c
            gm = gclasses == c
            if not gm.any():
                result[int(c)] = _match_no_gt(iou_thresholds, pscores[pm], max_detections)
            elif not pm.any():
                result[int(c)] = _match_no_pred(iou_thresholds, gignore[gm])
            else:
                result[int(c)] = _match_single(iou_fn, pboxes[pm], pscores[pm],
                                               gboxes[gm], gignore[gm], max_detections,
                                               iou_thresholds)
        results.append(result)
    return results


def _match_no_gt(iou_thresholds, pred_scores, max_detections):
    """All predictions are false positives (reference: matching.py:188)."""
    dt_ind = np.argsort(-pred_scores, kind="mergesort")[:max_detections]
    scores = pred_scores[dt_ind]
    n_t, n_d = len(iou_thresholds), len(scores)
    return {
        "dtMatches": np.zeros((n_t, n_d)),
        "gtMatches": np.zeros((n_t, 0)),
        "dtScores": scores,
        "gtIgnore": np.zeros(0).reshape(-1),
        "dtIgnore": np.zeros((n_t, n_d)),
    }


def _match_no_pred(iou_thresholds, gt_ignore):
    """All ground truths are unmatched (reference: matching.py:232)."""
    n_t = len(iou_thresholds)
    n_g = len(gt_ignore)
    return {
        "dtMatches": np.zeros((n_t, 0)),
        "gtMatches": np.zeros((n_t, n_g)),
        "dtScores": np.zeros(0),
        "gtIgnore": np.asarray(gt_ignore).reshape(-1),
        "dtIgnore": np.zeros((n_t, 0)),
    }


def _match_single(iou_fn, pred_boxes, pred_scores, gt_boxes, gt_ignore, max_detections,
                  iou_thresholds):
    """Greedy highest-score-first matching per threshold (reference: matching.py:272)."""
    dt_ind = np.argsort(-pred_scores, kind="mergesort")[:max_detections]
    pred_boxes = pred_boxes[dt_ind]
    pred_scores = pred_scores[dt_ind]
    gt_ind = np.argsort(gt_ignore, kind="mergesort")
    gt_boxes = gt_boxes[gt_ind]
    gt_ignore = np.asarray(gt_ignore)[gt_ind]
    ious = np.asarray(iou_fn(pred_boxes, gt_boxes))
    num_preds, num_gts = ious.shape
    gt_match = np.zeros((len(iou_thresholds), num_gts))
    dt_match = np.zeros((len(iou_thresholds), num_preds))
    dt_ignore = np.zeros((len(iou_thresholds), num_preds))
    for tind, t in enumerate(iou_thresholds):
        for dind in range(num_preds):
            best_iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(num_gts):
                if gt_match[tind, gind] > 0:
                    continue
                if m > -1 and gt_ignore[m] == 0 and gt_ignore[gind] == 1:
                    break  # matched a real gt already; remaining are ignores
                if ious[dind, gind] < best_iou:
                    continue
                best_iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ignore[tind, dind] = int(gt_ignore[m])
            dt_match[tind, dind] = 1
            gt_match[tind, m] = 1
    return {
        "dtMatches": dt_match,
        "gtMatches": gt_match,
        "dtScores": pred_scores,
        "gtIgnore": gt_ignore.reshape(-1),
        "dtIgnore": dt_ignore,
    }
