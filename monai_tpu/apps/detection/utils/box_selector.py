"""Box post-selection: score threshold + top-k + NMS
(reference: monai/apps/detection/utils/box_selector.py:51 BoxSelector).

Host-side numpy: runs once per image at inference postprocessing time.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

from ....data.box_utils import box_iou, clip_boxes_to_image, non_max_suppression
from ....utils.backend import to_numpy

__all__ = ["BoxSelector"]


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class BoxSelector:
    """(reference: box_selector.py:51)."""

    def __init__(self, box_overlap_metric: Callable = box_iou, apply_sigmoid: bool = True,
                 score_thresh: float = 0.05, topk_candidates_per_level: int = 1000,
                 nms_thresh: float = 0.5, detections_per_img: int = 300):
        self.box_overlap_metric = box_overlap_metric
        self.apply_sigmoid = apply_sigmoid
        self.score_thresh = score_thresh
        self.topk_candidates_per_level = topk_candidates_per_level
        self.nms_thresh = nms_thresh
        self.detections_per_img = detections_per_img

    def select_top_score_idx_per_level(self, logits: np.ndarray):
        """Score threshold + per-level top-k (reference: box_selector.py:105)."""
        logits = to_numpy(logits)
        num_classes = logits.shape[-1]
        scores = _sigmoid(logits.astype(np.float32)).ravel() if self.apply_sigmoid \
            else logits.ravel()
        keep = np.where(scores > self.score_thresh)[0]
        kept_scores = scores[keep]
        num_topk = min(self.topk_candidates_per_level, len(keep))
        order = np.argsort(-kept_scores, kind="mergesort")[:num_topk]
        flat = keep[order]
        selected_scores = kept_scores[order]
        selected_labels = flat % num_classes
        topk_idxs = flat // num_classes
        return topk_idxs, selected_scores, selected_labels

    def select_boxes_per_image(self, boxes_list: Sequence, logits_list: Sequence,
                               spatial_size):
        """Per-level selection + image-level NMS (reference: box_selector.py:150)."""
        if len(boxes_list) != len(logits_list):
            raise ValueError("boxes_list and logits_list must have the same length.")
        image_boxes, image_scores, image_labels = [], [], []
        for boxes, logits in zip(boxes_list, logits_list):
            boxes = to_numpy(boxes)
            topk_idxs, scores, labels = self.select_top_score_idx_per_level(logits)
            boxes = boxes[topk_idxs]
            boxes, keep = clip_boxes_to_image(boxes, spatial_size, remove_empty=True)
            keep = to_numpy(keep)
            image_boxes.append(to_numpy(boxes))
            image_scores.append(scores[keep])
            image_labels.append(labels[keep])
        boxes = np.concatenate(image_boxes) if image_boxes else np.zeros((0, 0))
        scores = np.concatenate(image_scores) if image_scores else np.zeros((0,))
        labels = np.concatenate(image_labels) if image_labels else np.zeros((0,), np.int64)
        # class-aware NMS: run per label
        keep_all = []
        for c in np.unique(labels):
            idx = np.where(labels == c)[0]
            keep = to_numpy(non_max_suppression(boxes[idx], scores[idx], self.nms_thresh,
                                                box_overlap_metric=self.box_overlap_metric))
            keep_all.extend(idx[np.asarray(keep, dtype=np.int64)].tolist())
        keep_all = np.asarray(sorted(keep_all, key=lambda i: -scores[i])[:self.detections_per_img],
                              dtype=np.int64)
        return boxes[keep_all], scores[keep_all], labels[keep_all]
