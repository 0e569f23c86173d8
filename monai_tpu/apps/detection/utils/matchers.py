"""Anchor-gt matching (reference: monai/apps/detection/utils/ATSS_matcher.py)."""
from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from ....data.box_utils import box_iou, boxes_center_distance, centers_in_boxes

__all__ = ["Matcher", "ATSSMatcher"]


class Matcher(ABC):
    """Assign each anchor a gt index / background / ignore (reference: ATSS_matcher.py Matcher)."""

    BELOW_LOW_THRESHOLD: int = -1
    BETWEEN_THRESHOLDS: int = -2

    def __init__(self, similarity_fn=box_iou):
        self.similarity_fn = similarity_fn

    def __call__(self, boxes: np.ndarray, anchors: np.ndarray, num_anchors_per_level=None,
                 num_anchors_per_loc: int = 1):
        if boxes.shape[0] == 0:
            return (np.asarray([]).reshape(0, anchors.shape[0]),
                    np.full((anchors.shape[0],), self.BELOW_LOW_THRESHOLD, dtype=np.int64))
        return self.compute_matches(boxes, anchors, num_anchors_per_level, num_anchors_per_loc)

    @abstractmethod
    def compute_matches(self, boxes, anchors, num_anchors_per_level, num_anchors_per_loc):
        raise NotImplementedError


class ATSSMatcher(Matcher):
    """Adaptive training sample selection (reference: ATSS_matcher.py ATSSMatcher)."""

    def __init__(self, num_candidates: int = 4, similarity_fn=box_iou, center_in_gt: bool = True,
                 debug: bool = False):
        super().__init__(similarity_fn)
        self.num_candidates = num_candidates
        self.center_in_gt = center_in_gt

    def compute_matches(self, boxes: np.ndarray, anchors: np.ndarray, num_anchors_per_level,
                        num_anchors_per_loc: int = 1):
        num_gt = boxes.shape[0]
        num_anchors = anchors.shape[0]
        distances, _, anchors_center = boxes_center_distance(boxes, anchors)
        distances = np.asarray(distances)

        # select topk closest anchors per level
        candidate_idx_list = []
        start_idx = 0
        levels = num_anchors_per_level or [num_anchors]
        for apl in levels:
            end_idx = start_idx + apl
            topk = min(self.num_candidates * num_anchors_per_loc, apl)
            d_lvl = distances[:, start_idx:end_idx]
            idx_lvl = np.argsort(d_lvl, axis=1)[:, :topk] + start_idx
            candidate_idx_list.append(idx_lvl)
            start_idx = end_idx
        candidate_idx = np.concatenate(candidate_idx_list, axis=1)  # (num_gt, K)

        match_quality = np.asarray(self.similarity_fn(boxes, anchors))  # (num_gt, A)
        candidate_ious = np.take_along_axis(match_quality, candidate_idx, axis=1)
        if candidate_idx.shape[1] <= 1:
            # corner case: a single candidate makes the std undefined (ATSS_matcher.py:250)
            matches = np.full((num_anchors,), self.BELOW_LOW_THRESHOLD, dtype=np.int64)
            matches[candidate_idx.reshape(-1)] = 0
            return match_quality, matches
        iou_mean = candidate_ious.mean(axis=1, keepdims=True)
        iou_std = candidate_ious.std(axis=1, keepdims=True, ddof=1)  # unbiased, as torch.std
        iou_thresh = iou_mean + iou_std
        is_pos = candidate_ious >= iou_thresh

        if self.center_in_gt:
            cand_centers = np.asarray(anchors_center)[candidate_idx.reshape(-1)]
            boxes_rep = np.repeat(boxes, candidate_idx.shape[1], axis=0)
            inside = np.asarray(centers_in_boxes(cand_centers, boxes_rep)).reshape(num_gt, -1)
            is_pos = is_pos & inside

        matched_vals = np.full((num_anchors,), -np.inf, dtype=np.float64)
        matches = np.full((num_anchors,), self.BELOW_LOW_THRESHOLD, dtype=np.int64)
        for g in range(num_gt):
            pos_anchors = candidate_idx[g][is_pos[g]]
            for a in pos_anchors:
                if match_quality[g, a] > matched_vals[a]:
                    matched_vals[a] = match_quality[g, a]
                    matches[a] = g
        return match_quality, matches
