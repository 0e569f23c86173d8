"""Pathology metrics: FROC (reference: monai/apps/pathology/metrics/lesion_froc.py and
monai/metrics/froc.py compute_fp_tp_probs/compute_froc_curve_data/compute_froc_score)."""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ...utils.backend import to_numpy

__all__ = ["compute_fp_tp_probs", "compute_froc_curve_data", "compute_froc_score", "LesionFROC"]


def compute_fp_tp_probs(probs, y_coord, x_coord, evaluation_mask, labels_to_exclude=None,
                        resolution_level: int = 0):
    """Classify detections into FP/TP against the lesion mask (reference: froc.py)."""
    probs = to_numpy(probs)
    y_coord = to_numpy(y_coord).astype(np.int64)
    x_coord = to_numpy(x_coord).astype(np.int64)
    evaluation_mask = to_numpy(evaluation_mask)
    labels_to_exclude = labels_to_exclude or []
    max_label = int(evaluation_mask.max())
    tp_probs = np.zeros((max_label,), dtype=np.float32)
    factor = 2**resolution_level
    hit_labels = evaluation_mask[(y_coord // factor, x_coord // factor)]
    fp_mask = hit_labels == 0
    fp_probs = probs[fp_mask]
    for i, label in enumerate(hit_labels):
        if label > 0 and label not in labels_to_exclude:
            tp_probs[label - 1] = max(tp_probs[label - 1], probs[i])
    num_targets = max_label - len(labels_to_exclude)
    return fp_probs, tp_probs, num_targets


def compute_froc_curve_data(fp_probs, tp_probs, num_targets: int, num_images: int):
    """FROC curve points (reference: froc.py compute_froc_curve_data)."""
    fp_probs = to_numpy(fp_probs)
    tp_probs = to_numpy(tp_probs)
    all_probs = sorted(set(list(fp_probs) + list(tp_probs)), reverse=True)
    total_fps, total_tps = [], []
    for thresh in all_probs:
        total_fps.append((fp_probs >= thresh).sum())
        total_tps.append((tp_probs >= thresh).sum())
    fps_per_image = np.asarray(total_fps) / max(num_images, 1)
    total_sensitivity = np.asarray(total_tps) / max(num_targets, 1)
    return fps_per_image, total_sensitivity


def compute_froc_score(fps_per_image: np.ndarray, total_sensitivity: np.ndarray,
                       eval_thresholds: Sequence[float] = (0.25, 0.5, 1, 2, 4, 8)) -> float:
    """Mean sensitivity at given FP rates (reference: froc.py compute_froc_score)."""
    if len(fps_per_image) == 0:
        return 0.0
    interp_sens = np.interp(eval_thresholds, fps_per_image[::-1], total_sensitivity[::-1])
    return float(np.mean(interp_sens))


class LesionFROC:
    """WSI tumor-detection FROC evaluation (reference: lesion_froc.py).

    ``data``: list of dicts with keys prob_map (array or .npy path), ground-truth mask
    (array), level, pixel spacing info.
    """

    def __init__(self, data: list[dict], grow_distance: int = 75, itc_diameter: int = 200,
                 eval_thresholds: Sequence[float] = (0.25, 0.5, 1, 2, 4, 8), nms_sigma: float = 0.0,
                 nms_prob_threshold: float = 0.5, nms_box_size: int = 48, image_reader_name=None):
        self.data = data
        self.grow_distance = grow_distance
        self.itc_diameter = itc_diameter
        self.eval_thresholds = eval_thresholds
        from ...transforms.post_array import ProbNMS

        self.nms = ProbNMS(sigma=nms_sigma, prob_threshold=nms_prob_threshold, box_size=nms_box_size)

    def prepare_inference_result(self, sample: dict):
        prob_map = sample["prob_map"]
        if isinstance(prob_map, str):
            prob_map = np.load(prob_map)
        nms_outputs = self.nms(prob_map)
        if nms_outputs:
            probs, x, y = zip(*[(o[0], o[1], o[2]) for o in nms_outputs])
        else:
            probs, x, y = [], [], []
        return np.asarray(probs), np.asarray(x), np.asarray(y)

    def compute_fp_tp(self):
        total_fp_probs, total_tp_probs = [], []
        total_num_targets = 0
        num_images = len(self.data)
        for sample in self.data:
            probs, y_coord, x_coord = self.prepare_inference_result(sample)
            ground_truth = np.asarray(sample["tumor_mask"])
            from scipy import ndimage as ndi

            labeled, _ = ndi.label(ground_truth > 0)
            fp_probs, tp_probs, num_targets = compute_fp_tp_probs(
                probs, y_coord, x_coord, labeled, resolution_level=sample.get("level", 0))
            total_fp_probs.extend(fp_probs)
            total_tp_probs.extend(tp_probs)
            total_num_targets += num_targets
        return (np.asarray(total_fp_probs), np.asarray(total_tp_probs), total_num_targets,
                num_images)

    def evaluate(self) -> float:
        fp_probs, tp_probs, num_targets, num_images = self.compute_fp_tp()
        fps_per_image, total_sensitivity = compute_froc_curve_data(fp_probs, tp_probs,
                                                                   num_targets, num_images)
        return compute_froc_score(fps_per_image, total_sensitivity, self.eval_thresholds)


def compute_fp_tp_probs_nd(probs, coords, evaluation_mask, labels_to_exclude=None):
    """n-D variant of compute_fp_tp_probs: ``coords`` is (n, n_dim) in mask order
    (reference: metrics/froc.py:22 compute_fp_tp_probs_nd)."""
    probs = to_numpy(probs)
    coords = to_numpy(coords).astype(np.int64)
    evaluation_mask = to_numpy(evaluation_mask)
    if len(probs) != len(coords):
        raise ValueError(f"len(probs) {len(probs)} != len(coords) {len(coords)}.")
    if coords.ndim < 2 or coords.shape[1] != evaluation_mask.ndim:
        raise ValueError(f"coords {coords.shape} must match mask rank {evaluation_mask.ndim}.")
    labels_to_exclude = labels_to_exclude or []
    max_label = int(evaluation_mask.max())
    tp_probs = np.zeros((max_label,), dtype=np.float32)
    hit_labels = evaluation_mask[tuple(coords.T)]
    fp_probs = probs[hit_labels == 0]
    for i in range(1, max_label + 1):
        if i not in labels_to_exclude and i in hit_labels:
            tp_probs[i - 1] = probs[hit_labels == i].max()
    num_targets = max_label - len(labels_to_exclude)
    return fp_probs, tp_probs, num_targets
