"""DeepGrow click-guidance transforms (reference: monai/apps/deepgrow/transforms.py
AddInitialSeedPointd, AddGuidanceSignald, FindDiscrepancyRegionsd, AddRandomGuidanced,
FindAllValidSlicesd)."""
from __future__ import annotations

import json
from typing import Any

import numpy as np

from ...data.meta_image import MetaImage
from ...transforms.transform import MapTransform, Randomizable, Transform
from ...utils.backend import to_numpy

__all__ = ["FindAllValidSlicesd", "AddInitialSeedPointd", "AddGuidanceSignald",
           "FindDiscrepancyRegionsd", "AddRandomGuidanced"]


def _arr(x):
    return to_numpy(x.data if isinstance(x, MetaImage) else x)


class FindAllValidSlicesd(MapTransform):
    """Record slices containing foreground (reference: deepgrow/transforms.py)."""

    def __init__(self, label: str = "label", sids: str = "sids"):
        super().__init__(keys=label)
        self.label = label
        self.sids = sids

    def __call__(self, data):
        d = dict(data)
        label = _arr(d[self.label])
        if label.shape[0] != 1:
            raise ValueError(f"Only supports single channel labels, got {label.shape}.")
        sids = [sid for sid in range(label.shape[-1]) if np.sum(label[..., sid]) != 0] \
            if label.ndim == 4 else []
        d[self.sids] = np.asarray(sids)
        return d


class AddInitialSeedPointd(Randomizable, MapTransform):
    """Sample an initial positive click from the label (reference: deepgrow/transforms.py)."""

    def __init__(self, label: str = "label", guidance: str = "guidance", sids: str = "sids",
                 sid: str = "sid", connected_regions: int = 5):
        super().__init__(keys=label)
        self.label = label
        self.sids_key = sids
        self.sid_key = sid
        self.guidance = guidance
        self.connected_regions = connected_regions
        self.sid = None

    def randomize(self, data):
        sids = data.get(self.sids_key)
        self.sid = None
        if sids is not None and len(sids):
            self.sid = sids[self.R.randint(len(sids))]

    def _seed_point(self, label: np.ndarray) -> list:
        from scipy import ndimage as ndi

        pos_guidance = []
        labeled, num = ndi.label(label[0] > 0.5)
        for ridx in range(1, min(num, self.connected_regions) + 1):
            region = (labeled == ridx).astype(np.float32)
            if region.sum() == 0:
                continue
            dist = ndi.distance_transform_edt(region).flatten()
            probability = np.exp(dist) - 1.0
            idx = np.where(region.flatten() > 0)[0]
            probability = probability[idx]
            seed = idx[self.R.choice(len(idx), p=probability / probability.sum())]
            g = np.asarray(np.unravel_index(seed, region.shape)).tolist()
            pos_guidance.append([0] + g if label.ndim < 4 else g)
        return pos_guidance

    def __call__(self, data):
        d = dict(data)
        self.randomize(d)
        label = _arr(d[self.label])
        if self.sid is not None and label.ndim == 4:
            label2d = label[..., int(self.sid)]
            pos = self._seed_point(label2d)
            pos = [[p[0], p[1], int(self.sid)] if len(p) == 2 else p + [int(self.sid)] for p in pos]
        else:
            pos = self._seed_point(label)
        d[self.guidance] = json.dumps([pos, []])  # [positives, negatives]
        return d


class AddGuidanceSignald(MapTransform):
    """Convert click coordinates into gaussian guidance channels
    (reference: deepgrow/transforms.py AddGuidanceSignald)."""

    def __init__(self, image: str = "image", guidance: str = "guidance", sigma: int = 2,
                 number_intensity_ch: int = 1):
        super().__init__(keys=image)
        self.image = image
        self.guidance = guidance
        self.sigma = sigma
        self.number_intensity_ch = number_intensity_ch

    def _signal(self, shape, points) -> np.ndarray:
        from ...ops.gaussian import gaussian_filter

        signal = np.zeros(shape, dtype=np.float32)
        for p in points:
            coords = tuple(int(c) for c in p[-len(shape):])
            if all(0 <= c < s for c, s in zip(coords, shape)):
                signal[coords] = 1.0
        if signal.max() > 0:
            signal = np.asarray(gaussian_filter(signal[None], self.sigma))[0]
            mx = signal.max()
            if mx > 0:
                signal = signal / mx
        return signal

    def __call__(self, data):
        d = dict(data)
        image = _arr(d[self.image])
        guidance = d[self.guidance]
        if isinstance(guidance, str):
            guidance = json.loads(guidance)
        pos, neg = guidance[0], guidance[1]
        spatial = image.shape[1:]
        pos_sig = self._signal(spatial, pos)
        neg_sig = self._signal(spatial, neg)
        img_ch = image[: self.number_intensity_ch]
        out = np.concatenate([img_ch, pos_sig[None], neg_sig[None]], axis=0)
        if isinstance(d[self.image], MetaImage):
            d[self.image] = d[self.image].new_like(out)
        else:
            d[self.image] = out
        return d


class FindDiscrepancyRegionsd(MapTransform):
    """FN/FP regions between label and prediction (reference: deepgrow/transforms.py)."""

    def __init__(self, label: str = "label", pred: str = "pred", discrepancy: str = "discrepancy"):
        super().__init__(keys=label)
        self.label = label
        self.pred = pred
        self.discrepancy = discrepancy

    def __call__(self, data):
        d = dict(data)
        label = _arr(d[self.label])
        pred = _arr(d[self.pred])
        disc_fn = np.logical_and(label > 0.5, pred <= 0.5).astype(np.float32)
        disc_fp = np.logical_and(label <= 0.5, pred > 0.5).astype(np.float32)
        d[self.discrepancy] = [disc_fn, disc_fp]
        return d


class AddRandomGuidanced(Randomizable, MapTransform):
    """Add a corrective click in the discrepancy region (reference: deepgrow/transforms.py)."""

    def __init__(self, guidance: str = "guidance", discrepancy: str = "discrepancy",
                 probability: str = "probability"):
        super().__init__(keys=guidance, allow_missing_keys=True)
        self.guidance = guidance
        self.discrepancy = discrepancy
        self.probability = probability
        self._will_interact = True

    def randomize(self, data):
        probability = data.get(self.probability, 1.0)
        self._will_interact = self.R.choice([True, False], p=[probability, 1.0 - probability])

    def _find_click(self, discrepancy: np.ndarray):
        from scipy import ndimage as ndi

        region = discrepancy[0] if discrepancy.ndim == 4 else discrepancy
        if region.sum() == 0:
            return None
        dist = ndi.distance_transform_edt(region > 0.5).flatten()
        idx = np.where(region.flatten() > 0.5)[0]
        probability = np.exp(dist[idx]) - 1.0
        if probability.sum() == 0:
            return None
        seed = idx[self.R.choice(len(idx), p=probability / probability.sum())]
        return np.asarray(np.unravel_index(seed, region.shape)).tolist()

    def __call__(self, data):
        d = dict(data)
        self.randomize(d)
        guidance = d.get(self.guidance, "[[], []]")
        if isinstance(guidance, str):
            guidance = json.loads(guidance)
        if self._will_interact:
            disc_fn, disc_fp = d[self.discrepancy]
            if np.sum(disc_fn) > np.sum(disc_fp):
                click = self._find_click(disc_fn)
                if click is not None:
                    guidance[0].append(click)
            else:
                click = self._find_click(disc_fp)
                if click is not None:
                    guidance[1].append(click)
        d[self.guidance] = json.dumps(guidance)
        return d
