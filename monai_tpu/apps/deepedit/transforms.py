"""DeepEdit multi-label click-simulation transforms
(reference: monai/apps/deepedit/transforms.py:36-873).

Host-side numpy/scipy: guidance points are sampled from chamfer-distance-weighted
label/discrepancy maps; guidance channels are rasterized and gaussian-smoothed.
"""
from __future__ import annotations

import json
import logging
import random
import warnings
from typing import Hashable, Mapping, Sequence

import numpy as np

from ...data.meta_image import MetaImage
from ...transforms.transform import MapTransform, Randomizable, Transform
from ...utils.backend import to_numpy

logger = logging.getLogger(__name__)

__all__ = ["DiscardAddGuidanced", "NormalizeLabelsInDatasetd", "SingleLabelSelectiond",
           "AddGuidanceSignalDeepEditd", "FindAllValidSlicesDeepEditd",
           "AddInitialSeedPointDeepEditd", "FindDiscrepancyRegionsDeepEditd",
           "AddRandomGuidanceDeepEditd", "AddGuidanceFromPointsDeepEditd",
           "ResizeGuidanceMultipleLabelDeepEditd", "SplitPredsLabeld",
           "AddInitialSeedPointMissingLabelsd", "FindAllValidSlicesMissingLabelsd"]


def _unwrap(x):
    return to_numpy(x.data if isinstance(x, MetaImage) else x)


def _rewrap(d, key, arr):
    if isinstance(d[key], MetaImage):
        d[key] = d[key].new_like(arr)
    else:
        d[key] = arr


def _distance_seed(rand_state, mask: np.ndarray):
    """Sample a point inside mask, weighted by exp(chamfer distance) - 1
    (reference: deepedit/transforms.py:368 find_guidance)."""
    from scipy.ndimage import distance_transform_cdt

    distance = distance_transform_cdt(mask).flatten()
    probability = np.exp(distance) - 1.0
    idx = np.where(mask.flatten() > 0)[0]
    if len(idx) == 0 or probability[idx].sum() <= 0:
        return None
    seed = rand_state.choice(idx, size=1, p=probability[idx] / probability[idx].sum())
    g = np.asarray(np.unravel_index(seed, mask.shape)).T.tolist()[0]
    g[0] = int(distance[seed][0])
    return g


class DiscardAddGuidanced(MapTransform):
    """Zero/append the guidance channels with a given probability
    (reference: deepedit/transforms.py:36)."""

    def __init__(self, keys, number_intensity_ch: int = 1, probability: float = 1.0,
                 label_names=None, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.number_intensity_ch = number_intensity_ch
        self.discard_probability = probability
        self.label_names = label_names or []

    def _apply(self, image: np.ndarray) -> np.ndarray:
        if self.discard_probability >= 1.0 or np.random.choice(
                [True, False], p=[self.discard_probability, 1 - self.discard_probability]):
            signal = np.zeros((len(self.label_names),) + image.shape[1:], dtype=np.float32)
            if image.shape[0] == self.number_intensity_ch + len(self.label_names):
                image = image.copy()
                image[self.number_intensity_ch:, ...] = signal
            else:
                image = np.concatenate([image, signal], axis=0)
        return image

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "image":
                _rewrap(d, key, self._apply(_unwrap(d[key])))
            else:
                warnings.warn("DiscardAddGuidanced only applies to the image key.")
        return d


class NormalizeLabelsInDatasetd(MapTransform):
    """Renumber label values 1..N following label_names (reference: deepedit/transforms.py:87)."""

    def __init__(self, keys, label_names: dict | None = None, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.label_names = label_names or {}

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            new_label_names = {}
            src = _unwrap(d[key])
            label = np.zeros(src.shape)
            for idx, (key_label, val_label) in enumerate(self.label_names.items(), start=1):
                if key_label != "background":
                    new_label_names[key_label] = idx
                    label[src == val_label] = idx
                else:
                    new_label_names["background"] = 0
            d["label_names"] = new_label_names
            _rewrap(d, key, label)
        return d


class SingleLabelSelectiond(MapTransform):
    """Keep one randomly chosen organ label (reference: deepedit/transforms.py:125)."""

    all_label_values = {
        "spleen": 1, "right kidney": 2, "left kidney": 3, "gallbladder": 4, "esophagus": 5,
        "liver": 6, "stomach": 7, "aorta": 8, "inferior vena cava": 9, "portal_vein": 10,
        "splenic_vein": 11, "pancreas": 12, "right adrenal gland": 13,
        "left adrenal gland": 14,
    }

    def __init__(self, keys, label_names: Sequence[str] | None = None,
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.label_names = list(label_names or [])

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "label":
                t_label = np.random.choice(self.label_names)
                d["current_label"] = t_label
                label = _unwrap(d[key]).copy()
                label[label != self.all_label_values[t_label]] = 0.0
                label[label > 0] = self.label_names.index(t_label) + 1
                _rewrap(d, key, label)
            else:
                warnings.warn("SingleLabelSelectiond only applies to the label key.")
        return d


class AddGuidanceSignalDeepEditd(MapTransform):
    """Rasterize per-label clicks into gaussian channels appended to the image
    (reference: deepedit/transforms.py:174)."""

    def __init__(self, keys, guidance: str = "guidance", sigma: int = 3,
                 number_intensity_ch: int = 1, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.guidance = guidance
        self.sigma = sigma
        self.number_intensity_ch = number_intensity_ch

    def _get_signal(self, image: np.ndarray, guidance) -> np.ndarray:
        dims = 3 if image.ndim > 3 else 2
        if isinstance(guidance, np.ndarray):
            guidance = guidance.tolist()
        if isinstance(guidance, str):
            guidance = json.loads(guidance)
        signal = np.zeros((1,) + image.shape[-dims:], dtype=np.float32)
        if not len(guidance):
            return signal
        for point in guidance:
            if np.any(np.asarray(point) < 0):
                continue
            coords = tuple(max(0, min(int(point[-dims + i]), signal.shape[1 + i] - 1))
                           for i in range(dims))
            signal[(0,) + coords] = 1.0
        if signal[0].max() > 0:
            import jax.numpy as jnp

            from ...ops.gaussian import gaussian_filter

            sm = np.asarray(gaussian_filter(jnp.asarray(signal), sigma=float(self.sigma)))
            rng = sm[0].max() - sm[0].min()
            signal[0] = (sm[0] - sm[0].min()) / (rng if rng > 0 else 1.0)
        return signal

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "image":
                image = _unwrap(d[key])
                tmp = image[:self.number_intensity_ch]
                for key_label in d[self.guidance]:
                    signal = self._get_signal(image, d[self.guidance][key_label])
                    tmp = np.concatenate([tmp, signal], axis=0)
                _rewrap(d, key, tmp)
                return d
            warnings.warn("AddGuidanceSignalDeepEditd only applies to the image key.")
        return d


class FindAllValidSlicesDeepEditd(MapTransform):
    """Per-label list of depth slices containing that label
    (reference: deepedit/transforms.py:265)."""

    def __init__(self, keys, sids: Hashable = "sids", allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.sids = sids

    def _apply(self, label: np.ndarray, d: dict) -> dict:
        sids = {}
        for key_label, val in d["label_names"].items():
            l_ids = [sid for sid in range(label.shape[-1]) if val in label[0][..., sid]]
            sids[key_label] = l_ids
        return sids

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "label":
                label = _unwrap(d[key])
                if label.shape[0] != 1:
                    raise ValueError("Only supports single channel labels!")
                if label.ndim != 4:
                    raise ValueError("Only supports label with shape CHWD!")
                d[self.sids] = self._apply(label, d)
                return d
            warnings.warn("FindAllValidSlicesDeepEditd only applies to the label key.")
        return d


class AddInitialSeedPointDeepEditd(Randomizable, MapTransform):
    """Initial distance-weighted seed click per label (reference: deepedit/transforms.py:308)."""

    def __init__(self, keys, guidance: str = "guidance", sids: str = "sids",
                 sid: str = "sid", connected_regions: int = 5,
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.sids_key = sids
        self.sid_key = sid
        self.sid: dict = {}
        self.guidance = guidance
        self.connected_regions = connected_regions

    def _apply(self, label: np.ndarray, sid, missing_ok: bool = False):
        from scipy import ndimage as ndi

        dimensions = 3 if label.ndim > 3 else 2
        default_guidance = [-1] * (dimensions + 1)
        dims = dimensions
        if sid is not None and dimensions == 3:
            dims = 2
            label = label[0][..., sid][np.newaxis]
        label = (label > 0.5).astype(np.float32)
        blobs = ndi.label(label.astype(int))[0] if dims == 2 else label
        pos_guidance = []
        if blobs.max() <= 0:
            if not missing_ok:
                raise AssertionError("SLICES NOT FOUND FOR LABEL")
            pos_guidance.append(default_guidance)
            return np.asarray([pos_guidance])
        for ridx in range(1, 2 if dims == 3 else self.connected_regions + 1):
            mask = (blobs == ridx).astype(np.float32) if dims == 2 else label
            if dims == 2 and mask.sum() == 0:
                pos_guidance.append(default_guidance)
                continue
            g = _distance_seed(self.R, mask)
            if g is None:
                pos_guidance.append(default_guidance)
                continue
            if dimensions == 2 or dims == 3:
                pos_guidance.append(g)
            else:
                pos_guidance.append([g[0], g[-2], g[-1], sid])
        return np.asarray([pos_guidance])

    def _randomize(self, d, key_label):
        sids = (d.get(self.sids_key) or {}).get(key_label)
        sid = (d.get(self.sid_key) or {}).get(key_label) if d.get(self.sid_key) else None
        if sids:
            if sid is None or sid not in sids:
                sid = self.R.choice(sids, replace=False)
        else:
            sid = None
        self.sid[key_label] = sid

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "label":
                guidances = {}
                for key_label in d["sids"]:
                    self._randomize(d, key_label)
                    tmp = _unwrap(d[key]).copy()
                    if key_label != "background":
                        tmp[tmp != float(d["label_names"][key_label])] = 0
                    else:
                        tmp[tmp != float(d["label_names"][key_label])] = 1
                        tmp = 1 - tmp
                    guidances[key_label] = json.dumps(
                        self._apply(tmp, self.sid.get(key_label)).astype(int).tolist())
                d[self.guidance] = guidances
                return d
            warnings.warn("AddInitialSeedPointDeepEditd only applies to the label key.")
        return d


class FindDiscrepancyRegionsDeepEditd(MapTransform):
    """Per-label positive/negative disagreement maps between label and prediction
    (reference: deepedit/transforms.py:422)."""

    def __init__(self, keys, pred: str = "pred", discrepancy: str = "discrepancy",
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.pred = pred
        self.discrepancy = discrepancy

    @staticmethod
    def disparity(label, pred):
        disparity = label - pred
        return [(disparity > 0).astype(np.float32), (disparity < 0).astype(np.float32)]

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "label":
                all_disc = {}
                for key_label, val in d["label_names"].items():
                    label = _unwrap(d[key]).copy()
                    pred = _unwrap(d[self.pred]).copy()
                    if key_label != "background":
                        label[label != val] = 0
                        pred[pred != val] = 0
                    else:
                        label[label != val] = 1
                        label = 1 - label
                        pred[pred != val] = 1
                        pred = 1 - pred
                    all_disc[key_label] = self.disparity(
                        (label > 0.5).astype(np.float32), (pred > 0.5).astype(np.float32))
                d[self.discrepancy] = all_disc
                return d
            warnings.warn("FindDiscrepancyRegionsDeepEditd only applies to the label key.")
        return d


class AddRandomGuidanceDeepEditd(Randomizable, MapTransform):
    """Add corrective clicks on the discrepancy regions (reference: deepedit/transforms.py:492)."""

    def __init__(self, keys, guidance: str = "guidance", discrepancy: str = "discrepancy",
                 probability: str = "probability", allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.guidance_key = guidance
        self.discrepancy = discrepancy
        self.probability = probability
        self._will_interact = None
        self.guidance: dict = {}

    def randomize(self, data=None):
        probability = data[self.probability]
        self._will_interact = self.R.choice([True, False],
                                            p=[probability, 1.0 - probability])

    def find_guidance(self, discrepancy):
        if np.sum(discrepancy > 0) > 0:
            return _distance_seed(self.R, discrepancy)
        return None

    def add_guidance(self, guidance: list, discrepancy, label_names, labels):
        pos_discr = discrepancy[0]
        other_areas = {}
        for key_label, val in label_names.items():
            tmp = np.copy(labels)
            if key_label != "background":
                tmp[tmp != val] = 0
                tmp = (tmp > 0.5).astype(np.float32)
            else:
                tmp[tmp != val] = 1
                tmp = 1 - tmp
            other_areas[key_label] = np.sum(discrepancy[1] * tmp)
        if np.sum(pos_discr) > 0:
            g = self.find_guidance(pos_discr)
            if g is not None:
                guidance.append(g)
        for key_label, val in label_names.items():
            if other_areas[key_label] > 50:
                tmp = np.copy(labels)
                if key_label != "background":
                    tmp[tmp != val] = 0
                    tmp = (tmp > 0.5).astype(np.float32)
                else:
                    tmp[tmp != val] = 1
                    tmp = 1 - tmp
                g = self.find_guidance(discrepancy[1] * tmp)
                if g is not None:
                    self.guidance[key_label].append(g)

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        guidance = d[self.guidance_key]
        discrepancy = d[self.discrepancy]
        self.randomize(d)
        if self._will_interact:
            labels = _unwrap(d["label"])
            for key_label in d["label_names"]:
                tmp = guidance[key_label]
                tmp = tmp.tolist() if isinstance(tmp, np.ndarray) else tmp
                tmp = json.loads(tmp) if isinstance(tmp, str) else tmp
                self.guidance[key_label] = [j for j in tmp if -1 not in j]
            for key_label in d["label_names"]:
                self.add_guidance(self.guidance[key_label], discrepancy[key_label],
                                  d["label_names"], labels)
            num_clicks = random.randint(1, 10)
            counter = 0
            keep = []
            while True:
                aux = random.choice(list(d["label_names"].keys()))
                if aux not in keep:
                    keep.append(aux)
                    counter += len(self.guidance[aux])
                    if counter >= num_clicks:
                        for key_label in d["label_names"]:
                            if key_label not in keep:
                                self.guidance[key_label] = []
                        break
                if len(keep) == len(d["label_names"]):
                    break
        d[self.guidance_key] = self.guidance
        return d


class AddGuidanceFromPointsDeepEditd(Transform):
    """Scale user clicks from original to current image space
    (reference: deepedit/transforms.py:622)."""

    def __init__(self, ref_image: str, guidance: str = "guidance",
                 label_names: dict | None = None, meta_keys: str | None = None,
                 meta_key_postfix: str = "meta_dict"):
        self.ref_image = ref_image
        self.guidance = guidance
        self.label_names = label_names or {}
        self.meta_keys = meta_keys
        self.meta_key_postfix = meta_key_postfix

    def __call__(self, data):
        d = dict(data)
        ref = d[self.ref_image]
        if isinstance(ref, MetaImage):
            meta = ref.meta
        else:
            meta = d.get(self.meta_keys or f"{self.ref_image}_{self.meta_key_postfix}")
            if meta is None:
                raise ValueError("reference image metadata not found.")
        if "spatial_shape" not in meta:
            raise RuntimeError('Missing "spatial_shape" in meta dict!')
        original_shape = np.asarray(meta["spatial_shape"])
        current_shape = np.asarray(_unwrap(ref).shape[1:])
        factor = current_shape / original_shape
        all_g = {}
        for key_label in self.label_names:
            clicks = np.asarray(d.get(key_label, []), dtype=np.int64)
            all_g[key_label] = (np.multiply(clicks, factor).astype(int).tolist()
                                if len(clicks) else [])
        d[self.guidance] = all_g
        return d


class ResizeGuidanceMultipleLabelDeepEditd(Transform):
    """Rescale guidance to match a resized reference image
    (reference: deepedit/transforms.py:698)."""

    def __init__(self, guidance: str, ref_image: str):
        self.guidance = guidance
        self.ref_image = ref_image

    def __call__(self, data):
        d = dict(data)
        ref = d[self.ref_image]
        meta = ref.meta if isinstance(ref, MetaImage) else d.get("image_meta_dict")
        if meta is None:
            raise ValueError("reference image metadata not found.")
        current_shape = np.asarray(_unwrap(ref).shape[1:])
        factor = current_shape / np.asarray(meta["spatial_shape"])
        all_g = {}
        for key_label, g in d[self.guidance].items():
            all_g[key_label] = (np.multiply(g, factor).astype(int).tolist() if len(g) else [])
        d[self.guidance] = all_g
        return d


class SplitPredsLabeld(MapTransform):
    """Split per-label channels out of pred/label for individual metrics
    (reference: deepedit/transforms.py:740)."""

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "pred":
                for idx, (key_label, _) in enumerate(d["label_names"].items()):
                    if key_label != "background":
                        d[f"pred_{key_label}"] = _unwrap(d[key])[idx + 1][None]
                        d[f"label_{key_label}"] = _unwrap(d["label"])[idx + 1][None]
        return d


class AddInitialSeedPointMissingLabelsd(AddInitialSeedPointDeepEditd):
    """Like AddInitialSeedPointDeepEditd but tolerates labels absent from the volume
    (emits -1 padding guidance instead of raising; reference: deepedit/transforms.py:759)."""

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            if key == "label":
                guidances = {}
                for key_label in d["sids"]:
                    self._randomize(d, key_label)
                    tmp = _unwrap(d[key]).copy()
                    if key_label != "background":
                        tmp[tmp != float(d["label_names"][key_label])] = 0
                    else:
                        tmp[tmp != float(d["label_names"][key_label])] = 1
                        tmp = 1 - tmp
                    guidances[key_label] = json.dumps(
                        self._apply(tmp, self.sid.get(key_label),
                                    missing_ok=True).astype(int).tolist())
                d[self.guidance] = guidances
                return d
        return d


class FindAllValidSlicesMissingLabelsd(FindAllValidSlicesDeepEditd):
    """Like FindAllValidSlicesDeepEditd but emits an empty slice list for absent labels
    (reference: deepedit/transforms.py:873)."""

    def _apply(self, label: np.ndarray, d: dict) -> dict:
        sids = {}
        for key_label, val in d["label_names"].items():
            l_ids = [sid for sid in range(label.shape[-1]) if val in label[0][..., sid]]
            sids[key_label] = l_ids  # may be empty for missing labels
        return sids
