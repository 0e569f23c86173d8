"""VISTA3D pre/post transforms (reference: monai/apps/vista3d/transforms.py:57
VistaPreTransformd, :123 VistaPostTransformd, :177 Relabeld)."""
from __future__ import annotations

import warnings
from collections.abc import Sequence

import numpy as np

from ...data.meta_image import MetaImage
from ...transforms.transform import MapTransform
from ...transforms.utility_array import MapLabelValue
from ...utils.backend import to_numpy
from ...utils.module import look_up_option

__all__ = ["VistaPreTransformd", "VistaPostTransformd", "Relabeld"]


def _get_name_to_index_mapping(labels_dict: dict | None) -> dict:
    """(reference: vista3d/transforms.py:29)."""
    if labels_dict is None:
        return {}
    return {v.lower(): int(k) for k, v in labels_dict.items()}


def _convert_name_to_index(name_to_index_mapping: dict, label_prompt):
    """(reference: vista3d/transforms.py:37)."""
    if label_prompt is None:
        return None
    out = []
    for lp in label_prompt:
        if isinstance(lp, str):
            key = lp.lower()
            if key not in name_to_index_mapping:
                raise ValueError(f"label name {lp} not found in labels_dict.")
            out.append(name_to_index_mapping[key])
        else:
            out.append(int(lp))
    return out


class VistaPreTransformd(MapTransform):
    """Map label names to indices, expand subclasses, and mark special-class points
    (reference: vista3d/transforms.py:57)."""

    def __init__(self, keys, allow_missing_keys: bool = False,
                 special_index: Sequence[int] = (25, 26, 27, 28, 29, 117),
                 labels_dict: dict | None = None, subclass: dict | None = None):
        super().__init__(keys, allow_missing_keys)
        self.special_index = special_index
        self.subclass = subclass
        self.name_to_index_mapping = _get_name_to_index_mapping(labels_dict)

    def __call__(self, data):
        label_prompt = data.get("label_prompt", None)
        point_labels = data.get("point_labels", None)
        label_prompt = _convert_name_to_index(self.name_to_index_mapping, label_prompt)
        try:
            if self.subclass is not None and label_prompt is not None:
                expanded = []
                subclass_keys = list(map(int, self.subclass.keys()))
                for lp in label_prompt:
                    if lp in subclass_keys:
                        expanded.extend(self.subclass[str(lp)])
                    else:
                        expanded.append(lp)
                data["label_prompt"] = expanded
            if label_prompt is not None and point_labels is not None:
                if label_prompt[0] in self.special_index:
                    pl = np.array(point_labels)
                    pl[pl == 0] = 2
                    pl[pl == 1] = 3
                    point_labels = pl.tolist()
                data["point_labels"] = point_labels
        except Exception:
            warnings.warn("VistaPreTransformd failed to transform label prompt or point labels.")
        return data


class VistaPostTransformd(MapTransform):
    """Convert per-prompt logits into a final labeled segmentation
    (reference: vista3d/transforms.py:123)."""

    def __init__(self, keys, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)

    def __call__(self, data):
        for key in self.keys:
            if key not in data:
                continue
            item = data[key]
            pred = to_numpy(item.data if isinstance(item, MetaImage) else item).copy()
            object_num = pred.shape[0]
            if data.get("label_prompt", None) is None and data.get("points", None) is not None:
                from ...transforms.utils import keep_merge_components_with_points

                pts = np.asarray(to_numpy(data["points"]))
                pls = np.asarray(to_numpy(data["point_labels"]))
                pos = (pred[None] > 0)
                neg = np.zeros_like(pos)
                keep = keep_merge_components_with_points(pos, neg, pts[None] if pts.ndim == 2
                                                         else pts,
                                                         pls[None] if pls.ndim == 1 else pls)
                pred = np.where(keep[0], pred, 0.0)
            pred[pred < 0] = 0.0
            if object_num > 1:
                is_bk = np.all(pred <= 0, axis=0, keepdims=True)
                pred = pred.argmax(0)[None].astype(np.float32) + 1.0
                pred[is_bk] = 0.0
            else:
                pred[pred > 0] = 1.0
            if data.get("label_prompt", None) is not None:
                label_prompt = np.asarray(to_numpy(data["label_prompt"])).reshape(-1)
                pred += 0.5
                for i in range(1, object_num + 1):
                    pred[pred == i + 0.5] = float(label_prompt[i - 1])
                pred[pred == 0.5] = 0.0
            if isinstance(item, MetaImage):
                data[key] = item.new_like(pred)
            else:
                data[key] = pred
        return data


class Relabeld(MapTransform):
    """Per-dataset local->global label remapping (reference: vista3d/transforms.py:177)."""

    def __init__(self, keys, label_mappings: dict, dtype=np.int16,
                 dataset_key: str = "dataset_name", allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.mappers = {}
        self.dataset_key = dataset_key
        for name, mapping in label_mappings.items():
            self.mappers[name] = MapLabelValue(
                orig_labels=[int(p[0]) for p in mapping],
                target_labels=[int(p[1]) for p in mapping], dtype=dtype) \
                if mapping is not None else None

    def __call__(self, data):
        d = dict(data)
        dataset_name = d.get(self.dataset_key, "default")
        mapper = look_up_option(dataset_name, self.mappers, default=None)
        if mapper is None:
            return d
        for key in self.key_iterator(d):
            d[key] = mapper(d[key])
        return d
