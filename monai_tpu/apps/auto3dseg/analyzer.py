"""Auto3DSeg data analysis.

Parity targets: monai/apps/auto3dseg/data_analyzer.py (DataAnalyzer) and
monai/auto3dseg/analyzer.py (ImageStats/FgImageStats/LabelStats) — computes per-case and
summary statistics (spacing, shape, intensity, label classes) used for algo generation.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from ...data.affine_utils import affine_to_spacing
from ...data.meta_image import MetaImage
from ...transforms.compose import Compose
from ...transforms.dictionary import EnsureChannelFirstd, LoadImaged, Orientationd
from ...utils.backend import to_numpy

__all__ = ["DataAnalyzer"]


class DataAnalyzer:
    """Dataset-wide statistics for Auto3DSeg (reference: data_analyzer.py)."""

    def __init__(self, datalist: str | dict, dataroot: str = "", output_path: str = "./datastats.yaml",
                 average: bool = True, do_ccp: bool = False, device: str = "auto", worker: int = 4,
                 image_key: str = "image", label_key: str | None = "label",
                 hist_bins: int = 0, hist_range: list | None = None, fmt: str = "yaml",
                 histogram_only: bool = False, **extra_params):
        self.datalist = datalist
        self.dataroot = dataroot
        self.output_path = output_path
        self.image_key = image_key
        self.label_key = label_key
        self.fmt = fmt

    def _load_datalist(self) -> list[dict]:
        if isinstance(self.datalist, str):
            with open(self.datalist) as f:
                dl = json.load(f)
        else:
            dl = dict(self.datalist)
        items = dl.get("training", dl if isinstance(dl, list) else [])
        out = []
        for item in items:
            entry = dict(item) if isinstance(item, dict) else {self.image_key: item}
            for k, v in entry.items():
                if isinstance(v, str) and self.dataroot and not os.path.isabs(v):
                    entry[k] = os.path.join(self.dataroot, v)
            out.append(entry)
        return out

    def _case_stats(self, item: dict) -> dict:
        keys = [self.image_key] + ([self.label_key] if self.label_key and self.label_key in item else [])
        xform = Compose([
            LoadImaged(keys=keys, allow_missing_keys=True),
            EnsureChannelFirstd(keys=keys, channel_dim="no_channel", allow_missing_keys=True),
            Orientationd(keys=keys, axcodes="RAS", allow_missing_keys=True),
        ])
        d = xform(dict(item))
        img: MetaImage = d[self.image_key]
        arr = to_numpy(img.data)
        spacing = affine_to_spacing(np.asarray(img.affine)).tolist()
        stats: dict[str, Any] = {
            "image_stats": {
                "shape": list(arr.shape[1:]),
                "channels": int(arr.shape[0]),
                "spacing": spacing,
                "intensity": {
                    "max": float(arr.max()),
                    "min": float(arr.min()),
                    "mean": float(arr.mean()),
                    "std": float(arr.std()),
                    "percentile_00_5": float(np.percentile(arr, 0.5)),
                    "percentile_99_5": float(np.percentile(arr, 99.5)),
                },
            }
        }
        if self.label_key and self.label_key in d:
            lab = to_numpy(d[self.label_key].data)
            labels = [int(v) for v in np.unique(lab)]
            fg_mask = lab > 0
            fg = arr[fg_mask] if fg_mask.any() else arr.reshape(-1)
            stats["label_stats"] = {
                "labels": labels,
                "foreground_percentage": float(fg_mask.mean()),
                "image_foreground_intensity": {
                    "mean": float(fg.mean()),
                    "std": float(fg.std()),
                    "percentile_00_5": float(np.percentile(fg, 0.5)),
                    "percentile_99_5": float(np.percentile(fg, 99.5)),
                },
            }
        return stats

    def get_all_case_stats(self, key: str = "training", transform_list=None) -> dict:
        """Per-case + summary statistics (reference: data_analyzer.py get_all_case_stats)."""
        items = self._load_datalist()
        case_stats = []
        for item in items:
            case_stats.append(self._case_stats(item))
        summary = self._summarize(case_stats)
        result = {"stats_summary": summary, "stats_by_cases": case_stats,
                  "n_cases": len(case_stats)}
        if self.output_path:
            os.makedirs(os.path.dirname(os.path.abspath(self.output_path)), exist_ok=True)
            if self.fmt == "json" or str(self.output_path).endswith(".json"):
                with open(self.output_path, "w") as f:
                    json.dump(result, f, indent=2)
            else:
                import yaml

                with open(self.output_path, "w") as f:
                    yaml.safe_dump(result, f)
        return result

    @staticmethod
    def _summarize(case_stats: list[dict]) -> dict:
        if not case_stats:
            return {}
        shapes = np.asarray([c["image_stats"]["shape"] for c in case_stats], dtype=float)
        spacings = np.asarray([c["image_stats"]["spacing"] for c in case_stats], dtype=float)
        means = np.asarray([c["image_stats"]["intensity"]["mean"] for c in case_stats])
        stds = np.asarray([c["image_stats"]["intensity"]["std"] for c in case_stats])
        summary = {
            "image_stats": {
                "shape": {"median": np.median(shapes, 0).tolist(), "min": shapes.min(0).tolist(),
                          "max": shapes.max(0).tolist()},
                "spacing": {"median": np.median(spacings, 0).tolist(), "min": spacings.min(0).tolist(),
                            "max": spacings.max(0).tolist()},
                "intensity": {"mean": float(means.mean()), "std": float(stds.mean())},
            }
        }
        label_sets = [c.get("label_stats", {}).get("labels") for c in case_stats if "label_stats" in c]
        if label_sets:
            all_labels = sorted({v for s in label_sets for v in s})
            summary["label_stats"] = {"labels": all_labels, "n_classes": len(all_labels)}
        return summary


def strenum_representer(dumper, data):
    """yaml representer serializing StrEnum values as plain strings (reference:
    apps/auto3dseg/data_analyzer.py:35)."""
    return dumper.represent_scalar("tag:yaml.org,2002:str", data.value)


try:  # register like the reference does at import time
    import yaml as _yaml

    from ...utils.enums import StrEnum as _StrEnum

    _yaml.SafeDumper.add_multi_representer(_StrEnum, strenum_representer)
except ImportError:
    pass
