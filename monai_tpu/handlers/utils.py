"""Handler utilities (reference: monai/handlers/utils.py)."""
from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.misc import ensure_tuple

__all__ = ["stopping_fn_from_metric", "stopping_fn_from_loss", "ignore_data",
           "write_metrics_reports"]


def stopping_fn_from_metric(metric_name: str) -> Callable:
    """Early-stopping score function reading engine.state.metrics[name]
    (reference: handlers/utils.py:34)."""

    def stopping_fn(engine):
        return engine.state.metrics[metric_name]

    return stopping_fn


def stopping_fn_from_loss() -> Callable:
    """Early-stopping score function from -loss (reference: handlers/utils.py:45)."""

    def stopping_fn(engine):
        out = engine.state.output
        if isinstance(out, list):
            out = out[0]
        if isinstance(out, dict):
            out = out.get("loss")
        return -float(np.asarray(to_numpy(out)))

    return stopping_fn


def ignore_data(x: Any) -> None:
    """Always None — e.g. as an output_transform to silence logging
    (reference: handlers/utils.py:213)."""
    return None


_SUMMARY_OPS = ("mean", "median", "max", "min", "90percentile", "std", "notnans")


def _summary_value(op: str, col: np.ndarray) -> float:
    if op == "mean":
        return float(np.nanmean(col))
    if op == "median":
        return float(np.nanmedian(col))
    if op == "max":
        return float(np.nanmax(col))
    if op == "min":
        return float(np.nanmin(col))
    if op == "std":
        return float(np.nanstd(col))
    if op == "notnans":
        return float(np.count_nonzero(~np.isnan(col)))
    if op.endswith("percentile"):
        q = int(op[:-len("percentile")])
        return float(np.nanpercentile(col, q))
    raise ValueError(f"unsupported summary operation {op}.")


def write_metrics_reports(save_dir, images, metrics, metric_details, summary_ops,
                          deli: str = ",", output_type: str = "csv",
                          class_labels=None) -> None:
    """Write overall metrics, per-case raw values, and summary CSVs
    (reference: handlers/utils.py:56)."""
    if output_type.lower() != "csv":
        raise ValueError(f"unsupported output type: {output_type}.")
    os.makedirs(save_dir, exist_ok=True)
    if metrics:
        with open(os.path.join(save_dir, "metrics.csv"), "w") as f:
            for k, v in metrics.items():
                f.write(f"{k}{deli}{v}\n")
    if not metric_details:
        return
    for k, v in metric_details.items():
        v = np.asarray(to_numpy(v), dtype=np.float64)
        if v.ndim == 0:
            v = v.reshape((1, 1))
        elif v.ndim == 1:
            v = v.reshape((-1, 1))
        labels = ([f"class{i}" for i in range(v.shape[1])] if class_labels is None
                  else [str(c) for c in class_labels])
        labels = labels + ["mean"]
        v = np.concatenate([v, np.nanmean(v, axis=1, keepdims=True)], axis=1)
        with open(os.path.join(save_dir, f"{k}_raw.csv"), "w") as f:
            f.write(f"filename{deli}{deli.join(labels)}\n")
            for i, row in enumerate(v):
                name = images[i] if images is not None else str(i)
                f.write(f"{name}{deli}{deli.join(f'{c:.4f}' for c in row)}\n")
        if summary_ops is not None:
            ops = list(_SUMMARY_OPS) if summary_ops == "*" else [str(o) for o in ensure_tuple(summary_ops)]
            with open(os.path.join(save_dir, f"{k}_summary.csv"), "w") as f:
                f.write(f"class{deli}{deli.join(ops)}\n")
                for ci, cl in enumerate(labels):
                    vals = [f"{_summary_value(op, v[:, ci]):.4f}" for op in ops]
                    f.write(f"{cl}{deli}{deli.join(vals)}\n")
