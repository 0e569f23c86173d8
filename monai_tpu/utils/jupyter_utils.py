"""Jupyter helpers: background-thread engine runs + live status/plots
(reference: monai/utils/jupyter_utils.py ThreadContainer:262, plot_engine_status).
"""
from __future__ import annotations

import copy
from collections.abc import Callable
from threading import RLock, Thread
from typing import Any

import numpy as np

from .enums import CommonKeys, StatusMembers

__all__ = ["ThreadContainer", "plot_engine_status", "plot_metric_graph", "StatusMembers"]


def _get_loss_from_output(output) -> float:
    """Pull a scalar loss out of an engine output dict/list (reference: jupyter_utils.py)."""
    def _item(x):
        if isinstance(x, dict):
            x = x.get(CommonKeys.LOSS, float("nan"))
        try:
            return float(np.asarray(x).reshape(-1)[0])
        except Exception:
            return float("nan")

    if isinstance(output, (list, tuple)) and output:
        return _item(output[0])
    return _item(output)


class ThreadContainer(Thread):
    """Run an engine in a background thread with lock-synchronised status
    (reference: jupyter_utils.py:262)."""

    def __init__(self, engine, loss_transform: Callable = _get_loss_from_output,
                 metric_transform: Callable = lambda name, value: value,
                 status_format: str = "{}: {:.4}"):
        super().__init__(daemon=True)
        self.lock = RLock()
        self.engine = engine
        self._status_dict: dict[str, Any] = {}
        self.loss_transform = loss_transform
        self.metric_transform = metric_transform
        self.status_format = status_format
        self.fig = None

        from ..engines.events import Events

        self.engine.add_event_handler(Events.ITERATION_COMPLETED, self._update_status)

    def run(self):
        self.engine.run()

    def stop(self):
        self.engine.terminate()
        self.join()

    def _update_status(self, *_):
        with self.lock:
            state = self.engine.state
            stats: dict[str, Any] = {
                StatusMembers.EPOCHS.value: 0,
                StatusMembers.ITERS.value: 0,
                StatusMembers.LOSS.value: float("nan"),
            }
            if state is not None:
                if getattr(state, "max_epochs", None) and state.max_epochs >= 1:
                    stats[StatusMembers.EPOCHS.value] = f"{state.epoch}/{state.max_epochs}"
                else:
                    stats[StatusMembers.EPOCHS.value] = str(state.epoch)
                if getattr(state, "epoch_length", None):
                    stats[StatusMembers.ITERS.value] = \
                        f"{state.iteration % state.epoch_length}/{state.epoch_length}"
                else:
                    stats[StatusMembers.ITERS.value] = str(state.iteration)
                stats[StatusMembers.LOSS.value] = self.loss_transform(state.output)
                for m, v in (state.metrics or {}).items():
                    v = self.metric_transform(m, v)
                    if v is not None:
                        stats.setdefault(m, [])
                        if isinstance(stats[m], list):
                            stats[m].append(v)
            self._status_dict.update(stats)

    @property
    def status_dict(self) -> dict[str, Any]:
        with self.lock:
            stats = {StatusMembers.STATUS.value: "Running" if self.is_alive() else "Stopped"}
            stats.update(self._status_dict)
            return stats

    def status(self) -> str:
        stats = copy.deepcopy(self.status_dict)
        msgs = [str(stats.pop(StatusMembers.STATUS.value)),
                "Iters: " + str(stats.pop(StatusMembers.ITERS.value, 0))]
        for key, val in stats.items():
            if isinstance(val, float):
                msgs.append(self.status_format.format(key, val))
            else:
                msgs.append(f"{key}: {val}")
        return ", ".join(msgs)

    def plot_status(self, logger, plot_func=None):
        """Plot loss/metric graphs from a MetricLogger into self.fig
        (reference: jupyter_utils.py plot_status)."""
        if plot_func is None:
            plot_func = plot_engine_status
        with self.lock:
            self.fig = plot_func(self.engine, logger, fig=self.fig)[0]
            return self.fig


def plot_metric_graph(ax, title: str, graphmap: dict) -> None:
    """Plot multiple named metric curves on one axis (reference: jupyter_utils.py:66)."""
    ax.set_title(title)
    for name, values in graphmap.items():
        if not values:
            continue
        if isinstance(values[0], (tuple, list)):  # (iteration, value) pairs
            ax.plot([v[0] for v in values], [v[1] for v in values],
                    label=f"{name} = {values[-1][1]:.5g}")
        else:
            ax.plot(values, label=f"{name} = {values[-1]:.5g}")
    ax.set_yscale("log")
    ax.grid(True, "both", "both")
    if graphmap:
        ax.legend()


def plot_engine_status(engine, logger, title: str = "Training Log", fig=None):
    """Draw loss + metric curves for a running engine (reference: jupyter_utils.py:166)."""
    import matplotlib.pyplot as plt

    if fig is None:
        fig = plt.Figure(figsize=(10, 5), tight_layout=True, facecolor="white")
    else:
        fig.clf()
    ax = fig.add_subplot(1, 1, 1)
    graphmap = {"loss": list(getattr(logger, "loss", []))}
    for m, v in getattr(logger, "metrics", {}).items():
        graphmap[m] = list(v)
    plot_metric_graph(ax, title, graphmap)
    return fig, [ax]


LOSS_NAME = "loss"


def tensor_to_images(name: str, tensor):
    """2D/3D tensor -> stack of 2D images for notebook display (3D takes the
    middle depth slice) (reference: jupyter_utils.py tensor_to_images)."""
    import numpy as np

    arr = np.asarray(getattr(tensor, "data", tensor))
    if arr.ndim == 3 and arr.shape[1] > 2 and arr.shape[2] > 2:
        return arr
    if arr.ndim == 4 and arr.shape[2] > 2 and arr.shape[3] > 2:
        dmid = arr.shape[1] // 2
        return arr[:, dmid]
    return None


def plot_metric_images(fig, title: str, graphmap, imagemap: dict, yscale: str = "log",
                       avg_keys=(LOSS_NAME,), window_fraction: int = 20) -> list:
    """Metric graph on top, images below (reference: jupyter_utils.py
    plot_metric_images)."""
    import matplotlib.pyplot as plt

    gridshape = (4, max(1, len(imagemap)))
    graph = plt.subplot2grid(gridshape, (0, 0), colspan=gridshape[1], fig=fig)
    plot_metric_graph(graph, title, graphmap)
    axes = [graph]
    for i, n in enumerate(imagemap):
        im = plt.subplot2grid(gridshape, (1, i), rowspan=2, fig=fig)
        if imagemap[n].ndim == 3 and imagemap[n].shape[0] in (3, 4):
            im.imshow(imagemap[n].transpose([1, 2, 0]))
        else:
            im.imshow(np.squeeze(imagemap[n]), cmap="gray")
        im.set_title(f"{n}\n{imagemap[n].min():.3g} -> {imagemap[n].max():.3g}")
        im.axis("off")
        axes.append(im)
    return axes
