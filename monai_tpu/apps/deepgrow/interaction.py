"""Click-simulation inner loop (reference: monai/apps/deepgrow/interaction.py and
monai/apps/deepedit/interaction.py:26 — runs N interaction iterations inside each
training iteration, firing INNER_ITERATION_* events)."""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import numpy as np

from ...data.meta_image import MetaImage
from ...engines.events import IterationEvents
from ...transforms.compose import Compose
from ...utils.backend import to_jax, to_numpy
from ...utils.enums import CommonKeys

__all__ = ["Interaction"]


class Interaction:
    """Wrap an engine's iteration with click-simulation rounds
    (reference: deepedit/interaction.py:26).

    Use as ``iteration_update`` of a SupervisedTrainer/Evaluator: before the standard
    forward/backward, run ``max_interactions`` rounds of predict → find discrepancy →
    add guidance → update the network inputs.
    """

    def __init__(self, deepgrow_probability: float, transforms: Sequence[Callable] | Callable,
                 train: bool, label_names: dict | None = None, click_probability_key: str = "probability",
                 max_interactions: int = 1):
        self.deepgrow_probability = deepgrow_probability
        self.transforms = Compose(transforms) if not isinstance(transforms, Compose) else transforms
        self.train = train
        self.label_names = label_names
        self.click_probability_key = click_probability_key
        self.max_interactions = max_interactions

    def __call__(self, engine, batchdata: dict) -> dict:
        if batchdata is None:
            raise ValueError("Must provide batch data for current iteration.")
        import jax
        from flax import nnx

        network = engine.network
        graphdef, state = nnx.split(network)

        @jax.jit
        def fwd(state, x):
            return nnx.merge(graphdef, state)(x)

        if np.random.rand() < self.deepgrow_probability:
            for _ in range(self.max_interactions):
                inputs = batchdata[CommonKeys.IMAGE]
                x = to_jax(inputs.data if isinstance(inputs, MetaImage) else inputs)
                engine.fire_event(IterationEvents.INNER_ITERATION_STARTED)
                preds = fwd(nnx.state(network), x)
                batchdata[CommonKeys.PRED] = np.asarray(to_numpy(preds))
                # decollate → per-sample click transforms → recollate
                samples = []
                b = x.shape[0]
                for i in range(b):
                    sample = {}
                    for k, v in batchdata.items():
                        if isinstance(v, MetaImage):
                            sample[k] = v[i]
                        elif hasattr(v, "shape") and np.ndim(v) > 0 and len(v) == b:
                            sample[k] = v[i]
                        else:
                            sample[k] = v
                    sample[self.click_probability_key] = 1.0
                    samples.append(self.transforms(sample))
                from ...data.utils import list_data_collate

                collated = list_data_collate(samples)
                for k in (CommonKeys.IMAGE,):
                    batchdata[k] = collated[k]
                engine.fire_event(IterationEvents.INNER_ITERATION_COMPLETED)
        batchdata.pop(CommonKeys.PRED, None)
        return engine.__class__._iteration(engine, engine, batchdata)  # standard step
