"""PatchInferer: split → batch-forward → merge composition
(reference: monai/inferers/inferer.py:100)."""
from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping, Sequence
from typing import Any

import numpy as np

from ..utils.backend import to_numpy
from ..utils.misc import ensure_tuple
from .inferer import Inferer
from .merger import AvgMerger, Merger
from .splitter import Splitter

__all__ = ["PatchInferer"]


class PatchInferer(Inferer):
    """Patch-wise inference over arbitrary splitters/mergers (reference: inferer.py:100)."""

    def __init__(self, splitter: Splitter | None = None, merger_cls=AvgMerger, batch_size: int = 1,
                 preprocessing: Callable | None = None, postprocessing: Callable | None = None,
                 output_keys: Sequence | None = None, match_spatial_shape: bool = True,
                 buffer_size: int = 0, **merger_kwargs):
        Inferer.__init__(self)
        if splitter is not None and not isinstance(splitter, Splitter):
            raise TypeError(f"'splitter' should be a `Splitter` object, {type(splitter)} is given.")
        self.splitter = splitter
        if not (isinstance(merger_cls, type) and issubclass(merger_cls, Merger)):
            raise TypeError(f"'merger' should be a subclass of `Merger`, {merger_cls} is given.")
        self.merger_cls = merger_cls
        self.merger_kwargs = merger_kwargs
        if preprocessing is not None and not callable(preprocessing):
            raise TypeError(f"'preprocessing' should be a callable object, {type(preprocessing)} is given.")
        self.preprocessing = preprocessing
        if postprocessing is not None and not callable(postprocessing):
            raise TypeError(f"'postprocessing' should be a callable object, {type(postprocessing)} is given.")
        self.postprocessing = postprocessing
        self.batch_size = batch_size
        self.output_keys = output_keys
        self.match_spatial_shape = match_spatial_shape

    def _batch_sampler(self, patches: Iterable):
        buf, locs = [], []
        for patch, loc in patches:
            buf.append(patch)
            locs.append(loc)
            if len(buf) == self.batch_size:
                yield np.concatenate(buf, axis=0), locs, len(buf)
                buf, locs = [], []
        if buf:
            yield np.concatenate(buf, axis=0), locs, len(buf)

    def _initialize_mergers(self, inputs, outputs, patches, batch_size):
        in_patch_shape = patches.shape[2:]
        out_patch_shape = outputs.shape[2:]
        ratios = [o / i for o, i in zip(out_patch_shape, in_patch_shape)]
        padded_shape = self.splitter.get_padded_shape(inputs) if self.splitter else inputs.shape[2:]
        orig_shape = self.splitter.get_input_shape(inputs) if self.splitter else inputs.shape[2:]
        merged_shape = (inputs.shape[0], outputs.shape[1]) + tuple(
            int(round(p * r)) for p, r in zip(padded_shape, ratios))
        cropped_shape = (inputs.shape[0], outputs.shape[1]) + tuple(
            int(round(s * r)) for s, r in zip(orig_shape, ratios))
        if not self.match_spatial_shape:
            cropped_shape = merged_shape
        return self.merger_cls(merged_shape=merged_shape, cropped_shape=cropped_shape,
                               **self.merger_kwargs), ratios

    def __call__(self, inputs: Any, network: Callable, *args, **kwargs):
        patches = self.splitter(inputs) if self.splitter is not None else [(to_numpy(inputs),
                                                                            (0,) * (np.ndim(inputs) - 2))]
        merger = None
        ratios = None
        for chunk, locs, n in self._batch_sampler(patches):
            x = chunk
            if self.preprocessing:
                x = self.preprocessing(x)
            import jax.numpy as jnp

            out = network(jnp.asarray(x), *args, **kwargs)
            if self.postprocessing:
                out = self.postprocessing(out)
            out_np = to_numpy(out)
            if merger is None:
                merger, ratios = self._initialize_mergers(inputs, out_np, x, n)
            for i, loc in enumerate(locs):
                out_loc = tuple(int(round(l * r)) for l, r in zip(loc, ratios))
                merger.aggregate(out_np[i:i + 1], out_loc)
        if merger is None:
            raise ValueError("no patches were produced by the splitter.")
        return merger.finalize()
