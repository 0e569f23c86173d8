"""HoVerNet engine utilities (reference: monai/apps/pathology/engines/utils.py:26)."""
from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from ...engines.utils import PrepareBatch, PrepareBatchExtraInput
from ...utils.enums import HoVerNetBranch
from ...utils.misc import ensure_tuple

__all__ = ["PrepareBatchHoVerNet"]


class PrepareBatchHoVerNet(PrepareBatch):
    """Prepare-batch callable producing a dict label for the three HoVerNet
    branches (reference: apps/pathology/engines/utils.py:26).

    ``extra_keys`` must name exactly two batch keys: the NC (type) target and the
    HV (distance-map) target; the default ``label`` key supplies the NP target.
    """

    def __init__(self, extra_keys: Sequence[str]) -> None:
        if len(ensure_tuple(extra_keys)) != 2:
            raise ValueError(
                f"length of `extra_keys` should be 2, get {len(ensure_tuple(extra_keys))}")
        self.prepare_batch = PrepareBatchExtraInput(extra_keys)

    def __call__(self, batchdata: dict, device=None, non_blocking: bool = False,
                 **kwargs: Any):
        image, _label, extra_label, _ = self.prepare_batch(batchdata, device, non_blocking,
                                                           **kwargs)
        label = {HoVerNetBranch.NP: _label, HoVerNetBranch.NC: extra_label[0],
                 HoVerNetBranch.HV: extra_label[1]}
        return image, label
