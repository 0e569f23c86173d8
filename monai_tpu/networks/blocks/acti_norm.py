"""ADN: optional Activation / Dropout / Normalization in configurable order
(reference: monai/networks/blocks/acti_norm.py:21 ADN). Channel-last internals."""
from __future__ import annotations

from flax import nnx

from ..layers.factories import get_act_layer, get_dropout_layer, get_norm_layer

__all__ = ["ADN"]


class ADN(nnx.Module):
    """(reference: acti_norm.py:21). `ordering` e.g. "NDA" applies norm, dropout, act."""

    def __init__(self, ordering: str = "NDA", in_channels: int | None = None,
                 act="PRELU", norm="INSTANCE", norm_dim: int | None = None,
                 dropout=None, dropout_dim: int | None = None, *, rngs: nnx.Rngs | None = None):
        if norm is not None and norm_dim is None and dropout_dim is None:
            raise ValueError("norm_dim or dropout_dim needs to be specified.")
        dims = norm_dim or dropout_dim or 1
        ops = []
        for item in ordering.upper():
            if item == "A" and act is not None:
                ops.append(("act", get_act_layer(act)))
            elif item == "N" and norm is not None:
                if in_channels is None:
                    raise ValueError("in_channels is required for the norm layer.")
                ops.append(("norm", get_norm_layer(norm, dims, in_channels, rngs=rngs)))
            elif item == "D" and dropout is not None:
                ops.append(("dropout", get_dropout_layer(dropout, dims, rngs=rngs)))
            elif item not in "ADN":
                raise ValueError(f"ordering must only contain A, D, N; got {ordering}")
        # keep modules as attributes (nnx tracking) and remember order
        self._order = []
        for name, op in ops:
            setattr(self, name, op)
            self._order.append(name)

    def __call__(self, x):
        for name in self._order:
            x = getattr(self, name)(x)
        return x
