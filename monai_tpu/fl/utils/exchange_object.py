"""FL exchange container (reference API: monai/fl/utils/exchange_object.py:17).

Own implementation: field validation is table-driven (one `_VALIDATORS` map)
instead of per-field property boilerplate.
"""
from __future__ import annotations

from typing import Any, Callable

from .constants import WeightType

__all__ = ["ExchangeObject"]


def _require_dict(name: str) -> Callable[[Any], None]:
    def check(value: Any) -> None:
        if value is not None and not isinstance(value, dict):
            raise ValueError(f"Expected {name} to be of type dict but received {type(value)}")

    return check


def _require_weight_type(value: Any) -> None:
    if value is not None and value not in (WeightType.WEIGHTS, WeightType.WEIGHT_DIFF):
        raise ValueError(f"Expected weight type to be a valid WeightType but received {value}")


class ExchangeObject(dict):
    """Contents exchanged between FL client and server: weights, optimizer state,
    metrics, statistics (reference: exchange_object.py:17)."""

    _VALIDATORS: dict[str, Callable[[Any], None]] = {
        "metrics": _require_dict("metrics"),
        "statistics": _require_dict("statistics"),
        "weight_type": _require_weight_type,
    }
    _FIELDS = ("weights", "optim", "metrics", "weight_type", "statistics")

    def __init__(self, weights=None, optim=None, metrics=None, weight_type=None, statistics=None):
        super().__init__()
        self.weights = weights
        self.optim = optim
        self.metrics = metrics
        self.weight_type = weight_type
        self.statistics = statistics

    def __setattr__(self, name: str, value: Any) -> None:
        validate = self._VALIDATORS.get(name)
        if validate is not None:
            validate(value)
        object.__setattr__(self, name, value)

    def is_valid_weights(self) -> bool:
        return self.weights is not None and self.weight_type is not None

    def summary(self) -> dict:
        """Compact description: dict fields by size, enums/strings verbatim,
        everything else by type."""
        out: dict = dict(self)
        for name in self._FIELDS:
            value = getattr(self, name)
            if not value:
                continue
            if isinstance(value, dict):
                out[name] = len(value)
            elif isinstance(value, (WeightType, str)):
                out[name] = value
            else:
                out[name] = type(value)
        return out

    def __repr__(self) -> str:
        return str(self.summary())
