"""FL filters (reference: monai/fl/utils/filters.py:19)."""
from __future__ import annotations

import abc

from .exchange_object import ExchangeObject

__all__ = ["Filter", "SummaryFilter"]


class Filter(abc.ABC):
    """Transform an ExchangeObject in transit (reference: filters.py:19)."""

    @abc.abstractmethod
    def __call__(self, data: ExchangeObject, extra: dict | None = None) -> ExchangeObject:
        raise NotImplementedError


class SummaryFilter(Filter):
    """Print a summary of the exchange object (reference: filters.py:—)."""

    def __call__(self, data: ExchangeObject, extra: dict | None = None) -> ExchangeObject:
        print(f"Summary of ExchangeObject: {data.summary()}")
        return data
