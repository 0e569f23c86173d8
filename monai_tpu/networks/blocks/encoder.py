"""BaseEncoder ABC: the protocol FlexibleUNet backbones must implement
(reference: monai/networks/blocks/encoder.py BaseEncoder)."""
from __future__ import annotations

from abc import ABC, abstractmethod

__all__ = ["BaseEncoder"]


class BaseEncoder(ABC):
    """(reference: encoder.py BaseEncoder)."""

    @classmethod
    @abstractmethod
    def get_encoder_parameters(cls) -> list[dict]:
        ...

    @classmethod
    @abstractmethod
    def num_channels_per_output(cls) -> list[tuple[int, ...]]:
        ...

    @classmethod
    @abstractmethod
    def num_outputs(cls) -> list[int]:
        ...

    @classmethod
    @abstractmethod
    def get_encoder_names(cls) -> list[str]:
        ...
