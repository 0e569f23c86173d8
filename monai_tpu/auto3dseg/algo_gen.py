"""Algo/AlgoGen ABC (reference: monai/auto3dseg/algo_gen.py:18 Algo, :47 AlgoGen)."""
from __future__ import annotations

from typing import Any

from ..transforms.transform import Randomizable

__all__ = ["Algo", "AlgoGen"]


class Algo:
    """Algorithm lifecycle interface (reference: algo_gen.py:18)."""

    def set_data_stats(self, *args: Any, **kwargs: Any) -> None:
        pass

    def train(self, *args: Any, **kwargs: Any):
        pass

    def predict(self, *args: Any, **kwargs: Any):
        pass

    def get_score(self, *args: Any, **kwargs: Any):
        pass

    def get_inferer(self, *args: Any, **kwargs: Any):
        pass

    def get_output_path(self, *args: Any, **kwargs: Any):
        pass


class AlgoGen(Randomizable):
    """Algorithm generator interface (reference: algo_gen.py:47)."""

    def set_data_stats(self, *args: Any, **kwargs: Any) -> None:
        pass

    def set_budget(self, *args: Any, **kwargs: Any) -> None:
        pass

    def set_score(self, *args: Any, **kwargs: Any) -> None:
        pass

    def get_data_stats(self, *args: Any, **kwargs: Any):
        pass

    def get_budget(self, *args: Any, **kwargs: Any):
        pass

    def get_history(self, *args: Any, **kwargs: Any):
        pass

    def generate(self, *args: Any, **kwargs: Any):
        pass

    def run_algo(self, *args: Any, **kwargs: Any):
        pass
