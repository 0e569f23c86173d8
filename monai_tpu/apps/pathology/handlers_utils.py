"""HoVerNet handler helpers (reference:
monai/apps/pathology/handlers/utils.py:21)."""
from __future__ import annotations

from typing import Any, Callable

from ...utils.misc import ensure_tuple

__all__ = ["from_engine_hovernet"]


def from_engine_hovernet(keys, nested_key: str) -> Callable[[Any], Any]:
    """``from_engine`` extended for HoVerNet's dict outputs: extract
    ``data[key][nested_key]`` across a dict or decollated list of dicts
    (reference: pathology/handlers/utils.py:21)."""
    _keys = ensure_tuple(keys)

    def _wrapper(data):
        if isinstance(data, dict):
            return tuple(data[k][nested_key] for k in _keys)
        if isinstance(data, list) and isinstance(data[0], dict):
            ret = [[i[k][nested_key] for i in data] for k in _keys]
            return tuple(ret) if len(ret) > 1 else ret[0]
        return None

    return _wrapper
