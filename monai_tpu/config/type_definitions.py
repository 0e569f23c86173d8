"""Common type aliases (reference: monai/config/type_definitions.py)."""
from __future__ import annotations

import os
from collections.abc import Collection, Hashable, Iterable, Sequence
from typing import Any, Union

import jax
import numpy as np

KeysCollection = Union[Collection[Hashable], Hashable]
IndexSelection = Union[Iterable[int], int]
DtypeLike = Any
NdarrayOrTensor = Union[np.ndarray, jax.Array]  # name kept for familiarity
NdarrayTensor = NdarrayOrTensor
PathLike = Union[str, os.PathLike]
SequenceStr = Union[Sequence[str], str]
