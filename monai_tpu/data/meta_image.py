"""MetaImage: an array + affine + metadata container.

TPU-first redesign of the reference's ``MetaTensor`` (monai/data/meta_tensor.py:52,
monai/data/meta_obj.py:30).  Instead of subclassing the tensor type (impossible and
undesirable for jax arrays), MetaImage is a thin host-side wrapper:

- ``data``   — numpy or jax array, channel-first convention. Only this crosses the jit
  boundary; engines/collate extract it explicitly.
- ``affine`` — float64 numpy (4, 4) homogeneous matrix, always host-side (matching the
  reference's float64 affine convention, monai/transforms/inverse.py:214-226).
- ``meta``   — plain dict of metadata (filename, original affine, spatial shape, ...).
- ``applied_operations`` / ``pending_operations`` — transform-trace stacks powering
  invertibility and lazy resampling (reference: monai/data/meta_obj.py:63).

Arithmetic and numpy-protocol operations delegate to ``data`` and propagate metadata,
covering the main convenience of the reference's ``__torch_function__`` machinery.
"""
from __future__ import annotations

import copy as _copy
from typing import Any, Sequence

import numpy as np

from ..utils.backend import is_jax, to_jax, to_numpy, xp
from ..utils.enums import MetaKeys, SpaceKeys, TraceKeys
from .affine_utils import affine_to_spacing, to_affine_nd

_TRACK_META = True


def get_track_meta() -> bool:
    """Whether transforms produce MetaImage (True) or bare arrays (False)
    (reference: monai/data/meta_obj.py:47)."""
    return _TRACK_META


def set_track_meta(val: bool) -> None:
    """Globally enable/disable metadata tracking (reference: monai/data/meta_obj.py:30)."""
    global _TRACK_META
    _TRACK_META = bool(val)


class MetaImage:
    """Array with affine + metadata + transform trace. See module docstring."""

    __array_priority__ = 100  # numpy defers binary ops to us

    def __init__(self, data: Any, affine: np.ndarray | None = None, meta: dict | None = None,
                 applied_operations: list | None = None, pending_operations: list | None = None):
        if isinstance(data, MetaImage):
            affine = data.affine if affine is None else affine
            meta = dict(data.meta) if meta is None else meta
            applied_operations = list(data.applied_operations) if applied_operations is None else applied_operations
            pending_operations = list(data.pending_operations) if pending_operations is None else pending_operations
            data = data.data
        if not (is_jax(data) or isinstance(data, np.ndarray)):
            data = np.asarray(data)
        self.data = data
        self.meta: dict = dict(meta) if meta else {}
        if affine is not None:
            aff = np.asarray(affine, dtype=np.float64)
        elif MetaKeys.AFFINE in self.meta:
            aff = np.asarray(self.meta[MetaKeys.AFFINE], dtype=np.float64)
        else:
            aff = self.get_default_affine()
        self.meta[MetaKeys.AFFINE] = aff
        self.meta.setdefault(MetaKeys.SPACE, SpaceKeys.RAS)
        self.applied_operations: list = list(applied_operations) if applied_operations else []
        self.pending_operations: list = list(pending_operations) if pending_operations else []
        self.is_batch: bool = False

    # -- core properties ---------------------------------------------------
    @property
    def affine(self) -> np.ndarray:
        return self.meta.get(MetaKeys.AFFINE)

    @affine.setter
    def affine(self, value) -> None:
        self.meta[MetaKeys.AFFINE] = np.asarray(value, dtype=np.float64)

    @property
    def pixdim(self) -> np.ndarray:
        """Voxel spacing from the affine (reference: meta_tensor.py:518)."""
        if self.is_batch:
            return [affine_to_spacing(a) for a in self.affine]
        return affine_to_spacing(self.affine)

    @property
    def shape(self) -> tuple:
        return tuple(self.data.shape)

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def size(self):
        return self.data.size

    def __len__(self) -> int:
        return len(self.data)

    def get_default_affine(self, dtype=np.float64) -> np.ndarray:
        ndim = max(getattr(self.data, "ndim", 1) - 1, 1)
        return np.eye(ndim + 1, dtype=dtype)

    # -- pending/lazy support ------------------------------------------------
    def peek_pending_shape(self) -> tuple:
        """Spatial shape after all pending operations (reference: meta_tensor.py:262)."""
        res = None
        if self.pending_operations:
            res = self.pending_operations[-1].get("lazy_shape", None)
        return tuple(self.data.shape[1:]) if res is None else tuple(int(x) for x in res)

    def peek_pending_affine(self) -> np.ndarray:
        """Affine after all pending operations (reference: meta_tensor.py:270)."""
        res = np.asarray(self.affine, dtype=np.float64)
        r = len(res) - 1
        for p in self.pending_operations:
            next_matrix = p.get("lazy_affine", None)
            if next_matrix is None:
                continue
            next_matrix = to_affine_nd(r, np.asarray(next_matrix, dtype=np.float64))
            res = res @ next_matrix
        return res

    def peek_pending_rank(self) -> int:
        a = self.pending_operations[-1].get("lazy_affine", None) if self.pending_operations else self.affine
        return max(1, len(a) - 1)

    def push_pending_operation(self, op: dict) -> None:
        self.pending_operations.append(op)

    def pop_pending_operation(self) -> dict:
        return self.pending_operations.pop()

    def clear_pending_operations(self) -> None:
        self.pending_operations = []

    def push_applied_operation(self, op: dict) -> None:
        self.applied_operations.append(op)

    def pop_applied_operation(self) -> dict:
        return self.applied_operations.pop()

    def copy_meta_from(self, src: "MetaImage | dict", copy_attr: bool = True) -> "MetaImage":
        if isinstance(src, MetaImage):
            self.meta = dict(src.meta)
            if copy_attr:
                self.applied_operations = list(src.applied_operations)
                self.pending_operations = list(src.pending_operations)
        else:
            self.meta = dict(src)
        return self

    # -- conversion ----------------------------------------------------------
    def as_numpy(self, dtype=None) -> np.ndarray:
        return to_numpy(self.data, dtype=dtype)

    def as_jax(self, dtype=None):
        return to_jax(self.data, dtype=dtype)

    def array(self) -> Any:
        return self.data

    def astype(self, dtype) -> "MetaImage":
        return self.new_like(self.data.astype(dtype))

    def clone(self) -> "MetaImage":
        data = self.data.copy() if isinstance(self.data, np.ndarray) else self.data
        out = MetaImage(data, affine=np.array(self.affine), meta=_copy.deepcopy(self.meta),
                        applied_operations=_copy.deepcopy(self.applied_operations),
                        pending_operations=_copy.deepcopy(self.pending_operations))
        out.is_batch = self.is_batch
        return out

    def new_like(self, data: Any) -> "MetaImage":
        """New MetaImage with ``data`` and this image's metadata (shallow-copied)."""
        out = MetaImage(data, affine=np.array(self.affine), meta=dict(self.meta),
                        applied_operations=list(self.applied_operations),
                        pending_operations=list(self.pending_operations))
        out.is_batch = self.is_batch
        return out

    @staticmethod
    def ensure_meta(img: Any) -> "MetaImage":
        return img if isinstance(img, MetaImage) else MetaImage(img)

    @staticmethod
    def ensure_torch_and_prune_meta(im, meta: dict | None, simple_keys: bool = False):  # name kept for parity
        out = MetaImage(im, meta=meta)
        if simple_keys and TraceKeys.KEY_SUFFIX in out.meta:
            out.meta.pop(TraceKeys.KEY_SUFFIX)
        return out

    # -- numpy protocol / arithmetic ------------------------------------------
    def __array__(self, dtype=None, copy=None):
        return to_numpy(self.data, dtype=dtype)

    def _unwrap(self, other):
        return other.data if isinstance(other, MetaImage) else other

    def _binop(self, other, op_name: str, reflected: bool = False):
        other = self._unwrap(other)
        a, b = (other, self.data) if reflected else (self.data, other)
        res = getattr(xp(self.data), op_name)(a, b)
        return self.new_like(res)

    def __add__(self, o):
        return self._binop(o, "add")

    def __radd__(self, o):
        return self._binop(o, "add", reflected=True)

    def __sub__(self, o):
        return self._binop(o, "subtract")

    def __rsub__(self, o):
        return self._binop(o, "subtract", reflected=True)

    def __mul__(self, o):
        return self._binop(o, "multiply")

    def __rmul__(self, o):
        return self._binop(o, "multiply", reflected=True)

    def __truediv__(self, o):
        return self._binop(o, "divide")

    def __rtruediv__(self, o):
        return self._binop(o, "divide", reflected=True)

    def __pow__(self, o):
        return self._binop(o, "power")

    def __neg__(self):
        return self.new_like(-self.data)

    def __abs__(self):
        return self.new_like(xp(self.data).abs(self.data))

    def __gt__(self, o):
        return self.new_like(self.data > self._unwrap(o))

    def __ge__(self, o):
        return self.new_like(self.data >= self._unwrap(o))

    def __lt__(self, o):
        return self.new_like(self.data < self._unwrap(o))

    def __le__(self, o):
        return self.new_like(self.data <= self._unwrap(o))

    def __eq__(self, o):  # elementwise, like ndarray
        return self.new_like(self.data == self._unwrap(o))

    def __ne__(self, o):
        return self.new_like(self.data != self._unwrap(o))

    def __hash__(self):
        return id(self)

    def __getitem__(self, idx):
        res = self.data[idx]
        if np.ndim(res) == 0:
            return res
        return self.new_like(res)

    def __setitem__(self, idx, value):
        value = self._unwrap(value)
        if is_jax(self.data):
            self.data = self.data.at[idx].set(value)
        else:
            self.data[idx] = value

    def __iter__(self):
        for i in range(self.data.shape[0]):
            yield self[i]

    def __repr__(self) -> str:
        return (f"MetaImage(shape={tuple(self.data.shape)}, dtype={self.data.dtype}, "
                f"backend={'jax' if is_jax(self.data) else 'numpy'},\n"
                f" affine=\n{self.affine},\n pending={len(self.pending_operations)}, "
                f"applied={len(self.applied_operations)})")

    # commonly used reductions delegate with meta propagation
    def sum(self, *a, **k):
        return xp(self.data).sum(self.data, *a, **k)

    def mean(self, *a, **k):
        return xp(self.data).mean(self.data, *a, **k)

    def max(self, *a, **k):
        return xp(self.data).max(self.data, *a, **k)

    def min(self, *a, **k):
        return xp(self.data).min(self.data, *a, **k)

    def copy(self) -> "MetaImage":
        return self.clone()


class MetaObj:
    """Base metadata container (reference: meta_obj.py:63 MetaObj). MetaImage is the
    array-carrying subclass in this framework; MetaObj is provided for API parity as
    the minimal meta/applied-operations holder."""

    def __init__(self):
        self._meta: dict = {}
        self.applied_operations: list = []
        self.pending_operations: list = []
        self.is_batch: bool = False

    @property
    def meta(self) -> dict:
        return self._meta

    @meta.setter
    def meta(self, d: dict):
        self._meta = dict(d)
