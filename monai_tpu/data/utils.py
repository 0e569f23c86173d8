"""Data utilities: collation, decollation, patch grids, importance maps, partitioning.

Parity targets: monai/data/utils.py (list_data_collate:483, collate_meta_tensor:466,
decollate_batch:566, pad_list_data_collate:669, iter_patch_slices:132, dense_patch_slices:166,
iter_patch:257, compute_importance_map:1084, partition_dataset:1157,
partition_dataset_classes:1267, pickle_hashing:1385, json_hashing:1405,
correct_nifti_header_if_necessary:737-ish, select_cross_validation_folds).
"""
from __future__ import annotations

import hashlib
import json
import math
import pickle
from collections.abc import Generator, Iterable, Mapping, Sequence
from itertools import product, starmap
from typing import Any

import numpy as np

from ..utils.backend import is_jax, to_numpy
from ..utils.enums import BlendMode, NumpyPadMode
from ..utils.misc import ensure_tuple, ensure_tuple_rep, ensure_tuple_size, fall_back_tuple, first, issequenceiterable
from .meta_image import MetaImage

__all__ = [
    "get_random_patch",
    "iter_patch_slices",
    "dense_patch_slices",
    "iter_patch_position",
    "iter_patch",
    "get_valid_patch_size",
    "list_data_collate",
    "collate_meta_tensor",
    "decollate_batch",
    "pad_list_data_collate",
    "compute_importance_map",
    "partition_dataset",
    "partition_dataset_classes",
    "select_cross_validation_folds",
    "pickle_hashing",
    "json_hashing",
    "no_collation",
    "worker_init_fn",
    "set_rnd",
]


def get_random_patch(dims: Sequence[int], patch_size: Sequence[int],
                     rand_state: np.random.RandomState | None = None) -> tuple[slice, ...]:
    """Random patch slices (reference: data/utils.py:105)."""
    rand_int = np.random.randint if rand_state is None else rand_state.randint
    min_corner = tuple(rand_int(0, ms - ps + 1) if ms > ps else 0 for ms, ps in zip(dims, patch_size))
    return tuple(slice(mc, mc + ps) for mc, ps in zip(min_corner, patch_size))


def iter_patch_slices(image_size: Sequence[int], patch_size: Sequence[int] | int,
                      start_pos: Sequence[int] = (), overlap: Sequence[float] | float = 0.0,
                      padded: bool = True) -> Generator[tuple[slice, ...], None, None]:
    """Iterate patch slices in row-major order (reference: data/utils.py:132)."""
    ndim = len(image_size)
    patch_size_ = get_valid_patch_size(image_size, patch_size)
    start_pos = ensure_tuple_size(start_pos, ndim)
    for position in iter_patch_position(image_size, patch_size_, start_pos, overlap, padded):
        yield tuple(slice(s, s + p) for s, p in zip(position, patch_size_))


def dense_patch_slices(image_size: Sequence[int], patch_size: Sequence[int],
                       scan_interval: Sequence[int], return_slice: bool = True) -> list:
    """All sliding-window slices covering image_size (reference: data/utils.py:166)."""
    num_spatial_dims = len(image_size)
    patch_size = get_valid_patch_size(image_size, patch_size)
    scan_interval = ensure_tuple_size(scan_interval, num_spatial_dims)

    scan_num = []
    for i in range(num_spatial_dims):
        if scan_interval[i] == 0:
            scan_num.append(1)
        else:
            num = int(math.ceil(float(image_size[i]) / scan_interval[i]))
            scan_dim = first(d for d in range(num) if d * scan_interval[i] + patch_size[i] >= image_size[i])
            scan_num.append(scan_dim + 1 if scan_dim is not None else 1)

    starts = []
    for dim in range(num_spatial_dims):
        dim_starts = []
        for idx in range(scan_num[dim]):
            start_idx = idx * scan_interval[dim]
            start_idx -= max(start_idx + patch_size[dim] - image_size[dim], 0)
            dim_starts.append(start_idx)
        starts.append(dim_starts)
    out = np.asarray([x.flatten() for x in np.meshgrid(*starts, indexing="ij")]).T
    if return_slice:
        return [tuple(slice(s, s + patch_size[d]) for d, s in enumerate(x)) for x in out]
    return [tuple((s, s + patch_size[d]) for d, s in enumerate(x)) for x in out]


def iter_patch_position(image_size: Sequence[int], patch_size: Sequence[int] | int,
                        start_pos: Sequence[int] = (), overlap: Sequence[float] | float = 0.0,
                        padded: bool = False):
    """Iterate patch start positions (reference: data/utils.py:217)."""
    ndim = len(image_size)
    patch_size_ = get_valid_patch_size(image_size, patch_size)
    start_pos = ensure_tuple_size(start_pos, ndim)
    overlap = ensure_tuple_rep(overlap, ndim)

    steps = []
    for dim in range(ndim):
        if isinstance(overlap[dim], int):
            interval = patch_size_[dim] - overlap[dim]
        else:
            interval = int(patch_size_[dim] * (1.0 - overlap[dim]))
        steps.append(interval if interval > 0 else 1)
    end_pos = [i + (p if not padded else 0) - (p if not padded else 0) + (i % 1) for i, p in zip(image_size, patch_size_)]
    ranges = []
    for dim in range(ndim):
        stop = image_size[dim] if padded else image_size[dim] - patch_size_[dim] + 1
        if stop <= start_pos[dim]:
            stop = start_pos[dim] + 1
        ranges.append(range(start_pos[dim], stop, steps[dim]))
    return product(*ranges)


def get_valid_patch_size(image_size: Sequence[int], patch_size: Sequence[int] | int) -> tuple:
    """Clamp patch_size to image_size, 0/None → full dim (reference: data/utils.py:244)."""
    ndim = len(image_size)
    patch_size_ = ensure_tuple_size(patch_size, ndim)
    return tuple(min(ms, ps if ps is not None and ps > 0 else ms) for ms, ps in zip(image_size, patch_size_))


def iter_patch(arr: np.ndarray, patch_size: Sequence[int] | int = 0, start_pos: Sequence[int] = (),
               overlap: Sequence[float] | float = 0.0, copy_back: bool = True,
               mode: str | None = NumpyPadMode.WRAP, **pad_opts):
    """Iterate over patches, optionally padding first (reference: data/utils.py:257)."""
    patch_size_ = get_valid_patch_size(arr.shape, patch_size)
    start_pos = ensure_tuple_size(start_pos, arr.ndim)

    if mode is not None:
        arr_pad = np.pad(arr, tuple((p, p) for p in patch_size_), mode=str(mode), **pad_opts)
        start_pos_padded = tuple(s + p for s, p in zip(start_pos, patch_size_))
        iter_size = tuple(s + p for s, p in zip(arr.shape, patch_size_))
    else:
        arr_pad = arr
        start_pos_padded = start_pos
        iter_size = arr.shape

    for slices in iter_patch_slices(iter_size, patch_size_, start_pos_padded, overlap,
                                    padded=(mode is not None)):
        coords_no_pad = tuple((coord.start - p, coord.stop - p) for coord, p in zip(slices, patch_size_)) \
            if mode is not None else tuple((coord.start, coord.stop) for coord in slices)
        yield arr_pad[slices], np.asarray(coords_no_pad)

    if copy_back and mode is not None:
        slices = tuple(slice(p, p + s) for p, s in zip(patch_size_, arr.shape))
        arr[...] = arr_pad[slices]


# ---------------------------------------------------------------------------
# collate / decollate
# ---------------------------------------------------------------------------

def collate_meta_tensor(batch: Sequence) -> Any:
    """Stack a list of MetaImage/arrays into a batch (reference: data/utils.py:466).

    MetaImage batching: data stacked to (B, C, ...); per-sample meta kept as lists;
    batch affine = list of affines; is_batch=True.
    """
    elem = batch[0]
    if isinstance(elem, MetaImage):
        arrs = [np.asarray(to_numpy(e.data)) for e in batch]
        # batch_size 1: a [None] view adds the batch dim without copying the
        # volume (np.stack always copies) — ~2x on the cached host feed path
        stacked = arrs[0][None] if len(arrs) == 1 else np.stack(arrs, axis=0)
        out = MetaImage(stacked, affine=np.stack([np.asarray(e.affine) for e in batch]),
                        meta={"batched_meta": [dict(e.meta) for e in batch]})
        out.applied_operations = [list(e.applied_operations) for e in batch]
        out.pending_operations = []
        out.is_batch = True
        return out
    if isinstance(elem, np.ndarray) or is_jax(elem):
        arrs = [np.asarray(to_numpy(e)) for e in batch]
        return arrs[0][None] if len(arrs) == 1 else np.stack(arrs, axis=0)
    if isinstance(elem, (float, int, np.number)):
        return np.asarray(batch)
    if isinstance(elem, Mapping):
        return {k: collate_meta_tensor([d[k] for d in batch]) for k in elem}
    if isinstance(elem, (tuple, list)) and not isinstance(elem, str):
        return [collate_meta_tensor([d[i] for d in batch]) for i in range(len(elem))]
    return list(batch)


def list_data_collate(batch: Sequence) -> Any:
    """Collate, flattening one level of multi-sample lists (reference: data/utils.py:483)."""
    elem = first(batch)
    data = [i for k in batch for i in k] if isinstance(elem, list) else list(batch)
    if len(data) == 0:
        return data
    return collate_meta_tensor(data)


def _non_zipping_check(batch_data, detach: bool, pad: bool, fill_value):
    if isinstance(batch_data, Mapping):
        _deco = {key: decollate_batch(batch_data[key], detach, pad=pad, fill_value=fill_value)
                 for key in batch_data}
    elif isinstance(batch_data, Iterable) and not isinstance(batch_data, str):
        _deco = [decollate_batch(b, detach, pad=pad, fill_value=fill_value) for b in batch_data]
    else:
        raise NotImplementedError(f"Unable to de-collate: {batch_data}, type: {type(batch_data)}.")
    batch_size, non_iterable = 0, []
    for k, v in _deco.items() if isinstance(_deco, Mapping) else enumerate(_deco):
        if not isinstance(v, (list, tuple)) or isinstance(v, str):
            non_iterable.append(k)
        elif len(v) > batch_size:
            batch_size = len(v)
    return batch_size, non_iterable, _deco


def decollate_batch(batch, detach: bool = True, pad: bool = True, fill_value=None) -> Any:
    """Batch → list of per-sample items (reference: data/utils.py:566)."""
    if batch is None:
        return batch
    if isinstance(batch, (float, int, str, bytes)) or (isinstance(batch, np.ndarray) and batch.ndim == 0):
        return batch
    if isinstance(batch, MetaImage):
        if not batch.is_batch:
            # a single sample — return as-is
            return batch
        out_list = []
        metas = batch.meta.get("batched_meta", [{} for _ in range(len(batch.data))])
        affines = batch.affine if np.asarray(batch.affine).ndim == 3 else [batch.affine] * len(batch.data)
        ops = batch.applied_operations if isinstance(batch.applied_operations, list) and batch.applied_operations \
            and isinstance(batch.applied_operations[0], list) else [[] for _ in range(len(batch.data))]
        for i in range(batch.data.shape[0]):
            m = MetaImage(to_numpy(batch.data[i]) if detach else batch.data[i],
                          affine=np.asarray(affines[i]), meta=dict(metas[i]) if i < len(metas) else {})
            m.applied_operations = list(ops[i]) if i < len(ops) else []
            out_list.append(m)
        return out_list
    if is_jax(batch) or isinstance(batch, np.ndarray):
        arr = to_numpy(batch) if detach else batch
        if arr.ndim == 0:
            return arr.item() if detach else arr
        out_list = list(arr)
        return [x.item() if isinstance(x, np.ndarray) and x.ndim == 0 and detach else x for x in out_list]
    if isinstance(batch, (Mapping, Iterable)):
        # reference data/utils.py:648-666: b<=0 means "already a single item" and is
        # returned as-is (e.g. a dict value that is a list of strings); otherwise
        # non-iterables are duplicated to the batch length and values zip per item
        from copy import deepcopy
        from itertools import zip_longest

        b, non_iterable, deco = _non_zipping_check(batch, detach, pad, fill_value)
        if b <= 0:
            return deco
        if pad:
            for k in non_iterable:
                deco[k] = [deepcopy(deco[k]) for _ in range(b)]
        if isinstance(deco, Mapping):
            _gen = zip_longest(*deco.values(), fillvalue=fill_value) if pad else zip(*deco.values())
            return [dict(zip(deco, item)) for item in _gen]
        _gen = zip_longest(*deco, fillvalue=fill_value) if pad else zip(*deco)
        return [list(item) for item in _gen]
    raise NotImplementedError(f"Unable to de-collate: {batch}, type: {type(batch)}.")


def pad_list_data_collate(batch: Sequence, method: str = "symmetric", mode: str = "constant",
                          **kwargs) -> Any:
    """Collate with padding to the max shape (reference: data/utils.py:669)."""
    list_of_dicts = isinstance(first(batch), Mapping)
    keys = first(batch).keys() if list_of_dicts else [None]
    out = [dict(b) for b in batch] if list_of_dicts else list(batch)
    for key in keys:
        items = [d[key] for d in out] if list_of_dicts else out
        arrs = [i.data if isinstance(i, MetaImage) else i for i in items]
        if not all(hasattr(a, "shape") for a in arrs):
            continue
        shapes = [a.shape for a in arrs]
        if len(set(shapes)) == 1:
            continue
        max_shape = np.max(np.asarray([s[1:] for s in shapes]), axis=0)
        from ..transforms.croppad_array import SpatialPad

        padder = SpatialPad(spatial_size=tuple(int(m) for m in max_shape), method=method, mode=mode, **kwargs)
        for idx, item in enumerate(items):
            padded = padder(item)
            if list_of_dicts:
                out[idx][key] = padded
            else:
                out[idx] = padded
    return list_data_collate(out)


def no_collation(x):
    """Identity collate (reference: data/utils.py:—)."""
    return x


def worker_init_fn(worker_id: int) -> None:
    """Seed per-worker randomness (reference: data/utils.py:—)."""
    np.random.seed(np.random.get_state()[1][0] + worker_id)


def set_rnd(obj, seed: int) -> int:
    """Recursively seed Randomizable members (reference: data/utils.py:—)."""
    from ..transforms.transform import Randomizable

    if isinstance(obj, Randomizable):
        obj.set_random_state(seed % (np.iinfo(np.uint32).max + 1))
        seed += 1
    for attr in getattr(obj, "__dict__", {}):
        if attr.startswith("_"):
            continue
        val = getattr(obj, attr)
        if isinstance(val, Randomizable) and val is not obj:
            seed = set_rnd(val, seed)
    return seed


# ---------------------------------------------------------------------------
# importance map (sliding-window blending weights)
# ---------------------------------------------------------------------------

def compute_importance_map(patch_size: Sequence[int], mode: str = BlendMode.CONSTANT,
                           sigma_scale: Sequence[float] | float = 0.125, dtype=np.float32):
    """Blend-weight map for window stitching (reference: data/utils.py:1084).

    gaussian: centered gaussian with sigma = sigma_scale * dim, min-clipped so padding
    areas never fully zero out.
    """
    if str(mode) == str(BlendMode.CONSTANT):
        return np.ones(patch_size, dtype=dtype)
    if str(mode) != str(BlendMode.GAUSSIAN):
        raise ValueError(f"Unsupported mode: {mode}, available options are ['constant', 'gaussian'].")
    sigma_scale_ = ensure_tuple_rep(sigma_scale, len(patch_size))
    sigmas = [i * sigma_s for i, sigma_s in zip(patch_size, sigma_scale_)]
    # exact reference formula (data/utils.py:1117-1126): separable outer product of
    # exp(-x^2 / 2s^2) with x centered at (n-1)/2 (fractional center for even n),
    # float32 per-dim, NOT renormalized to max 1
    out = np.ones(patch_size, dtype=np.float32)
    for d, (size, sigma) in enumerate(zip(patch_size, sigmas)):
        x = np.arange(-(size - 1) / 2.0, (size - 1) / 2.0 + 1, dtype=np.float32)
        g = np.exp(x.astype(np.float32) ** 2 / np.float32(-2 * sigma**2))
        shape = [1] * len(patch_size)
        shape[d] = size
        out = out * g.reshape(shape)
    # handle non-positive weights exactly like the reference (data/utils.py:1131-1133)
    min_non_zero = max(float(out.min()), 1e-3)
    return np.clip(out, a_min=min_non_zero, a_max=None).astype(dtype)


# ---------------------------------------------------------------------------
# dataset partitioning (per-host sharding for data parallelism)
# ---------------------------------------------------------------------------

def partition_dataset(data: Sequence, ratios: Sequence[float] | None = None, num_partitions: int | None = None,
                      shuffle: bool = False, seed: int = 0, drop_last: bool = False,
                      even_divisible: bool = False) -> list[list]:
    """Split a dataset by ratios or into N partitions (reference: data/utils.py:1157).

    On TPU pods this is the per-host input sharding primitive: partition the datalist by
    ``jax.process_index()`` instead of using a torch DistributedSampler.
    """
    data_len = len(data)
    datasets = []
    indices = list(range(data_len))
    if shuffle:
        rs = np.random.RandomState(seed)
        rs.shuffle(indices)

    if ratios is not None:
        next_idx = 0
        rsum = sum(ratios)
        for r in ratios:
            start_idx = next_idx
            next_idx = min(start_idx + int(r / rsum * data_len + 0.5), data_len)
            datasets.append([data[i] for i in indices[start_idx:next_idx]])
        return datasets

    if num_partitions is None:
        raise ValueError("must specify number of partitions or ratios.")
    if num_partitions > data_len:
        import warnings

        warnings.warn(f"there may be not enough data ({data_len}) to be split into {num_partitions} partitions.")
    if even_divisible and data_len % num_partitions != 0:
        # wrap-around pad so each partition has equal length (DistributedSampler semantics)
        indices = indices + indices[: (-data_len) % num_partitions]
    elif drop_last and data_len % num_partitions != 0:
        indices = indices[: data_len - (data_len % num_partitions)]
    for i in range(num_partitions):
        datasets.append([data[j] for j in indices[i::num_partitions]])
    return datasets


def partition_dataset_classes(data: Sequence, classes: Sequence[int], ratios: Sequence[float] | None = None,
                              num_partitions: int | None = None, shuffle: bool = False, seed: int = 0,
                              drop_last: bool = False, even_divisible: bool = False) -> list[list]:
    """Class-stratified partitioning (reference: data/utils.py:1267)."""
    if not issequenceiterable(classes) or len(classes) != len(data):
        raise ValueError(f"length of classes {len(ensure_tuple(classes))} must match the dataset length {len(data)}.")
    datasets: list[list] = []
    class_indices: dict = {}
    for i, c in enumerate(classes):
        class_indices.setdefault(c, []).append(i)

    class_partitions: list[list[list[int]]] = []
    for c in sorted(class_indices):
        per_class = partition_dataset(class_indices[c], ratios=ratios, num_partitions=num_partitions,
                                      shuffle=shuffle, seed=seed, drop_last=drop_last,
                                      even_divisible=even_divisible)
        class_partitions.append(per_class)
    n_parts = len(class_partitions[0])
    for part_idx in range(n_parts):
        combined = [i for cp in class_partitions for i in cp[part_idx]]
        if shuffle:
            rs = np.random.RandomState(seed)
            rs.shuffle(combined)
        datasets.append([data[j] for j in combined])
    return datasets


def select_cross_validation_folds(partitions: Sequence[Sequence], folds: Sequence[int] | int) -> list:
    """Concatenate selected folds (reference: data/utils.py:1339)."""
    return [data_item for fold_id in ensure_tuple(folds) for data_item in partitions[fold_id]]


def pickle_hashing(item, protocol=pickle.HIGHEST_PROTOCOL) -> bytes:
    """Deterministic content hash via sorted pickle (reference: data/utils.py:1385)."""
    cache_key = hashlib.md5(pickle.dumps(sorted_dict(item), protocol=protocol), usedforsecurity=False).hexdigest()
    return f"{cache_key}".encode("utf-8")


def json_hashing(item) -> bytes:
    """Deterministic content hash via sorted json (reference: data/utils.py:1405)."""
    cache_key = hashlib.md5(json.dumps(item, sort_keys=True, default=str).encode("utf-8"),
                            usedforsecurity=False).hexdigest()
    return f"{cache_key}".encode("utf-8")


def sorted_dict(item, key=None, reverse=False):
    """Recursively sort dicts (reference: data/utils.py:1375)."""
    if not isinstance(item, dict):
        return item
    return {k: sorted_dict(v) if isinstance(v, dict) else v for k, v in sorted(item.items(), key=key, reverse=reverse)}


from ..utils.enums import TraceKeys

PICKLE_KEY_SUFFIX = TraceKeys.KEY_SUFFIX


def pickle_operations(data, key=PICKLE_KEY_SUFFIX, is_encode: bool = True):
    """Pickle/unpickle `*_transforms` substructures so variable-size applied-operation
    stacks survive (de-)collation across worker processes (reference: data/utils.py:424)."""
    if isinstance(data, dict):
        data = dict(data)
        for k in data:
            if f"{k}".endswith(key):
                if is_encode and not isinstance(data[k], bytes):
                    data[k] = pickle.dumps(data[k], 0)
                if not is_encode and isinstance(data[k], bytes):
                    data[k] = pickle.loads(data[k])
        return {k: pickle_operations(v, key=key, is_encode=is_encode) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return [pickle_operations(item, key=key, is_encode=is_encode) for item in data]
    return data


def is_supported_format(filename, suffixes) -> bool:
    """True if every filename ends with one of the (lower-case) suffixes
    (reference: data/utils.py:1137)."""
    from ..utils.misc import ensure_tuple

    for name in ensure_tuple(filename):
        full_suffix = "".join(map(str.lower, __import__("pathlib").Path(f"{name}").suffixes))
        if all(f".{s.lower()}" not in full_suffix for s in ensure_tuple(suffixes)):
            return False
    return True


def create_file_basename(postfix: str, input_file_name, folder_path,
                         data_root_dir: str = "", separate_folder: bool = True,
                         patch_index=None, makedirs: bool = True) -> str:
    """Compute the output basename preserving the input's folder structure
    (reference: data/utils.py:1008)."""
    import os

    filedir, filename = os.path.split(f"{input_file_name}")
    filename, ext = os.path.splitext(filename)
    if ext == ".gz":
        filename, ext = os.path.splitext(filename)
    filedir_rel_path = ""
    if data_root_dir and filedir:
        filedir_rel_path = os.path.relpath(filedir, data_root_dir)
    output = os.path.join(f"{folder_path}", filedir_rel_path)
    if separate_folder:
        output = os.path.join(output, filename)
    if makedirs:
        os.makedirs(output, exist_ok=True)
    output = os.path.join(output, filename + "_" + postfix if postfix != "" else filename)
    if patch_index is not None:
        output += f"_{patch_index}"
    return os.path.normpath(output)


def resample_datalist(data: Sequence, factor: float, random_pick: bool = False, seed: int = 0):
    """Repeat and/or subsample a datalist by ``factor`` (reference: data/utils.py:1335)."""
    import copy

    scale, repeats = math.modf(factor)
    ret: list = []
    for _ in range(int(repeats)):
        ret.extend(list(copy.deepcopy(data)))
    if scale > 1e-6:
        ret.extend(partition_dataset(data=data, ratios=[scale, 1 - scale],
                                     shuffle=random_pick, seed=seed)[0])
    return ret


def convert_tables_to_dicts(dfs, row_indices=None, col_names=None, col_types=None,
                            col_groups=None, **kwargs) -> list[dict]:
    """Join pandas tables, select rows/cols, and convert to a list of dicts
    (reference: data/utils.py convert_tables_to_dicts)."""
    import pandas as pd

    df = pd.concat(dfs if isinstance(dfs, (list, tuple)) else [dfs], axis=1, **kwargs)
    if row_indices is not None:
        rows: list = []
        for i in row_indices:
            if isinstance(i, (tuple, list)):
                if len(i) != 2:
                    raise ValueError("range of row indices must contain 2 values.")
                rows.extend(list(range(i[0], i[1])))
            else:
                rows.append(i)
        df = df.loc[rows]
    if col_names is not None:
        df = df.loc[:, col_names]
    if isinstance(col_types, dict):
        for col, props in col_types.items():
            if props is None:
                continue
            if "type" in props:
                df[col] = df[col].astype(props["type"])
            if "default" in props:
                df[col] = df[col].fillna(props["default"])
    rows_list = df.to_dict(orient="records")
    if isinstance(col_groups, dict):
        groups = df.copy()
        for name, cols in col_groups.items():
            for row, d in zip(groups.loc[:, cols].values, rows_list):
                d[name] = np.asarray(row)
    return rows_list


def remove_keys(data: dict, keys: list) -> None:
    """Remove keys from a dict in place (reference: data/utils.py:1526)."""
    for k in keys:
        data.pop(k, None)


def get_extra_metadata_keys() -> list:
    """NIfTI header keys that can safely be dropped from metadata
    (reference: data/utils.py:1555)."""
    return [
        "srow_x", "srow_y", "srow_z", "quatern_b", "quatern_c", "quatern_d",
        "qoffset_x", "qoffset_y", "qoffset_z", "dim", "pixdim",
    ] + [f"dim[{i}]" for i in range(8)] + [f"pixdim[{i}]" for i in range(8)]


def remove_extra_metadata(meta: dict) -> None:
    """Drop the unnecessary header keys in place (reference: data/utils.py:1541)."""
    remove_keys(meta, get_extra_metadata_keys())


def collate_meta_tensor_fn(batch, *, collate_fn_map=None):
    """Collate a sequence of MetaImages into one batched MetaImage; the inner
    worker of ``collate_meta_tensor`` (reference: data/utils.py:447)."""
    return collate_meta_tensor(list(batch))


def dev_collate(batch, level: int = 1, logger_name: str = "dev_collate"):
    """Recursively run collate logic with critical-level logging for debugging
    collate failures (reference: data/utils.py:357)."""
    import logging

    elem = batch[0]
    elem_type = type(elem)
    l_str = ">" * level
    batch_str = f"{batch[:10]}{' ... ' if len(batch) > 10 else ''}"
    log = logging.getLogger(logger_name)
    if isinstance(elem, np.ndarray) or is_jax(elem) or isinstance(elem, MetaImage):
        try:
            log.critical(f"{l_str} collate/stack a list of arrays")
            return collate_meta_tensor(list(batch))
        except (TypeError, ValueError) as e:
            log.critical(f"{l_str} E: {e}, shape "
                         f"{[getattr(e_, 'shape', None) for e_ in batch]} in collate({batch_str})")
            return None
    if isinstance(elem, (float, int, str, bytes)):
        return batch
    if isinstance(elem, Mapping):
        out = {}
        for key in elem:
            log.critical(f"{l_str} collate dict key '{key}' out of {len(elem)} keys")
            out[key] = dev_collate([d[key] for d in batch], level=level + 1, logger_name=logger_name)
        return out
    if isinstance(elem, (list, tuple)):
        it = iter(batch)
        elem_size = len(next(it))
        if not all(len(e) == elem_size for e in it):
            log.critical(f"{l_str} E: inconsistent lengths {[len(e) for e in batch]} "
                         f"in collate({batch_str})")
            return None
        return [dev_collate(samples, level=level + 1, logger_name=logger_name)
                for samples in zip(*batch)]
    log.critical(f"{l_str} E: unsupported type {elem_type} in collate({batch_str})")
    return None


def is_no_channel(val) -> bool:
    """Whether ``val`` indicates "no_channel" for MetaKeys.ORIGINAL_CHANNEL_DIM
    (reference: data/utils.py:1589)."""
    if isinstance(val, str):
        return val == "no_channel"
    if val is None:
        return True
    try:
        if np.isscalar(val) or (hasattr(val, "ndim") and val.ndim == 0):
            return bool(np.isnan(np.asarray(val, dtype=np.float64)))
    except (TypeError, ValueError):
        return False
    return False
