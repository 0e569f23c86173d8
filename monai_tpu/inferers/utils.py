"""sliding_window_inference — TPU-native window-batched patch inference.

Parity target: monai/inferers/utils.py:42-321.

TPU design (vs the reference's Python loop over window batches):
- the scan grid is precomputed on host (dense_patch_slices);
- the whole stitch runs inside ONE jit: `lax.scan` over window chunks, each chunk
  gathered with `dynamic_slice`, batched through the network, weighted by the
  Gaussian importance map and accumulated with `dynamic_update_slice`
  read-modify-write;
- window count is padded to a multiple of sw_batch_size with zero-weight dummy
  windows, keeping shapes static (one compilation per image-shape bucket).

Caching correctness: everything that can vary between calls with the same shapes —
the window grid, the importance map (sigma_scale / roi_weight_map), array-valued
predictor ``*args``/``**kwargs``, and (for ``nnx.Module`` predictors) the network
weights — is passed INTO the jitted program as arguments, never baked in as traced
constants. Non-array args/kwargs are static and participate in the cache key.
The one remaining caveat: a plain-callable predictor that closes over arrays bakes
them in; pass an ``nnx.Module`` (weights become jit arguments) or route changing
arrays through ``args``/``kwargs`` instead.
"""
from __future__ import annotations

import os

from collections.abc import Callable, Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..data.meta_image import MetaImage
from ..data.utils import compute_importance_map, dense_patch_slices, get_valid_patch_size
from ..utils.backend import to_jax
from ..utils.enums import BlendMode
from ..utils.misc import ensure_tuple_rep, fall_back_tuple

__all__ = ["sliding_window_inference", "compute_scan_interval"]

_SW_JIT_CACHE: dict = {}
_SW_JIT_CACHE_MAX = 32
# device copies of the (deterministic) window grid / mask / importance map, so
# repeated calls don't re-upload megabytes over a remote-tunnel TPU every volume
_SW_CONST_CACHE: dict = {}
# host-side per-call work that is pure in the config (importance-map numpy
# passes over roi^3, the dense window grid, the predictor's eval_shape trace)
# measured ~13 ms/call on this host — significant against a ~35 ms device
# program, so each is memoized (perf_sw_overhead.py)
_SW_HOST_CACHE: dict = {}


def _host_memo(key, builder):
    val = _SW_HOST_CACHE.get(key)
    if val is None:
        val = builder()
        _SW_HOST_CACHE[key] = val
        if len(_SW_HOST_CACHE) > 4 * _SW_JIT_CACHE_MAX:
            _SW_HOST_CACHE.pop(next(iter(_SW_HOST_CACHE)))
    return val


def compute_scan_interval(image_size: Sequence[int], roi_size: Sequence[int], num_spatial_dims: int,
                          overlap: Sequence[float]) -> tuple:
    """Scan interval per dim (reference: inferers/utils.py:—)."""
    scan_interval = []
    for i, o in zip(range(num_spatial_dims), overlap):
        if roi_size[i] == image_size[i]:
            scan_interval.append(int(roi_size[i]))
        else:
            interval = int(roi_size[i] * (1 - o))
            scan_interval.append(interval if interval > 0 else 1)
    return tuple(scan_interval)


def _split_dynamic_args(args: tuple, kwargs: dict):
    """Partition predictor (args, kwargs) into array leaves (passed through jit as
    arguments) and static leaves (baked into the trace, keyed in the cache)."""
    leaves, treedef = jax.tree_util.tree_flatten((tuple(args), dict(kwargs)))
    dyn_idx, dyn_leaves, fixed = [], [], []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, (jax.Array, np.ndarray)):
            dyn_idx.append(i)
            dyn_leaves.append(leaf)
            fixed.append(None)
        else:
            fixed.append(leaf)
    static_sig = (treedef, tuple(dyn_idx),
                  tuple(repr(l) for i, l in enumerate(fixed) if i not in dyn_idx))

    def rebuild(dyn):
        merged = list(fixed)
        for j, i in enumerate(dyn_idx):
            merged[i] = dyn[j]
        return jax.tree_util.tree_unflatten(treedef, merged)

    return dyn_leaves, rebuild, static_sig


def _make_call_pred(predictor: Callable, rebuild):
    """Return (call(state, wins, dyn), state) where state carries the nnx module
    weights as a jit argument (None for plain callables)."""
    if isinstance(predictor, nnx.Module):
        graphdef, pred_state = nnx.split(predictor)

        def call(state, wins, dyn):
            a, k = rebuild(dyn)
            return nnx.merge(graphdef, state)(wins, *a, **k)

        return call, pred_state

    def call(state, wins, dyn):
        a, k = rebuild(dyn)
        return predictor(wins, *a, **k)

    return call, None


def _cache_get(key, builder):
    jitted = _SW_JIT_CACHE.get(key)
    if jitted is None:
        jitted = jax.jit(builder)
        _SW_JIT_CACHE[key] = jitted
        if len(_SW_JIT_CACHE) > _SW_JIT_CACHE_MAX:
            _SW_JIT_CACHE.pop(next(iter(_SW_JIT_CACHE)))
    return jitted


# windows; above this the dynamic lax.scan path is used. Overridable for A/B
# benchmarking via MONAI_TPU_SW_STATIC_LIMIT (0 disables the static path).
_SW_STATIC_UNROLL_LIMIT = int(os.environ.get("MONAI_TPU_SW_STATIC_LIMIT", "0"))
_SW_INV_COUNT_CACHE: dict = {}


def _sw_inv_count(const_key, out_spatial, out_roi, imp, zoom, starts_st, mask_st,
                  n_chunks, sw_batch_size, num_spatial_dims, o_start_fn):
    """Reciprocal of the Gaussian-blend count map. The count map only depends on the
    window grid and the importance map (never on the data), so it is computed once on
    the host and cached per sliding-window config."""
    key = (const_key, tuple(out_spatial))
    inv = _SW_INV_COUNT_CACHE.get(key)
    if inv is None:
        # pure-numpy (this may run at TRACE time inside an outer jit/shard_map, so no
        # eager jax ops are allowed here)
        imp_w = np.asarray(imp, dtype=np.float32)
        if zoom:
            imp_w = _np_linear_resize(imp_w, out_roi)
        count = np.zeros(out_spatial, dtype=np.float32)
        for c in range(n_chunks):
            for i in range(sw_batch_size):
                if mask_st[c, i] == 0.0:
                    continue
                o_idx = o_start_fn(starts_st[c, i])
                sl = tuple(slice(o_idx[d], o_idx[d] + out_roi[d]) for d in range(num_spatial_dims))
                count[sl] += imp_w
        inv = (1.0 / np.maximum(count, 1e-8))[None, None]
        _SW_INV_COUNT_CACHE[key] = inv
        if len(_SW_INV_COUNT_CACHE) > _SW_JIT_CACHE_MAX:
            _SW_INV_COUNT_CACHE.pop(next(iter(_SW_INV_COUNT_CACHE)))
    return inv


def _np_linear_resize(arr: np.ndarray, out_shape) -> np.ndarray:
    """Numpy equivalent of jax.image.resize(..., method="linear"): half-pixel-center
    linear interpolation, one axis at a time."""
    out = arr.astype(np.float32)
    for ax, n_out in enumerate(out_shape):
        n_in = out.shape[ax]
        if n_in == n_out:
            continue
        scale = n_in / n_out
        coords = (np.arange(n_out, dtype=np.float32) + 0.5) * scale - 0.5
        lo = np.clip(np.floor(coords).astype(np.int64), 0, n_in - 1)
        hi = np.clip(lo + 1, 0, n_in - 1)
        w = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
        a = np.take(out, lo, axis=ax)
        b = np.take(out, hi, axis=ax)
        shape = [1] * out.ndim
        shape[ax] = n_out
        w = w.reshape(shape)
        out = a * (1 - w) + b * w
    return out


def sliding_window_inference(inputs: Any, roi_size: Sequence[int] | int, sw_batch_size: int,
                             predictor: Callable, overlap: Sequence[float] | float = 0.25,
                             mode: str = BlendMode.CONSTANT, sigma_scale: Sequence[float] | float = 0.125,
                             padding_mode: str = "constant", cval: float = 0.0, sw_device=None,
                             device=None, progress: bool = False, roi_weight_map=None,
                             process_fn=None, buffer_steps: int | None = None, buffer_dim: int = -1,
                             *args, **kwargs):
    """Run ``predictor`` over sliding windows and stitch (reference: inferers/utils.py:42)."""
    is_meta = isinstance(inputs, MetaImage)
    x = to_jax(inputs.data if is_meta else inputs)
    num_spatial_dims = x.ndim - 2
    batch_size = x.shape[0]
    image_size_ = x.shape[2:]
    overlap_ = ensure_tuple_rep(overlap, num_spatial_dims)
    for o in overlap_:
        if o < 0 or o >= 1:
            raise ValueError(f"overlap must be >= 0 and < 1, got {overlap}.")
    roi_size_ = fall_back_tuple(roi_size, image_size_)

    # pad input if roi is larger than image (symmetric, reference :164-170)
    image_size = tuple(max(image_size_[i], roi_size_[i]) for i in range(num_spatial_dims))
    pad_width = [(0, 0), (0, 0)]
    any_pad = False
    for k in range(num_spatial_dims):
        diff = max(roi_size_[k] - image_size_[k], 0)
        half = diff // 2
        pad_width.append((half, diff - half))
        any_pad = any_pad or diff > 0
    if any_pad:
        np_mode = {"constant": "constant", "zeros": "constant", "edge": "edge", "replicate": "edge",
                   "reflect": "reflect", "reflection": "reflect", "circular": "wrap"}.get(str(padding_mode), "constant")
        if np_mode == "constant":
            x = jnp.pad(x, pad_width, mode="constant", constant_values=cval)
        else:
            x = jnp.pad(x, pad_width, mode=np_mode)

    scan_interval = compute_scan_interval(image_size, roi_size_, num_spatial_dims, overlap_)
    starts = _host_memo(
        ("starts", tuple(image_size), tuple(roi_size_), scan_interval),
        lambda: np.asarray(
            [[s[0] for s in sl] for sl in
             dense_patch_slices(image_size, roi_size_, scan_interval, return_slice=False)],
            dtype=np.int32))  # (N, D)
    num_win = starts.shape[0]

    # importance map (host-computed, passed into the jit as an argument)
    valid_patch = get_valid_patch_size(image_size, roi_size_)
    if roi_weight_map is not None and tuple(roi_weight_map.shape) == tuple(valid_patch):
        imp = np.asarray(roi_weight_map, dtype=np.float32)  # user maps pass through unclamped
    else:
        # gaussian maps are min-clamped at 1e-3 inside compute_importance_map (ref parity)
        imp = _host_memo(
            ("imp", tuple(valid_patch), str(mode),
             tuple(ensure_tuple_rep(sigma_scale, num_spatial_dims))),
            lambda: compute_importance_map(valid_patch, mode=mode, sigma_scale=sigma_scale,
                                           dtype=np.float32))

    # pad window list to a multiple of sw_batch_size with zero-weight dummies
    n_chunks = -(-num_win // sw_batch_size)
    pad_n = n_chunks * sw_batch_size - num_win
    win_mask = np.ones(num_win + pad_n, dtype=np.float32)
    if pad_n:
        starts = np.concatenate([starts, np.repeat(starts[-1:], pad_n, axis=0)], axis=0)
        win_mask[num_win:] = 0.0
    # starts/mask/imp are fully determined by these config values; reuse device copies
    const_key = (tuple(image_size), tuple(roi_size_), tuple(overlap_), sw_batch_size,
                 str(mode), tuple(ensure_tuple_rep(sigma_scale, num_spatial_dims)),
                 None if roi_weight_map is None else id(roi_weight_map))
    consts = _SW_CONST_CACHE.get(const_key)
    if consts is None:
        consts = (jnp.asarray(starts.reshape(n_chunks, sw_batch_size, num_spatial_dims)),
                  jnp.asarray(win_mask.reshape(n_chunks, sw_batch_size)),
                  jnp.asarray(imp))
        _SW_CONST_CACHE[const_key] = consts
        if len(_SW_CONST_CACHE) > _SW_JIT_CACHE_MAX:
            _SW_CONST_CACHE.pop(next(iter(_SW_CONST_CACHE)))
    starts_j, mask_j, imp_j = consts

    dyn_leaves, rebuild, static_sig = _split_dynamic_args(args, kwargs)
    call_pred, pred_state = _make_call_pred(predictor, rebuild)

    # infer output channels/shape with eval_shape (no FLOPs); memoized — tracing
    # the predictor costs several ms per call on a slow host
    win_shape = (batch_size * sw_batch_size, x.shape[1]) + tuple(roi_size_)
    out_aval = _host_memo(
        ("aval", id(predictor), win_shape, x.dtype.name, static_sig),
        lambda: jax.eval_shape(call_pred, pred_state,
                               jax.ShapeDtypeStruct(win_shape, x.dtype), dyn_leaves))
    out_leaves, out_treedef = jax.tree_util.tree_flatten(out_aval)
    if not (len(out_leaves) == 1 and jax.tree_util.treedef_is_leaf(out_treedef)):
        # pytree-output predictors (e.g. HoVerNet's NP/HV/NC dict): one
        # accumulator per leaf, single forward per chunk (reference:
        # inferers/utils.py:42 handles tuple/dict seg_prob_out the same way)
        return _sliding_window_multi(
            x, inputs, call_pred, pred_state, dyn_leaves, static_sig, predictor,
            out_leaves, out_treedef, batch_size, num_spatial_dims, roi_size_,
            sw_batch_size, starts_j, mask_j, imp_j, image_size, image_size_, any_pad,
            pad_width, overlap_, mode, num_win, is_meta)
    out_channels = out_aval.shape[1]
    out_roi = out_aval.shape[2:]
    if tuple(out_roi) != tuple(roi_size_):
        zoom = [o / r for o, r in zip(out_roi, roi_size_)]
    else:
        zoom = None

    out_spatial = tuple(int(round(s * (out_roi[i] / roi_size_[i]))) for i, s in enumerate(image_size)) \
        if zoom else image_size

    compute_dtype = out_aval.dtype

    # the whole gather→forward→stitch pipeline must be ONE compiled program: eager
    # per-op dispatch (especially via a remote TPU tunnel) is orders of magnitude slower
    cache_key = (id(predictor), x.shape, x.dtype.name, tuple(roi_size_), sw_batch_size,
                 tuple(overlap_), str(mode), num_win, static_sig)

    # The normalisation count map is data-independent, so it is precomputed on host
    # once per config and the in-scan count accumulation is skipped entirely.
    # A fully static-unrolled gather/scatter variant exists behind
    # MONAI_TPU_SW_STATIC_LIMIT, but A/B on v5e measured it 3x SLOWER than the
    # dynamic_update_slice scan (XLA aliases the DUS carry in place, while the
    # unrolled static slice-add chain serialises), so the default is the scan.
    use_static = 0 < (num_win + pad_n) <= _SW_STATIC_UNROLL_LIMIT
    starts_st = starts.reshape(n_chunks, sw_batch_size, num_spatial_dims)
    mask_st = win_mask.reshape(n_chunks, sw_batch_size)

    def _o_start(st):
        if zoom:
            return tuple(int(round(int(st[d]) * zoom[d])) for d in range(num_spatial_dims))
        return tuple(int(st[d]) for d in range(num_spatial_dims))

    def _run_static(x_in, imp_a, state_a, dyn_a):
        out_img = jnp.zeros((batch_size, out_channels) + out_spatial, dtype=compute_dtype)
        imp_w = jax.image.resize(imp_a, out_roi, method="linear") if zoom else imp_a
        for c in range(n_chunks):
            # concatenate (not stack+reshape): keeps the gather 5-D end to end
            wins = jnp.concatenate([
                jax.lax.slice(
                    x_in,
                    (0, 0) + tuple(int(v) for v in starts_st[c, i]),
                    (batch_size, x_in.shape[1]) + tuple(int(starts_st[c, i][d]) + roi_size_[d]
                                                        for d in range(num_spatial_dims)))
                for i in range(sw_batch_size)], axis=0)
            preds = call_pred(state_a, wins, dyn_a)
            # keep everything 5-D (sw*B, C, *roi): a 6-D (sw, B, C, *roi) view makes
            # XLA pick a layout with the tiny B/C dims minor-most, padding HBM ~7x
            weighted = preds * imp_w[None, None].astype(compute_dtype)
            for i in range(sw_batch_size):
                if mask_st[c, i] == 0.0:
                    continue  # zero-weight pad window: skip entirely (static decision)
                o_idx = _o_start(starts_st[c, i])
                sl = (slice(None), slice(None)) + tuple(
                    slice(o_idx[d], o_idx[d] + out_roi[d]) for d in range(num_spatial_dims))
                out_img = out_img.at[sl].add(weighted[i * batch_size:(i + 1) * batch_size])
        inv = _sw_inv_count(const_key, out_spatial, out_roi, imp, zoom, starts_st, mask_st,
                            n_chunks, sw_batch_size, num_spatial_dims, _o_start)
        return out_img * inv.astype(compute_dtype)

    # ---- separable overlap-add stitch (TPU fast path) -------------------------
    # dense_patch_slices scans a product grid, so the Gaussian-blended scatter-add
    # decomposes into one 0/1 placement matmul per axis — three MXU einsums instead
    # of num_windows serialized dynamic_update_slice read-modify-writes.
    axis_starts = [sorted(set(int(s) for s in starts[:num_win, d]))
                   for d in range(num_spatial_dims)]
    grid_shape = tuple(len(a) for a in axis_starts)
    separable = (num_spatial_dims == 3 and int(np.prod(grid_shape)) == num_win
                 and zoom is None)
    if separable:
        # row-major window order check: window w -> grid index per axis
        grid_idx = np.stack([[axis_starts[d].index(int(starts[w, d]))
                              for d in range(num_spatial_dims)]
                             for w in range(num_win)], axis=0)
        expect = np.ravel_multi_index(grid_idx.T, grid_shape)
        perm = np.argsort(expect, kind="stable")
        separable = len(set(expect.tolist())) == num_win
    if separable:
        placements = []
        for d in range(num_spatial_dims):
            P = np.zeros((grid_shape[d], roi_size_[d], out_spatial[d]), np.float32)
            for g, st0 in enumerate(axis_starts[d]):
                P[g, np.arange(roi_size_[d]), st0 + np.arange(roi_size_[d])] = 1.0
            placements.append(P)
        pl_key = const_key + ("placements",)
        pl_consts = _SW_CONST_CACHE.get(pl_key)
        if pl_consts is None:
            pl_consts = tuple(jnp.asarray(P) for P in placements)
            _SW_CONST_CACHE[pl_key] = pl_consts
        perm_j = None if np.array_equal(perm, np.arange(num_win)) else jnp.asarray(perm)

    def _run(x_in, starts_a, mask_a, imp_a, state_a, dyn_a):
        imp_w = jax.image.resize(imp_a, out_roi, method="linear") if zoom else imp_a

        def chunk_fwd(carry, chunk):
            starts_c, mask_c = chunk  # (sw, D), (sw,)

            def gather_one(st):
                idx = (0, 0) + tuple(st[d] for d in range(num_spatial_dims))
                return jax.lax.dynamic_slice(x_in, idx, (batch_size, x_in.shape[1]) + tuple(roi_size_))

            wins = jax.vmap(gather_one)(starts_c)  # (sw, B, C, *roi)
            wins = wins.reshape((sw_batch_size * batch_size, x_in.shape[1]) + tuple(roi_size_))
            preds = call_pred(state_a, wins, dyn_a)
            preds = preds.reshape((sw_batch_size, batch_size, out_channels) + tuple(out_roi))
            weighted = preds * imp_w[None, None, None].astype(compute_dtype) * mask_c.reshape(
                (sw_batch_size,) + (1,) * (preds.ndim - 1)).astype(compute_dtype)
            return carry, weighted

        if separable:
            # forward all chunks, stack, then one separable overlap-add
            _, weighted_all = jax.lax.scan(chunk_fwd, 0, (starts_a, mask_a))
            w = weighted_all.reshape((n_chunks * sw_batch_size, batch_size, out_channels)
                                     + tuple(out_roi))[:num_win]
            if perm_j is not None:
                w = w[perm_j]
            g1 = grid_shape
            w = w.reshape(g1 + (batch_size, out_channels) + tuple(out_roi))
            P1, P2, P3 = pl_consts[0], pl_consts[1], pl_consts[2]
            ct = compute_dtype
            # contract one (grid axis, roi axis) pair at a time; each is a matmul
            out = jnp.einsum("abcBCxyz,czW->abBCxyW", w, P3.astype(ct))
            out = jnp.einsum("abBCxyW,byH->aBCxHW", out, P2.astype(ct))
            out_img = jnp.einsum("aBCxHW,axD->BCDHW", out, P1.astype(ct))
        else:
            out_img0 = jnp.zeros((batch_size, out_channels) + out_spatial, dtype=compute_dtype)

            def chunk_body(out_acc, chunk):
                starts_c, mask_c = chunk
                _, weighted = chunk_fwd(0, chunk)

                def scatter_one(i, out_a):
                    st = starts_c[i]
                    if zoom:
                        o_idx = tuple(jnp.round(st[d] * zoom[d]).astype(jnp.int32)
                                      for d in range(num_spatial_dims))
                    else:
                        o_idx = tuple(st[d] for d in range(num_spatial_dims))
                    idx_full = (0, 0) + o_idx
                    cur = jax.lax.dynamic_slice(
                        out_a, idx_full, (batch_size, out_channels) + tuple(out_roi))
                    return jax.lax.dynamic_update_slice(out_a, cur + weighted[i], idx_full)

                return jax.lax.fori_loop(0, sw_batch_size, scatter_one, out_acc), None

            out_img, _ = jax.lax.scan(chunk_body, out_img0, (starts_a, mask_a))
        inv = _sw_inv_count(const_key, out_spatial, out_roi, imp, zoom, starts_st, mask_st,
                            n_chunks, sw_batch_size, num_spatial_dims, _o_start)
        return out_img * inv.astype(compute_dtype)

    if use_static:
        jitted = _cache_get(cache_key + ("static",), _run_static)
        output = jitted(x, imp_j, pred_state, dyn_leaves)
    else:
        jitted = _cache_get(cache_key, _run)
        output = jitted(x, starts_j, mask_j, imp_j, pred_state, dyn_leaves)

    # crop away the symmetric pad
    if any_pad:
        crop_slices = [slice(None), slice(None)]
        for k in range(num_spatial_dims):
            lo = pad_width[2 + k][0]
            crop_slices.append(slice(int(round(lo * (zoom[k] if zoom else 1))),
                                     int(round((lo + image_size_[k]) * (zoom[k] if zoom else 1)))))
        output = output[tuple(crop_slices)]

    if is_meta:
        out_m = inputs.new_like(output)
        out_m.is_batch = inputs.is_batch
        return out_m
    return output


def _sliding_window_multi(x, inputs, call_pred, pred_state, dyn_leaves, static_sig,
                          predictor, out_leaves, out_treedef, batch_size,
                          num_spatial_dims, roi_size_, sw_batch_size,
                          starts_j, mask_j, imp_j, image_size, image_size_, any_pad,
                          pad_width, overlap_, mode, num_win, is_meta):
    """Stitch loop for predictors returning a pytree of arrays (dict/tuple heads).

    Same gather→forward→weighted-scatter pipeline as the single-array path, but
    with one (accumulator, count) pair per output leaf; the network runs once per
    window chunk and every head is blended with the shared importance map
    (per-head resize when a head's spatial size differs from the window)."""
    n_leaves = len(out_leaves)
    chans = [l.shape[1] for l in out_leaves]
    rois = [tuple(l.shape[2:]) for l in out_leaves]
    zooms = [None if r == tuple(roi_size_) else [o / rr for o, rr in zip(r, roi_size_)]
             for r in rois]
    spatials = [tuple(int(round(s * (rois[i][k] / roi_size_[k]))) for k, s in enumerate(image_size))
                if zooms[i] else tuple(image_size) for i in range(n_leaves)]
    dtypes = [l.dtype for l in out_leaves]

    def _run(x_in, starts_a, mask_a, imp_a, state_a, dyn_a):
        outs = tuple(jnp.zeros((batch_size, chans[i]) + spatials[i], dtype=dtypes[i])
                     for i in range(n_leaves))
        cnts = tuple(jnp.zeros((1, 1) + spatials[i], dtype=jnp.float32) for i in range(n_leaves))
        imp_ws = [jax.image.resize(imp_a, rois[i], method="linear") if zooms[i] else imp_a
                  for i in range(n_leaves)]

        def chunk_body(carry, chunk):
            outs_a, cnts_a = carry
            starts_c, mask_c = chunk

            def gather_one(st):
                idx = (0, 0) + tuple(st[d] for d in range(num_spatial_dims))
                return jax.lax.dynamic_slice(x_in, idx, (batch_size, x_in.shape[1]) + tuple(roi_size_))

            wins = jax.vmap(gather_one)(starts_c)
            wins = wins.reshape((sw_batch_size * batch_size, x_in.shape[1]) + tuple(roi_size_))
            preds_leaves = jax.tree_util.tree_leaves(call_pred(state_a, wins, dyn_a))
            new_outs, new_cnts = [], []
            for li in range(n_leaves):
                preds = preds_leaves[li].reshape((sw_batch_size, batch_size, chans[li]) + rois[li])
                imp_w = imp_ws[li]
                weighted = preds * imp_w[None, None, None].astype(dtypes[li]) * mask_c.reshape(
                    (sw_batch_size,) + (1,) * (preds.ndim - 1)).astype(dtypes[li])

                def scatter_one(i, carry2, li=li, weighted=weighted, imp_w=imp_w):
                    out_a, cnt_a = carry2
                    st = starts_c[i]
                    if zooms[li]:
                        o_idx = tuple(jnp.round(st[d] * zooms[li][d]).astype(jnp.int32)
                                      for d in range(num_spatial_dims))
                    else:
                        o_idx = tuple(st[d] for d in range(num_spatial_dims))
                    idx_full = (0, 0) + o_idx
                    cur = jax.lax.dynamic_slice(out_a, idx_full, (batch_size, chans[li]) + rois[li])
                    out_a = jax.lax.dynamic_update_slice(out_a, cur + weighted[i], idx_full)
                    cur_c = jax.lax.dynamic_slice(cnt_a, idx_full[:2] + o_idx, (1, 1) + rois[li])
                    contrib = (imp_w * mask_c[i]).astype(jnp.float32)[None, None]
                    cnt_a = jax.lax.dynamic_update_slice(cnt_a, cur_c + contrib, idx_full[:2] + o_idx)
                    return out_a, cnt_a

                o, c = jax.lax.fori_loop(0, sw_batch_size, scatter_one, (outs_a[li], cnts_a[li]))
                new_outs.append(o)
                new_cnts.append(c)
            return (tuple(new_outs), tuple(new_cnts)), None

        (outs, cnts), _ = jax.lax.scan(chunk_body, (outs, cnts), (starts_a, mask_a))
        return tuple(o / jnp.maximum(c, 1e-8).astype(o.dtype) for o, c in zip(outs, cnts))

    cache_key = (id(predictor), x.shape, x.dtype.name, tuple(roi_size_), sw_batch_size,
                 tuple(overlap_), str(mode), num_win, static_sig, "multi")
    jitted = _cache_get(cache_key, _run)
    outputs = jitted(x, starts_j, mask_j, imp_j, pred_state, dyn_leaves)

    results = []
    for li, o in enumerate(outputs):
        if any_pad:
            cs = [slice(None), slice(None)]
            z = zooms[li]
            for k in range(num_spatial_dims):
                lo = pad_width[2 + k][0]
                cs.append(slice(int(round(lo * (z[k] if z else 1))),
                                int(round((lo + image_size_[k]) * (z[k] if z else 1)))))
            o = o[tuple(cs)]
        results.append(o)
    return jax.tree_util.tree_unflatten(out_treedef, results)
