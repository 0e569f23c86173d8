"""Exact permutohedral-lattice filtering (Adams, Baek, Davis 2010) — TPU-native.

Reference behavior target: ``monai/csrc/filtering/permutohedral/*`` (the exact
lattice used by PHLFilter for arbitrary feature dimensions). The reference's
CPU/CUDA kernels build a pointer-chasing HASH TABLE of occupied lattice
vertices — a data structure that scalarizes on TPU. This module keeps the
same algorithm (elevate → simplex lookup → splat → [1,2,1] blur along each of
the d+1 lattice directions → slice) but replaces the hash table with sorted
dense arrays, which map onto XLA primitives:

- vertex identification:  lexicographic sort of all N·(d+1) vertex keys
  (one XLA variadic sort) + run-length boundaries → segment ids;
- splat:                  ``jax.ops.segment_sum`` into the unique vertices;
- neighbor lookup (blur): vectorized lexicographic binary search over the
  sorted unique-key table (log2(M) gather/compare rounds — no host loop);
- slice:                  gathers with the barycentric weights.

Everything is static-shaped (the unique-vertex table is padded to M = N·(d+1)
rows with INT32_MAX sentinels), so the whole filter jits and differentiates:
unlike the reference (whose PHL backward raises NotImplementedError) this is
autodiff-able end to end.

Exact invariants preserved from the reference algorithm: identical features
→ every point splats to one simplex and the output is exactly the global
data mean; well-separated feature clusters do not mix; the homogeneous
channel normalization cancels the lattice's constant gain.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["permutohedral_filter"]

_SENTINEL = np.int32(2**31 - 1)


def _elevate(feat: jnp.ndarray) -> jnp.ndarray:
    """Project sigma-scaled features (N, d) onto the hyperplane H_d ⊂ R^{d+1}
    with the variance-matching scaling of the published algorithm."""
    n, d = feat.shape
    inv_std = math.sqrt(2.0 / 3.0) * (d + 1)
    scale = np.array([inv_std / math.sqrt((i + 1) * (i + 2)) for i in range(d)],
                     np.float32)
    cf = feat * scale  # (N, d)
    # elevated[d] = -d*cf[d-1]; elevated[i] = sum_{j>=i} cf[j] - i*cf[i-1]
    # computed as the classic suffix-sum recurrence, vectorized:
    suffix = jnp.cumsum(cf[:, ::-1], axis=1)[:, ::-1]  # suffix[:, i] = Σ_{j>=i} cf[j]
    elevated = jnp.zeros((n, d + 1), jnp.float32)
    elevated = elevated.at[:, 0].set(suffix[:, 0])
    idx = np.arange(1, d + 1, dtype=np.float32)
    tail = jnp.concatenate([suffix[:, 1:], jnp.zeros((n, 1), jnp.float32)], axis=1)
    elevated = elevated.at[:, 1:].set(tail - idx[None, :] * cf)
    return elevated


def _simplex(elevated: jnp.ndarray):
    """Enclosing-simplex lookup: returns vertex keys (N, d+1, d+1) int32 and
    barycentric weights (N, d+1) f32, exactly the published rank/remainder
    construction."""
    n, dp1 = elevated.shape
    d = dp1 - 1
    # nearest 0-colored lattice point (round to nearest multiple of d+1)
    v = elevated / (d + 1)
    rem0 = jnp.round(v) * (d + 1)  # (N, d+1)
    rsum = jnp.sum(rem0, axis=1) / (d + 1)  # integer-valued (N,)
    diff = elevated - rem0
    # rank[i] = #{j : diff[j] > diff[i] or (diff[j] == diff[i] and j < i)}
    gt = diff[:, :, None] < diff[:, None, :]  # gt[n, i, j] = diff[j] > diff[i]
    eq = diff[:, :, None] == diff[:, None, :]
    jlt = np.tril(np.ones((dp1, dp1), bool), k=-1)[None, :, :]  # j < i
    rank = jnp.sum(gt | (eq & jlt), axis=2).astype(jnp.int32)  # (N, d+1)
    rank = rank + rsum.astype(jnp.int32)[:, None]
    rem0 = jnp.where(rank < 0, rem0 + (d + 1), rem0)
    rank = jnp.where(rank < 0, rank + (d + 1), rank)
    rem0 = jnp.where(rank > d, rem0 - (d + 1), rem0)
    rank = jnp.where(rank > d, rank - (d + 1), rank)
    # barycentric coordinates
    dscaled = (elevated - rem0) / (d + 1)  # (N, d+1)
    bary = jnp.zeros((n, d + 2), jnp.float32)
    bary_idx_a = d - rank  # in [0, d]
    bary_idx_b = d + 1 - rank  # in [1, d+1]
    bary = bary.at[jnp.arange(n)[:, None], bary_idx_a].add(dscaled)
    bary = bary.at[jnp.arange(n)[:, None], bary_idx_b].add(-dscaled)
    bary = bary.at[:, 0].add(1.0 + bary[:, d + 1])
    bary = bary[:, : d + 1]  # (N, d+1)
    # canonical simplex offsets: key_k[i] = rem0[i] + (k if rank[i] <= d-k else k-(d+1))
    k = np.arange(dp1, dtype=np.int32)[None, :, None]  # (1, d+1 vertices, 1)
    rank_e = rank[:, None, :]  # (N, 1, d+1 dims)
    offs = jnp.where(rank_e <= d - k, k, k - (d + 1))  # (N, d+1, d+1)
    keys = rem0.astype(jnp.int32)[:, None, :] + offs  # (N, vertex, dim)
    return keys, bary


def _lex_less(rows: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """rows (Q, K) lexicographically < q (Q, K), elementwise over Q."""
    neq = rows != q
    any_neq = jnp.any(neq, axis=1)
    first = jnp.argmax(neq, axis=1)
    r = jnp.take_along_axis(rows, first[:, None], 1)[:, 0]
    qq = jnp.take_along_axis(q, first[:, None], 1)[:, 0]
    return jnp.where(any_neq, r < qq, False)


def _lex_find(table: jnp.ndarray, u: jnp.ndarray, queries: jnp.ndarray):
    """Vectorized lexicographic binary search. table: (M, K) sorted rows
    (rows >= u are _SENTINEL padding); queries: (Q, K). Returns (idx, found)."""
    m = table.shape[0]
    q = queries.shape[0]
    lo = jnp.zeros((q,), jnp.int32)
    hi = jnp.full((q,), u, jnp.int32)
    steps = int(math.ceil(math.log2(max(m, 2)))) + 1

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        rows = table[mid]  # (Q, K)
        less = _lex_less(rows, queries)
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = jnp.clip(lo, 0, m - 1)
    found = jnp.all(table[idx] == queries, axis=1) & (lo < u)
    return idx, found


def _filter_one(x: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
    """x: (C, N) values; feat: (F, N) sigma-scaled features → (C, N)."""
    c, n = x.shape
    d = feat.shape[0]
    dp1 = d + 1
    elevated = _elevate(feat.T.astype(jnp.float32))
    keys, bary = _simplex(elevated)  # (N, d+1, d+1), (N, d+1)
    m = n * dp1
    keys_flat = keys.reshape(m, dp1)
    # homogeneous channel → the lattice's constant gain cancels at normalize
    vals = jnp.concatenate([x, jnp.ones((1, n), x.dtype)], axis=0)  # (C+1, N)
    w_vals = vals[None, :, :] * bary.T[:, None, :]  # (d+1, C+1, N)
    w_flat = w_vals.transpose(2, 0, 1).reshape(m, c + 1)  # row-major (point, vertex)

    # sort all splat rows by key (column 0 = primary)
    order = jnp.lexsort(tuple(keys_flat[:, i] for i in range(dp1 - 1, -1, -1)))
    sk = keys_flat[order]
    new = jnp.any(sk != jnp.concatenate([jnp.full((1, dp1), _SENTINEL), sk[:-1]]), axis=1)
    seg = jnp.cumsum(new.astype(jnp.int32)) - 1  # (M,) in [0, U)
    u = seg[-1] + 1
    vertex_vals = jax.ops.segment_sum(w_flat[order], seg, num_segments=m)  # (M, C+1)
    table = jnp.full((m, dp1), _SENTINEL, jnp.int32).at[seg].set(sk)

    # blur [1, 2, 1] along each of the d+1 lattice directions; missing
    # neighbors contribute zero (same as the reference's hash-miss semantics)
    for j in range(dp1):
        n1 = (table + 1).at[:, j].add(-(dp1))
        n2 = (table - 1).at[:, j].add(dp1)
        i1, ok1 = _lex_find(table, u, n1)
        i2, ok2 = _lex_find(table, u, n2)
        v1 = jnp.where(ok1[:, None], vertex_vals[i1], 0.0)
        v2 = jnp.where(ok2[:, None], vertex_vals[i2], 0.0)
        vertex_vals = 0.5 * vertex_vals + 0.25 * (v1 + v2)

    # slice: gather each point's d+1 vertices back with barycentric weights
    inv = jnp.zeros((m,), jnp.int32).at[order].set(jnp.arange(m, dtype=jnp.int32))
    seg_of_row = seg[inv].reshape(n, dp1)
    gathered = vertex_vals[seg_of_row]  # (N, d+1, C+1)
    out = jnp.sum(gathered * bary[:, :, None], axis=1)  # (N, C+1)
    num = out[:, :c].T
    hom = out[:, c]
    return num / jnp.maximum(hom, 1e-8)[None, :]


def permutohedral_filter(data: jnp.ndarray, features: jnp.ndarray,
                         sigmas=None) -> jnp.ndarray:
    """Exact permutohedral-lattice Gaussian filtering for arbitrary feature
    dimension (reference: PHLFilter / csrc/filtering/permutohedral).

    ``features[:, i]`` is divided by ``sigmas[i]``; filtering approximates the
    unit Gaussian ``W_ij = exp(-|f'_i - f'_j|^2 / 2)`` in the scaled feature
    space via the lattice's splat / [1,2,1]-blur / slice pipeline.

    data: (B, C, *spatial); features: (B, F, *spatial). Memory is
    O(N·(F+1)·(F+1)) int32 for the key table — at F=16, N=64³ that is ~300 MB;
    prefer ``phl_filter``'s grid path for F ≤ 5.
    """
    data = jnp.asarray(data)
    features = jnp.asarray(features, jnp.float32)
    b, c = data.shape[:2]
    f = features.shape[1]
    spatial = data.shape[2:]
    n = int(np.prod(spatial))
    if sigmas is not None:
        sig = jnp.asarray(sigmas, jnp.float32).reshape((1, f) + (1,) * len(spatial))
        features = features / sig
    out = jax.vmap(_filter_one)(data.reshape(b, c, n).astype(jnp.float32),
                                features.reshape(b, f, n))
    return out.reshape(data.shape).astype(data.dtype)
