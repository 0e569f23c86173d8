"""N-D grid resampling (pull/push) — the framework's hottest kernel.

TPU-native replacement for the reference's C++/CUDA pushpull resampler
(monai/csrc/resample/pushpull_cpu.cpp, pushpull_cuda.cu; bound via
monai/networks/layers/spatial_transforms.py:35 grid_pull / grid_push) and for torch
``grid_sample`` (used by monai/transforms/spatial/functional.py:161-173).

Design: gather-based separable interpolation written against the numpy/jax.numpy shared
subset, so one implementation serves the host pipeline (numpy) and jitted device code
(XLA fuses the 2^D corner gathers + weighted sum).  ``grid_push`` is the adjoint (splat)
implemented with scatter-add; together they give exact custom gradients.

Coordinate convention: ``grid`` holds **voxel coordinates of the input** (not normalized
[-1, 1] like torch); the affine helpers below produce output-voxel → input-voxel maps.

Supported: spline orders 0-7 (order 3 defaults to torch's Keys cubic; B-spline via
interpolation="bspline") x all 8 reference bound modes (zero / replicate / dct1 /
dct2 / dst1 / dst2 / dft / sliding), plus per-dimension bound tuples.
"""
from __future__ import annotations

import itertools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.backend import is_jax, xp

__all__ = ["grid_pull", "grid_push", "grid_count", "affine_grid", "affine_resample",
           "resolve_mode", "resolve_bound"]

_ORDER = {"nearest": 0, "nearest-exact": 0, 0: 0, "bilinear": 1, "linear": 1,
          "trilinear": 1, 1: 1,
          # torch 'area' (box-filter downsample) has no spline equivalent; linear is
          # the closest sampling approximation for the zoom factors used in practice
          "area": 1,
          "quadratic": 2, 2: 2, "bicubic": 3, "cubic": 3, 3: 3,
          "fourth": 4, 4: 4, "fifth": 5, 5: 5, "sixth": 6, 6: 6, "seventh": 7, 7: 7}

# the reference's 8 boundary modes (monai/csrc/ext.cpp:35-75 BoundType) + torch names
_BOUND_ALIASES = {
    "zeros": "zero", "zero": "zero", "constant": "zero",
    "border": "replicate", "replicate": "replicate", "nearest": "replicate",
    "reflection": "dct2", "reflect": "dct2", "dct2": "dct2",
    "mirror": "dct1", "dct1": "dct1",
    "antireflect": "dst2", "dst2": "dst2",
    "antimirror": "dst1", "dst1": "dst1",
    "wrap": "dft", "circular": "dft", "dft": "dft",
    "sliding": "sliding",
}


def resolve_mode(mode: Any) -> int:
    """Map a mode name/order to an integer spline order."""
    if mode in _ORDER:
        return _ORDER[mode]
    raise ValueError(f"Unsupported interpolation mode: {mode!r}")


def resolve_bound(bound: Any):
    """Canonicalize a boundary-mode name (reference: csrc BoundType).

    A list/tuple gives dimension-specific bounds in spatial order (reference:
    spatial_transforms.py:93 "A list of values can be provided, in the order
    [W, H, D]"); 'sliding' applies per-component flow-field handling and cannot
    be dimension-specific (spatial_transforms.py:94-95)."""
    if isinstance(bound, (list, tuple)):
        resolved = tuple(resolve_bound(b) for b in bound)
        if "sliding" in resolved:
            raise ValueError("'sliding' cannot be combined with per-dimension bounds "
                             "(reference: spatial_transforms.py:95).")
        return resolved
    key = str(bound).lower()
    if key in _BOUND_ALIASES:
        return _BOUND_ALIASES[key]
    raise ValueError(f"Unsupported bound mode: {bound!r}")


def _bound_tap_generic(idx, n: int, bound: str, align_corners: bool, ns):
    """Map integer tap indices into [0, n-1] per boundary mode.

    Returns (index, sign, mask): ``sign`` multiplies the sample (antisymmetric
    modes), ``mask`` zeroes it (zero / node positions of dst1). Either may be None.
    Semantics follow the reference's bounds_common.h / scipy.ndimage grid modes:
      zero=grid-constant, replicate=nearest, dct2=grid-mirror, dct1=mirror,
      dft=grid-wrap, dst1/dst2 antisymmetric mirrors.
    """
    if bound == "zero":
        mask = (idx >= 0) & (idx <= n - 1)
        return ns.clip(idx, 0, n - 1), None, mask
    if bound == "replicate":
        return ns.clip(idx, 0, n - 1), None, None
    if n == 1:
        return ns.zeros_like(idx), None, None
    if bound == "dct2":  # reflect about -0.5 and n-0.5
        period = 2 * n
        x = ns.remainder(idx, period)
        return ns.where(x >= n, period - 1 - x, x), None, None
    if bound == "dct1":  # mirror about 0 and n-1
        period = 2 * (n - 1)
        x = ns.remainder(idx, period)
        return ns.where(x >= n, period - x, x), None, None
    if bound == "dft":  # periodic
        return ns.remainder(idx, n), None, None
    if bound == "dst2":  # antisymmetric about -0.5 and n-0.5
        period = 2 * n
        x = ns.remainder(idx, period)
        refl = x >= n
        xi = ns.where(refl, period - 1 - x, x)
        sign = ns.where(refl, -1.0, 1.0)
        return xi, sign, None
    if bound == "dst1":  # antisymmetric with nodes at -1 and n
        period = 2 * (n + 1)
        u = ns.remainder(idx + 1, period)  # node positions are u==0 and u==n+1
        refl = u > n + 1
        xi = ns.where(refl, 2 * n + 1 - u, u - 1)
        xi = ns.clip(xi, 0, n - 1)
        sign = ns.where(refl, -1.0, 1.0)
        mask = (u != 0) & (u != n + 1)
        return xi, sign, mask
    raise NotImplementedError(f"bound mode {bound!r} is not supported by the tap engine "
                              "('sliding' is expanded per channel before reaching here).")


def _bspline_kernel(order: int, u, ns):
    """Centered B-spline basis of degree ``order`` evaluated at offsets ``u``
    (closed form: divided differences of truncated powers)."""
    from math import comb, factorial

    x = u + (order + 1) / 2.0
    out = None
    for k in range(order + 2):
        term = ((-1.0) ** k) * comb(order + 1, k) * ns.maximum(x - k, 0.0) ** order
        out = term if out is None else out + term
    return out / factorial(order)


def _build_spline_taps(grid, spatial, order: int, bound, align_corners: bool, ns,
                       compute_dtype):
    """Per-dim resolved taps [(idx, weight, sign, mask), ...] for the generic
    B-spline tap engine — shared by the pull (gather) and push/count (scatter)
    paths so the adjoint uses the identical weights. ``bound`` is one mode name
    or a per-dimension tuple of mode names."""
    D = grid.shape[-1]
    bounds = bound if isinstance(bound, (list, tuple)) else (bound,) * D
    taps_per_dim: list[list[tuple]] = []
    for d in range(D):
        c = grid[..., d].astype(compute_dtype)
        if order == 0:
            # torch grid_sample nearest rounds half-to-even (std::nearbyint)
            base = ns.round(c).astype(ns.int32)
            dim_taps = [(base, None)]
        elif order == 1:
            f = ns.floor(c)
            t = (c - f).astype(compute_dtype)
            base = f.astype(ns.int32)
            dim_taps = [(base, 1.0 - t), (base + 1, t)]
        else:
            if order % 2:
                base = ns.floor(c).astype(ns.int32) - (order - 1) // 2
            else:
                base = ns.floor(c + 0.5).astype(ns.int32) - order // 2
            dim_taps = []
            for k in range(order + 1):
                i_k = base + k
                w_k = _bspline_kernel(order, c - i_k.astype(compute_dtype), ns)
                dim_taps.append((i_k, w_k))
        resolved = []
        for i_k, w_k in dim_taps:
            xi, sign, mask = _bound_tap_generic(i_k, spatial[d], bounds[d], align_corners, ns)
            resolved.append((xi, w_k, sign, mask))
        taps_per_dim.append(resolved)
    return taps_per_dim


def _sliding_bounds(D: int) -> list[tuple]:
    """Per-channel bound tuples for the 'sliding' flow-field condition
    (reference: resample_utils.h:86 "Sliding — for deformation-fields only:
    mixture of DCT2 and DST2"): the flow component NORMAL to a face is
    antisymmetric across it (DST2, Dirichlet — no flow through the wall), the
    TANGENTIAL components are symmetric (DCT2, Neumann — free slip). So channel
    ``c`` uses dst2 along spatial dim ``c`` and dct2 along every other dim.

    The reference's own sliding kernel bodies are TODO stubs
    (pushpull_cpu.cpp:594-660), so parity validation is against the definition:
    per-channel equivalence with explicit per-dim bounds + exact pull/push
    adjointness (tests/test_resample_parity_tail.py)."""
    return [tuple("dst2" if d == c else "dct2" for d in range(D)) for c in range(D)]


def _check_sliding_channels(C: int, D: int, op: str):
    if C != D:
        raise ValueError(
            f"'sliding' only applies to flow fields with as many channels as spatial "
            f"dims (reference: spatial_transforms.py:94); {op} got C={C}, D={D}.")


def _grid_pull_spline(input, grid, order: int, bound: str, align_corners: bool, ns):
    """Generic tap-based interpolation: B-spline weights of any order 2..7 (and the
    full 8-bound handling for orders 0/1). Parity: monai/csrc resample pushpull
    (orders 0-7 x 8 bounds); validated vs scipy.ndimage.map_coordinates
    (prefilter=False) in tests/test_resample_parity_tail.py."""
    D = grid.shape[-1]
    in_spatial = input.shape[1:]
    C = input.shape[0]
    out_spatial = grid.shape[:-1]
    compute_dtype = ns.float32 if input.dtype not in (ns.float64,) else input.dtype
    inp = input.astype(compute_dtype)
    flat_in = inp.reshape(C, -1)
    strides = np.ones(D, dtype=np.int64)
    for d in range(D - 2, -1, -1):
        strides[d] = strides[d + 1] * in_spatial[d + 1]

    taps_per_dim = _build_spline_taps(grid, in_spatial, order, bound, align_corners, ns,
                                      compute_dtype)

    out = None
    for corner in itertools.product(*[range(len(t)) for t in taps_per_dim]):
        w = None
        flat_idx = None
        for d, k in enumerate(corner):
            xi, w_k, sign, mask = taps_per_dim[d][k]
            wd = w_k if w_k is not None else 1.0
            if sign is not None:
                wd = wd * sign if not isinstance(wd, float) else sign * wd
            if mask is not None:
                wd = wd * mask.astype(compute_dtype) if not isinstance(wd, float) \
                    else mask.astype(compute_dtype) * wd
            if w is None:
                w = wd if not isinstance(wd, float) else None
            elif not isinstance(wd, float):
                w = w * wd
            contrib = xi * int(strides[d])
            flat_idx = contrib if flat_idx is None else flat_idx + contrib
        vals = ns.take(flat_in, flat_idx.reshape(-1), axis=1).reshape((C,) + tuple(out_spatial))
        term = vals if w is None else vals * w[None]
        out = term if out is None else out + term
    if np.issubdtype(np.dtype(str(input.dtype)), np.floating):
        out = out.astype(input.dtype)
    return out


def _reflect(idx, n, align_corners: bool = False):
    """Reflect continuous coordinates (torch 'reflection' padding).

    align_corners=False: reflect about -0.5 and n-0.5; True: about 0 and n-1."""
    ns = xp(idx)
    if n == 1:
        return ns.zeros_like(idx)
    if align_corners:
        period = 2.0 * (n - 1)
        x = ns.remainder(idx, period)
        x = ns.where(x >= (n - 1), period - x, x)
        return ns.clip(x, 0.0, float(n - 1))
    x = idx + 0.5
    period = 2.0 * n
    x = ns.remainder(x, period)
    x = ns.where(x >= n, period - x, x)
    return ns.clip(x - 0.5, 0.0, float(n - 1))


def _prep_coords(coords, size: int, padding_mode: str, align_corners: bool = False):
    """Apply boundary handling to continuous coords along one dim.

    Returns (coords, inside_mask_or_None)."""
    ns = xp(coords)
    if padding_mode == "reflection":
        return _reflect(coords, size, align_corners), None
    if padding_mode == "border":
        return ns.clip(coords, 0.0, float(size - 1)), None
    # zeros: keep coords; mask handled per-corner
    return coords, True


def _reflect_tap(idx, n, align_corners: bool, ns):
    """Reflect integer tap indices into range (used by cubic, per-tap boundary)."""
    if n == 1:
        return ns.zeros_like(idx)
    if align_corners:
        period = 2 * (n - 1)
        x = ns.remainder(idx, period)
        return ns.where(x >= n - 1, period - x, x)
    period = 2 * n
    x = ns.remainder(idx, period)
    return ns.where(x >= n, period - 1 - x, x)


def _cubic_weights(t, ns):
    """Keys cubic convolution weights for fractional offset t in [0,1), a=-0.75
    (torch's bicubic coefficient).

    Returns weights for taps at offsets (-1, 0, 1, 2)."""
    a = -0.75
    # distances of the 4 taps from the sample point
    d0 = 1.0 + t   # tap at floor-1
    d1 = t         # tap at floor
    d2 = 1.0 - t   # tap at floor+1
    d3 = 2.0 - t   # tap at floor+2

    def w_near(d):
        return ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0

    def w_far(d):
        return ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a

    return [w_far(d0), w_near(d1), w_near(d2), w_far(d3)]


def grid_pull(input: Any, grid: Any, interpolation: Any = 1, bound: str = "zeros",
              align_corners: bool = False):
    """Sample ``input`` at continuous voxel coordinates ``grid``.

    Args:
        input: ``(C, *in_spatial)`` array.
        grid: ``(*out_spatial, D)`` voxel coordinates into ``in_spatial``.
        interpolation: 0 / 1 / 3 or mode name.
        bound: 'zeros' | 'border' | 'reflection'.
        align_corners: affects only the reflection boundary convention.

    Returns ``(C, *out_spatial)``.
    """
    ns = xp(input)
    canon_bound = resolve_bound(bound)
    if canon_bound == "sliding":
        # flow-field sliding condition: channel c = dst2 along dim c, dct2 elsewhere
        D = grid.shape[-1]
        _check_sliding_channels(input.shape[0], D, "grid_pull")
        return ns.concatenate(
            [grid_pull(input[c:c + 1], grid, interpolation, bc, align_corners)
             for c, bc in enumerate(_sliding_bounds(D))], axis=0)
    if str(interpolation).lower() in ("bspline", "bspline3"):
        # the reference compiled grid_pull's cubic: B-spline basis, not Keys
        return _grid_pull_spline(input, grid, 3, canon_bound, align_corners, ns)
    order = resolve_mode(interpolation)
    D = grid.shape[-1]
    in_spatial = input.shape[1:]
    if len(in_spatial) != D:
        raise ValueError(f"grid last dim {D} != input spatial rank {len(in_spatial)}")
    # torch-compatible fast paths below cover orders {0,1,3(Keys cubic)} x
    # {zero,replicate,dct2}; everything else (B-spline orders 2,4-7, per-dim bound
    # tuples, and the reference's remaining bound modes) goes through the generic
    # tap engine.
    # NOTE: order 3 here is torch's Keys bicubic; the reference's compiled grid_pull
    # order 3 is the cubic B-SPLINE — request it as interpolation="bspline" or via
    # use_bspline=True on callers that need csrc parity.
    if (order in (2, 4, 5, 6, 7) or isinstance(canon_bound, tuple)
            or canon_bound not in ("zero", "replicate", "dct2")):
        return _grid_pull_spline(input, grid, order, canon_bound, align_corners, ns)
    bound = {"zero": "zeros", "replicate": "border", "dct2": "reflection"}[canon_bound]
    C = input.shape[0]
    out_spatial = grid.shape[:-1]

    compute_dtype = ns.float32 if input.dtype not in (ns.float64,) else input.dtype
    grid = grid.astype(compute_dtype)
    inp = input.astype(compute_dtype)
    flat_in = inp.reshape(C, -1)
    strides = np.ones(D, dtype=np.int64)
    for d in range(D - 2, -1, -1):
        strides[d] = strides[d + 1] * in_spatial[d + 1]

    coords = [grid[..., d] for d in range(D)]

    if order == 0:
        idxs, masks = [], []
        for d in range(D):
            c, _ = _prep_coords(coords[d], in_spatial[d], bound, align_corners)
            r = ns.floor(c + 0.5)
            if bound == "zeros":
                masks.append((r >= 0) & (r <= in_spatial[d] - 1))
            idxs.append(ns.clip(r, 0, in_spatial[d] - 1).astype(ns.int32))
        flat_idx = sum(idxs[d] * int(strides[d]) for d in range(D))
        vals = ns.take(flat_in, flat_idx.reshape(-1), axis=1).reshape((C,) + tuple(out_spatial))
        if bound == "zeros" and masks:
            m = masks[0]
            for mm in masks[1:]:
                m = m & mm
            vals = vals * m.astype(vals.dtype)
        return vals.astype(input.dtype) if input.dtype != vals.dtype else vals

    if order == 1:
        base, frac = [], []
        for d in range(D):
            c, _ = _prep_coords(coords[d], in_spatial[d], bound, align_corners)
            f = ns.floor(c)
            base.append(f.astype(ns.int32))
            frac.append((c - f).astype(compute_dtype))
        out = None
        for corner in itertools.product((0, 1), repeat=D):
            w = None
            flat_idx = None
            mask = None
            for d, c_d in enumerate(corner):
                idx_d = base[d] + c_d
                w_d = frac[d] if c_d == 1 else (1.0 - frac[d])
                if bound == "zeros":
                    m_d = (idx_d >= 0) & (idx_d <= in_spatial[d] - 1)
                    mask = m_d if mask is None else (mask & m_d)
                idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                w = w_d if w is None else w * w_d
                contrib = idx_d * int(strides[d])
                flat_idx = contrib if flat_idx is None else flat_idx + contrib
            vals = ns.take(flat_in, flat_idx.reshape(-1), axis=1).reshape((C,) + tuple(out_spatial))
            if mask is not None:
                w = w * mask.astype(w.dtype)
            term = vals * w[None]
            out = term if out is None else out + term
        return out.astype(input.dtype) if np.issubdtype(np.dtype(input.dtype), np.floating) else out

    if order == 3:
        # torch bicubic semantics: fractional weights from the *unclamped* coordinate,
        # boundary handling applied per tap index (clip / reflect / zero-mask).
        base, weights = [], []
        for d in range(D):
            c = coords[d]
            f = ns.floor(c)
            t = (c - f).astype(compute_dtype)
            base.append(f.astype(ns.int32))
            weights.append(_cubic_weights(t, ns))
        out = None
        for corner in itertools.product((-1, 0, 1, 2), repeat=D):
            w = None
            flat_idx = None
            mask = None
            for d, c_d in enumerate(corner):
                idx_d = base[d] + c_d
                w_d = weights[d][c_d + 1]
                if bound == "zeros":
                    m_d = (idx_d >= 0) & (idx_d <= in_spatial[d] - 1)
                    mask = m_d if mask is None else (mask & m_d)
                    idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                elif bound == "reflection":
                    idx_d = _reflect_tap(idx_d, in_spatial[d], align_corners, ns)
                    idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                else:  # border
                    idx_d = ns.clip(idx_d, 0, in_spatial[d] - 1)
                w = w_d if w is None else w * w_d
                contrib = idx_d * int(strides[d])
                flat_idx = contrib if flat_idx is None else flat_idx + contrib
            vals = ns.take(flat_in, flat_idx.reshape(-1), axis=1).reshape((C,) + tuple(out_spatial))
            if mask is not None:
                w = w * mask.astype(w.dtype)
            term = vals * w[None]
            out = term if out is None else out + term
        return out.astype(input.dtype) if np.issubdtype(np.dtype(input.dtype), np.floating) else out

    raise ValueError(f"Unsupported interpolation order {order}")


def _grid_push_spline(input, grid, shape, order: int, bound: str, align_corners: bool, ns):
    """Adjoint of :func:`_grid_pull_spline`: splat with the identical tap weights
    (orders 0-7 x the 7 supported bounds — the push/count/grad parity tail of
    /root/reference/monai/csrc/ext.cpp:35-75)."""
    D = grid.shape[-1]
    C = input.shape[0]
    out_spatial = tuple(int(s) for s in shape)
    compute_dtype = ns.float32 if input.dtype not in (ns.float64,) else input.dtype
    inp = input.reshape(C, -1).astype(compute_dtype)
    npix = int(np.prod(out_spatial))
    strides = np.ones(D, dtype=np.int64)
    for d in range(D - 2, -1, -1):
        strides[d] = strides[d + 1] * out_spatial[d + 1]

    taps_per_dim = _build_spline_taps(grid, out_spatial, order, bound, align_corners, ns,
                                      compute_dtype)
    flat_taps = [[(xi.reshape(-1),
                   None if w is None else w.reshape(-1),
                   None if s is None else s.reshape(-1),
                   None if m is None else m.reshape(-1))
                  for (xi, w, s, m) in dim] for dim in taps_per_dim]

    out = (jnp if is_jax(input) else np).zeros((C, npix), dtype=compute_dtype)
    for corner in itertools.product(*[range(len(t)) for t in flat_taps]):
        w = None
        flat_idx = None
        for d, k in enumerate(corner):
            xi, w_k, sign, mask = flat_taps[d][k]
            wd = w_k if w_k is not None else None
            if sign is not None:
                wd = sign if wd is None else wd * sign
            if mask is not None:
                mc = mask.astype(compute_dtype)
                wd = mc if wd is None else wd * mc
            if wd is not None:
                w = wd if w is None else w * wd
            contrib = xi * int(strides[d])
            flat_idx = contrib if flat_idx is None else flat_idx + contrib
        contrib_vals = inp if w is None else inp * w[None]
        if is_jax(input):
            out = out.at[:, flat_idx].add(contrib_vals)
        else:
            np.add.at(out, (slice(None), flat_idx), contrib_vals)
    return out.reshape((C,) + out_spatial)


def grid_push(input: Any, grid: Any, shape: Sequence[int], interpolation: Any = 1, bound: str = "zeros",
              align_corners: bool = False):
    """Splat ``input`` values at voxel coordinates ``grid`` into a ``(C, *shape)`` output.

    The adjoint of :func:`grid_pull` (reference: grid_push, spatial_transforms.py:159).
    Orders 0-7 and the reference's bound modes are supported: orders {0,1,3-Keys} x
    {zeros,border,reflection} use the torch-compatible fast path below; everything
    else (B-spline orders incl. interpolation="bspline", dct1/dst1/dst2/dft bounds)
    shares the generic tap engine with grid_pull so push stays its exact adjoint.
    Only the jax backend supports efficient scatter-add; numpy uses ``np.add.at``.
    """
    ns_ = xp(input)
    canon_bound = resolve_bound(bound)
    if canon_bound == "sliding":
        D = grid.shape[-1]
        _check_sliding_channels(input.shape[0], D, "grid_push")
        return ns_.concatenate(
            [grid_push(input[c:c + 1], grid, shape, interpolation, bc, align_corners)
             for c, bc in enumerate(_sliding_bounds(D))], axis=0)
    if str(interpolation).lower() in ("bspline", "bspline3"):
        return _grid_push_spline(input, grid, shape, 3, canon_bound,
                                 align_corners, ns_)
    order = resolve_mode(interpolation)
    if (order in (2, 4, 5, 6, 7) or isinstance(canon_bound, tuple)
            or canon_bound not in ("zero", "replicate", "dct2")):
        return _grid_push_spline(input, grid, shape, order, canon_bound, align_corners, ns_)
    bound = {"zero": "zeros", "replicate": "border", "dct2": "reflection"}[canon_bound]
    ns = xp(input)
    D = grid.shape[-1]
    C = input.shape[0]
    out_spatial = tuple(int(s) for s in shape)
    compute_dtype = ns.float32 if input.dtype not in (ns.float64,) else input.dtype
    inp = input.reshape(C, -1).astype(compute_dtype)
    npix = int(np.prod(out_spatial))
    strides = np.ones(D, dtype=np.int64)
    for d in range(D - 2, -1, -1):
        strides[d] = strides[d + 1] * out_spatial[d + 1]
    coords = [grid[..., d].reshape(-1) for d in range(D)]

    if order == 0:
        corners_iter = [(0,) * D]
    elif order == 1:
        corners_iter = list(itertools.product((0, 1), repeat=D))
    else:
        corners_iter = list(itertools.product((-1, 0, 1, 2), repeat=D))

    base, frac, cweights = [], [], []
    for d in range(D):
        c, _ = _prep_coords(coords[d], out_spatial[d], bound, align_corners)
        if order == 0:
            f = ns.floor(c + 0.5)
            base.append(f.astype(ns.int32))
            frac.append(None)
        else:
            f = ns.floor(c)
            base.append(f.astype(ns.int32))
            frac.append((c - f).astype(compute_dtype))
    if order == 3:
        cweights = [_cubic_weights(frac[d], ns) for d in range(D)]

    if is_jax(input):
        out = jnp.zeros((C, npix), dtype=compute_dtype)
    else:
        out = np.zeros((C, npix), dtype=compute_dtype)

    for corner in corners_iter:
        w = None
        flat_idx = None
        mask = None
        for d, c_d in enumerate(corner):
            idx_d = base[d] + c_d
            if order == 0:
                w_d = 1.0
            elif order == 1:
                w_d = frac[d] if c_d == 1 else (1.0 - frac[d])
            else:
                w_d = cweights[d][c_d + 1]
            m_d = (idx_d >= 0) & (idx_d <= out_spatial[d] - 1)
            mask = m_d if mask is None else (mask & m_d)
            idx_d = ns.clip(idx_d, 0, out_spatial[d] - 1)
            if w is None:
                w = w_d if not isinstance(w_d, float) else None
            else:
                w = w * w_d if not isinstance(w_d, float) else w
            contrib = idx_d * int(strides[d])
            flat_idx = contrib if flat_idx is None else flat_idx + contrib
        if w is None:
            w = ns.ones_like(coords[0])
        w = w * mask.astype(compute_dtype)
        contrib_vals = inp * w[None]
        if is_jax(input):
            out = out.at[:, flat_idx].add(contrib_vals)
        else:
            np.add.at(out, (slice(None), flat_idx), contrib_vals)
    return out.reshape((C,) + out_spatial)


def grid_count(grid: Any, shape: Sequence[int], interpolation: Any = 1, bound: str = "zeros"):
    """Splat ones — the normalization map for grid_push (reference: grid_count).

    For ``bound='sliding'`` the count is a scalar density (no flow component to be
    antisymmetric about), so the symmetric half of the mixture (dct2) applies to
    every dim — the convention a per-channel push of ones would reduce to if the
    dst2 sign flips were ignored, which is the only meaningful choice for a count.
    """
    ns = xp(grid)
    if resolve_bound(bound) == "sliding":
        bound = "dct2"
    dt = grid.dtype if np.issubdtype(np.dtype(str(grid.dtype)), np.floating) else ns.float32
    ones = ns.ones((1,) + tuple(grid.shape[:-1]), dtype=dt).reshape(1, -1)
    flat_grid = grid.reshape(-1, grid.shape[-1])
    return grid_push(ones.reshape(1, -1), flat_grid, shape, interpolation, bound)[0]


def affine_grid(matrix: Any, out_shape: Sequence[int]):
    """Build a voxel-coordinate sampling grid from an output→input affine map.

    ``matrix`` is (D+1, D+1) (homogeneous); returns grid of shape (*out_shape, D) with
    grid[idx] = (matrix @ [idx, 1])[:D].
    """
    ns = jnp if is_jax(matrix) else np
    D = len(out_shape)
    m = matrix.astype(ns.float32 if ns is jnp else np.float64)
    ranges = [np.arange(s, dtype=np.float32) for s in out_shape]
    mesh = np.meshgrid(*ranges, indexing="ij")  # list of (out_shape)
    mesh = np.stack(mesh, axis=-1)  # (*out_shape, D)
    if ns is jnp:
        mesh = jnp.asarray(mesh)
    # grid = mesh @ A^T + b
    A = m[:D, :D]
    b = m[:D, D]
    grid = ns.tensordot(mesh, A.T, axes=1) + b
    return grid


def affine_resample(img: Any, matrix: Any, out_shape: Sequence[int], mode: Any = 1,
                    padding_mode: str = "zeros", align_corners: bool = False):
    """Resample channel-first ``img`` with output-voxel→input-voxel affine ``matrix``.

    This is the fused flush target of the lazy-resampling engine (the reference composes
    pending affines then calls one grid_sample — monai/transforms/lazy/functional.py:196).
    """
    grid = affine_grid(matrix if is_jax(img) else np.asarray(matrix, dtype=np.float64), tuple(out_shape))
    if is_jax(img) and not is_jax(grid):
        grid = jnp.asarray(grid)
    return grid_pull(img, grid, interpolation=mode, bound=padding_mode, align_corners=align_corners)


# jit-compiled TPU path for batched affine resample (used by dataloader device offload)
@jax.jit
def _affine_resample_jit(img, grid):
    return grid_pull(img, grid, interpolation=1, bound="zeros")


def grid_grad(input: Any, grid: Any, interpolation: Any = 1, bound: str = "zeros",
              align_corners: bool = False):
    """Spatial gradient of ``grid_pull`` w.r.t. the sampling coordinates
    (reference: monai/networks/layers/spatial_transforms.py grid_grad / csrc pushpull).

    Each output point depends only on its own grid coordinate, so the per-point
    Jacobian is obtained from one reverse-mode pass per channel.

    Args:
        input: ``(C, *in_spatial)`` array.
        grid: ``(*out_spatial, D)`` voxel coordinates.

    Returns ``(C, *out_spatial, D)``.
    """
    import jax

    if resolve_bound(bound) == "sliding":
        D = grid.shape[-1]
        _check_sliding_channels(input.shape[0], D, "grid_grad")
        per_chan_bounds = _sliding_bounds(D)

        def chan_grad(c):
            return jax.grad(lambda g: jnp.sum(grid_pull(
                jnp.asarray(input)[c:c + 1], g, interpolation, per_chan_bounds[c],
                align_corners)))(grid)

        return jnp.stack([chan_grad(c) for c in range(D)], axis=0)

    def per_channel(inp_c):
        return jax.grad(lambda g: jnp.sum(grid_pull(inp_c[None], g, interpolation,
                                                    bound, align_corners)))(grid)

    return jax.vmap(per_channel)(jnp.asarray(input))
