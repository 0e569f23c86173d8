"""Convolution shape/kernel helpers (reference: monai/networks/layers/convutils.py).

``same_padding`` / ``stride_minus_kernel_padding`` live in blocks.convolutions and
are re-exported here for parity; ``gaussian_1d`` lives in ops.gaussian (shared with
the filtering transforms)."""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ...ops.gaussian import gaussian_1d

__all__ = ["same_padding", "stride_minus_kernel_padding", "calculate_out_shape",
           "gaussian_1d", "polyval"]


def __getattr__(name):
    # lazy: blocks.convolutions imports this package, so import it on first access
    if name in ("same_padding", "stride_minus_kernel_padding"):
        from ..blocks import convolutions

        return getattr(convolutions, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def calculate_out_shape(in_shape: Sequence[int] | int, kernel_size: Sequence[int] | int,
                        stride: Sequence[int] | int, padding: Sequence[int] | int):
    """Output spatial shape of a conv with the given geometry
    (reference: convutils.py:56)."""
    in_shape_np = np.atleast_1d(in_shape)
    out_shape_np = ((in_shape_np - np.atleast_1d(kernel_size) + np.atleast_1d(padding)
                     + np.atleast_1d(padding)) // np.atleast_1d(stride)) + 1
    out_shape = tuple(int(s) for s in out_shape_np)
    return out_shape if len(out_shape) > 1 else out_shape[0]


def polyval(coef, x):
    """Evaluate a polynomial (highest power first) at x via Horner's rule
    (reference: convutils.py:134)."""
    import jax.numpy as jnp

    coef = np.asarray(coef) if not hasattr(coef, "ndim") else coef
    if coef.ndim == 0 or coef.shape[0] < 1:
        return jnp.zeros_like(jnp.asarray(x))
    x = jnp.asarray(x)
    ans = jnp.full_like(x, float(coef[0]))
    for c in coef[1:]:
        ans = ans * x + float(c)
    return ans
