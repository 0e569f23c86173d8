"""Instance norm tuned for TPU (r3 measurements, scripts/perf_norm_probe.py).

Measured on v5e at the north-star UNet's norm sites (two-K slope timing):

  (18,48^3,16) bf16: nnx.GroupNorm 0.77 ms | plain fused f32 reduce 0.77 ms |
                     lane-128 reshape trick 4.64 ms | MXU ones-matmul 0.93 ms
  (18,24^3,32) bf16: 0.39 | 0.20 | 0.40 | 0.24 ms

Conclusions: the (B, total/128, 128) reshape-to-full-lanes idea LOSES 6x — the
lane relayout costs far more than the lane-starved reduce it replaces (do not
retry it); the plain two-moment f32 reduce with a fused rsqrt normalize is the
fastest at every site (ties GroupNorm at large shapes, 2x at small ones), so
that is what this runs.

Matches nnx.GroupNorm(num_groups=num_features) (the Norm.INSTANCE factory,
reference: monai utils get_norm_layer -> torch InstanceNorm3d) with f32 stats:
same reduction set, f32-rounding-level differences only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["InstanceNormTPU", "fast_instance_norm"]


def _in_stats(x):
    """Per-(batch, channel) spatial mean / rsqrt-variance with f32 accumulation."""
    axes = tuple(range(1, x.ndim - 1))
    n_sp = 1
    for d in axes:
        n_sp *= x.shape[d]
    # converts fuse into the reduces: one multi-output pass over the bf16 tensor
    s = jnp.sum(x, axis=axes, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes)
    m = s / n_sp
    v = jnp.maximum(s2 / n_sp - m * m, 0.0)
    return m, v, n_sp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _in_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
             eps: float) -> jnp.ndarray:
    m, v, _ = _in_stats(x)
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    inv = jax.lax.rsqrt(v + eps) * scale.astype(jnp.float32)
    # one fused elementwise pass, bf16 in / bf16 out (the astype has a single
    # consumer so the convert fuses instead of materializing)
    y = (x.astype(jnp.float32) - m.reshape(shape)) * inv.reshape(shape)
    y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _in_norm_fwd(x, scale, bias, eps):
    m, v, n_sp = _in_stats(x)
    inv = jax.lax.rsqrt(v + eps)  # (B, C) f32, WITHOUT scale folded in
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    y = (x.astype(jnp.float32) - m.reshape(shape)) * (inv * scale.astype(jnp.float32)).reshape(shape)
    y = y + bias.astype(jnp.float32)
    y = y.astype(x.dtype)
    # residuals: the OUTPUT y (+ per-(B,C) stats) — never the input x. y is
    # consumed by the next layer's backward anyway, so saving it adds zero
    # residual traffic, and x dies right here, so XLA neither keeps it live
    # nor re-materializes it in the backward fusion's preferred layout. The r5
    # batch-16 train trace showed exactly that pathology for the x-saving
    # form: each L0 norm's stat-reduce fusion also emitted a full relaid-out
    # copy of x for the backward (a 56 MB bf16 write + S(1) staging per site).
    return y, (y, inv, scale, bias)


def _in_norm_bwd(eps, res, g):
    y, inv, scale, bias = res
    axes = tuple(range(1, y.ndim - 1))
    n_sp = 1
    for d in axes:
        n_sp *= y.shape[d]
    shape = (y.shape[0],) + (1,) * (y.ndim - 2) + (y.shape[-1],)
    # All pieces come from (g, y) alone. With y = γ·x̂ + β:
    #   Σ g·x̂  = (Σ g·y − β·Σ g) / γ          (B, C) scalar math
    #   dx      = γ·inv·(g − mean_g) − inv·(y − β)·mean_gx̂
    # Two fused f32 reduces over one read of (g, y), then one elementwise pass
    # reading (g, y) — no full-size f32 temporary, no extra residual.
    sg = jnp.sum(g, axis=axes, dtype=jnp.float32)                    # Σ g
    sgy = jnp.sum(g * y.astype(g.dtype), axis=axes, dtype=jnp.float32)  # Σ g·y
    gamma = jnp.broadcast_to(scale.astype(jnp.float32), sg.shape)    # (B, C)
    beta = jnp.broadcast_to(bias.astype(jnp.float32), sg.shape)
    # γ can be exactly 0 transiently; then y − β ≡ 0 and the dx term vanishes,
    # so any finite x̂-sum works — guard the divide to keep NaNs out.
    safe_g = jnp.where(gamma == 0.0, 1.0, gamma)
    sgx = (sgy - beta * sg) / safe_g                                 # Σ g·x̂
    dbias = jnp.sum(sg, axis=0)
    dscale = jnp.sum(sgx, axis=0)
    k = (inv * gamma).reshape(shape)
    mean_g = (sg / n_sp).reshape(shape)
    inv_mean_gx = (inv * sgx / n_sp).reshape(shape)
    dx = (k * (g.astype(jnp.float32) - mean_g)
          - (y.astype(jnp.float32) - beta.reshape(shape)) * inv_mean_gx)
    return dx.astype(y.dtype), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_in_norm.defvjp(_in_norm_fwd, _in_norm_bwd)


def fast_instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                       scale: jnp.ndarray | None = None,
                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Instance norm on channels-last ``x`` (B, *spatial, C): two-moment spatial
    reduce with f32 accumulation + fused rsqrt normalize, with a hand-derived
    VJP (dx = γ·inv·(g − mean g − x̂·mean g·x̂); two fused f32 reduces over (g, x)
    plus one elementwise pass — autodiff of the forward instead materializes
    full-size f32 intermediates, the dominant cost in the r4 train-step trace).

    CRITICAL LAYOUT NOTE: never bind ``x.astype(f32)`` to a reused name. A bf16
    activation upcast that feeds several consumers gets *materialized* by XLA as
    a full f32 tensor (2x HBM) plus layout copies; at (6, 96^3, 24) that turned
    a ~2 ms conv+norm into 14.8 ms (traced in scripts/perf_xprof.py — 500 MB f32
    fusions, two materialized full-size broadcasts, three relayout copies).
    Instead each consumer reads the bf16 tensor directly so the convert fuses
    into the reduce / normalize fusions and the conv's preferred layout flows
    through the whole block."""
    c = x.shape[-1]
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    return _in_norm(x, scale, bias, eps)


class InstanceNormTPU(nnx.Module):
    """Drop-in for the Norm.INSTANCE factory's nnx.GroupNorm(groups=C): identical
    parameter set/names (scale/bias when affine) so checkpoints interchange."""

    def __init__(self, num_features: int, affine: bool = False, eps: float = 1e-5,
                 *, rngs: nnx.Rngs | None = None):
        self.num_features = num_features
        self.epsilon = eps
        self.use_scale = affine
        self.use_bias = affine
        if affine:
            self.scale = nnx.Param(jnp.ones((num_features,), jnp.float32))
            self.bias = nnx.Param(jnp.zeros((num_features,), jnp.float32))
        else:
            self.scale = None
            self.bias = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.scale.value if self.use_scale else None
        bias = self.bias.value if self.use_bias else None
        return fast_instance_norm(x, eps=self.epsilon, scale=scale, bias=bias)
