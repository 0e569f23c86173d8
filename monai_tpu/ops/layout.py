"""Layout control for TPU conv outputs.

XLA's TPU conv emitter prefers a spatial-minor output layout (e.g.
bf16[96,96,48,13,24]{1,4,3,2,0}: lanes = a spatial dim, sublanes = channels).
Standalone that is the fastest conv — but any downstream reduce/elementwise in
the default channel-minor layout then drags relayout copies and materialized
f32 broadcasts through the whole block. Measured at (6, 96^3, 24) with
scripts/perf_convnorm_variants.py on v5e:

    conv alone                 0.37 ms
    conv -> instance norm     14.69 ms   (layout thrash, traced in perf_xprof.py)
    conv -> leaky_relu         4.48 ms   (ANY consumer pays the relayout)
    conv -> BARRIER -> norm    4.80 ms   (3.1x better: one forced copy, then clean)

An `optimization_barrier` right after the conv pins the boundary so layout
assignment resolves the conflict once instead of propagating it. Applied by the
Conv factory to 3D convs above a size threshold (small convs fuse fine and the
barrier would only block fusion).

End-to-end effect (scripts/perf_barrier_ab.py, v5e, final gate below):
    UNet forward (18 windows, 96^3)      33.2 -> 33.1 ms   (no regression)
    SwinUNETR forward (6 windows, 96^3)  307.8 -> 193.8 ms (1.59x)

Set MONAI_TPU_CONV_BARRIER=0 to disable.
"""
from __future__ import annotations

import os

import jax

__all__ = ["conv_layout_barrier", "use_conv_barrier"]

# Gate (measured, scripts/perf_convnorm_channels.py + perf_barrier_ab.py):
# at 96^3 the barrier wins at EVERY channel count (e.g. CO=16: 14.9 -> 8.8 ms,
# CO=24: 23.5 -> 13.6 ms). At 48^3 it depends on channels: the whole-UNet
# forward (CO = 16/32 there) REGRESSED 33 -> 37.5 ms with a blanket 32^3
# threshold — those compositions are layout-clean and the barrier only blocks
# fusion — while SwinUNETR's 48^3 CO=24 decoder blocks improved (196 vs 206 ms
# whole-net). Hence: always barrier >= ~80^3 outputs; at >= ~48^3 only when the
# channel count is not a multiple of 16 (the clean-layout cases observed are
# exactly the 16-multiples); never below 8 channels (UNet's 96^3 CO=2 output
# tail regressed with a barrier).
_MIN_SPATIAL_NUMEL = 400_000
_MIN_SPATIAL_NUMEL_ODD_C = 100_000


def use_conv_barrier() -> bool:
    if os.environ.get("MONAI_TPU_CONV_BARRIER", "1") != "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def conv_layout_barrier(y):
    """Pin a conv output's layout at the op boundary (identity for gradients)."""
    if y.ndim < 4:
        return y
    c = int(y.shape[-1])
    numel = 1
    for d in y.shape[1:-1]:
        numel *= int(d)
    threshold = _MIN_SPATIAL_NUMEL if c % 16 == 0 else _MIN_SPATIAL_NUMEL_ODD_C
    if c < 8 or numel < threshold or not use_conv_barrier():
        return y
    return jax.lax.optimization_barrier(y)
