"""Attribute the gap between the SW program's device time (~38 ms/call at
batch-4, perf_xprof.py sw) and the bench's steady-state 69 ms/call.

Suspects: (a) per-call Python overhead inside sliding_window_inference
(eval_shape, cache-key building, tree flattening) on this slow host CPU;
(b) dispatch RPC not overlapping; (c) the f32 predictor boundary adding
~10 ms/call of f32 layout copies on device.

Measures:
  python_call_ms     wall time of inferer(v, pred) WITHOUT sync (pure host cost
                     of building + dispatching the call)
  pipelined f32      the bench number (predictor casts out to f32)
  pipelined bf16     predictor keeps bf16 through the stitch (accumulate still
                     in the einsum path; final multiply in bf16)

Run: python scripts/perf_sw_overhead.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import bench as benchmod
from monai_tpu.inferers import SlidingWindowInferer


def _sync(out):
    return float(jax.device_get(jnp.ravel(out)[0]))


def pipelined(fn, args, n_iters=6):
    _sync(fn(args[0]))
    t0 = time.perf_counter()
    outs = [fn(args[i % len(args)]) for i in range(n_iters)]
    for o in outs:
        _sync(o)
    return (time.perf_counter() - t0) / n_iters


def main():
    predictor, fwd, state_bf16, plain_fwd = benchmod.build_unet_predictor()

    inferer = SlidingWindowInferer(roi_size=(96, 96, 96), sw_batch_size=18,
                                   overlap=0.25, mode="gaussian")
    vols4 = [jax.random.uniform(jax.random.key(i + 1), (4, 1, 224, 224, 112), jnp.float32)
             for i in range(3)]
    vols4_bf16 = [v.astype(jnp.bfloat16) for v in vols4]

    # f32 boundary (the bench predictor)
    dt = pipelined(lambda v: inferer(v, predictor), vols4, n_iters=6)
    print(f"pipelined f32-boundary: {dt*1e3:8.2f} ms/call  {4.0/dt:6.2f} vols/s")

    # pure python overhead: call without syncing, after warm
    t0 = time.perf_counter()
    outs = [inferer(vols4[i % 3], predictor) for i in range(6)]
    py_ms = (time.perf_counter() - t0) / 6 * 1e3
    for o in outs:
        _sync(o)
    print(f"python_call_ms (no sync): {py_ms:8.2f} ms/call")

    # bf16 predictor boundary, bf16 input
    def predictor16(w):
        return fwd(state_bf16, w)

    dt16 = pipelined(lambda v: inferer(v, predictor16), vols4_bf16, n_iters=6)
    print(f"pipelined bf16-through-stitch: {dt16*1e3:8.2f} ms/call  {4.0/dt16:6.2f} vols/s")

    t0 = time.perf_counter()
    outs = [inferer(vols4_bf16[i % 3], predictor16) for i in range(6)]
    py16 = (time.perf_counter() - t0) / 6 * 1e3
    for o in outs:
        _sync(o)
    print(f"python_call_ms bf16 (no sync): {py16:8.2f} ms/call")


if __name__ == "__main__":
    main()
