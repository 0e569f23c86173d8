"""Sweep volumes-per-dispatch for the SW eval: the ~28 ms dispatch RPC and
~13 ms Python wrapper cost are per-call and do NOT overlap with compute on the
tunneled backend (perf_sw_overhead.py), so larger volume batches amortize them.
Side benefit: the window batch (B*18) lands nearer a multiple of 128, shrinking
XLA's batch-minor lane padding at the CO=16 levels (72->128 pad = 1.78x vs
126->128 = 1.02x).

Run: python scripts/perf_sw_batch.py [batches...]
"""
import sys
import time

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
    batches = [int(a) for a in sys.argv[1:]] or [4, 7, 8, 12]
    predictor, fwd, state_bf16, plain_fwd = benchmod.build_unet_predictor()

    def predictor16(w):
        return fwd(state_bf16, w)

    inferer = SlidingWindowInferer(roi_size=(96, 96, 96), sw_batch_size=18,
                                   overlap=0.25, mode="gaussian")
    for b in batches:
        vols = [jax.random.uniform(jax.random.key(i + 1), (b, 1, 224, 224, 112),
                                   jnp.bfloat16) for i in range(2)]
        n = max(3, 24 // b)
        dt = pipelined(lambda v: inferer(v, predictor16), vols, n_iters=n)
        print(f"batch {b:3d}: {dt*1e3:8.2f} ms/call  {b/dt:7.2f} vols/s", flush=True)


if __name__ == "__main__":
    main()
