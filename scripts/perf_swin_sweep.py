"""Sweep the SwinUNETR sliding-window batch on the real chip: end-to-end
vols/s (bf16 through the stitch) + the compiled forward's temp-memory size per
sw_batch — root-causing the r4 finding that sw_batch=9 compiles to a 14.5 GB
temp schedule while 6 uses 4.2 GB (bench.py bench_swinunetr_sw note).

Usage: python scripts/perf_swin_sweep.py [batches...]   (default 6 9 12 14)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from flax import nnx

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from monai_tpu.inferers import SlidingWindowInferer
from monai_tpu.networks.nets import SwinUNETR


def sync(v):
    return float(jax.device_get(jnp.ravel(v)[0]))


def main():
    batches = [int(a) for a in sys.argv[1:]] or [6, 9, 12, 14]
    net = SwinUNETR(in_channels=1, out_channels=14, feature_size=24, spatial_dims=3,
                    rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(net)
    state_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        state)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    def predictor(w):
        return fwd(state_bf16, w.astype(jnp.bfloat16))

    vol_shape, roi = (224, 224, 112), (96, 96, 96)
    vols = [jax.random.uniform(jax.random.key(i), (1, 1, *vol_shape), jnp.float32)
            for i in range(2)]

    for bs in batches:
        # temp memory of the bare window forward at this batch
        try:
            comp = jax.jit(lambda x: fwd(state_bf16, x)).lower(
                jnp.zeros((bs, 1, *roi), jnp.bfloat16)).compile()
            ma = comp.memory_analysis()
            temp_gb = getattr(ma, "temp_size_in_bytes", 0) / 1e9
        except Exception as e:
            temp_gb = float("nan")
            print(f"bs={bs}: memory_analysis failed: {str(e)[:120]}", flush=True)
        inferer = SlidingWindowInferer(roi_size=roi, sw_batch_size=bs, overlap=0.25,
                                       mode="gaussian")
        try:
            sync(inferer(vols[0], predictor))  # compile + warm
            t0 = time.perf_counter()
            outs = [inferer(vols[i % 2], predictor) for i in range(3)]
            for o in outs:
                sync(o)
            dt = (time.perf_counter() - t0) / 3
            print(f"bs={bs}: {1.0/dt:6.3f} vols/s  fwd_temp={temp_gb:.2f} GB", flush=True)
        except Exception as e:
            print(f"bs={bs}: run failed: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
