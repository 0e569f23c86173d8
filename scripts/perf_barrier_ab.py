"""A/B the post-conv layout barrier (ops/layout.py) end-to-end: UNet forward18
and SwinUNETR forward6 with MONAI_TPU_CONV_BARRIER on/off. Two-K slope timing.

Run: python scripts/perf_barrier_ab.py
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(fn, x, K1=1, K2=3, n=3):
    def chain(K):
        @jax.jit
        def run(x):
            acc = jnp.float32(0)
            z = x
            for _ in range(K):
                y = fn(z)
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                z = z + 0.0 * s.astype(z.dtype)
            return acc
        return run

    r1, r2 = chain(K1), chain(K2)
    _sync(r1(x)); _sync(r2(x))
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2(x)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (K2 - K1)


def bf16_state(net):
    graphdef, state = nnx.split(net)
    state = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        state)
    return graphdef, state


def unet_fwd():
    from monai_tpu.networks.nets import UNet

    net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
               channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
               rngs=nnx.Rngs(0))
    graphdef, state = bf16_state(net)
    return lambda z: nnx.merge(graphdef, state)(z)


def swin_fwd():
    from monai_tpu.networks.nets import SwinUNETR

    net = SwinUNETR(in_channels=1, out_channels=14, feature_size=24, spatial_dims=3,
                    rngs=nnx.Rngs(0))
    graphdef, state = bf16_state(net)
    return lambda z: nnx.merge(graphdef, state)(z)


rng = np.random.RandomState(0)
xu = jnp.asarray(rng.rand(18, 1, 96, 96, 96).astype(np.float32)).astype(jnp.bfloat16)
xs = jnp.asarray(rng.rand(6, 1, 96, 96, 96).astype(np.float32)).astype(jnp.bfloat16)

for flag in ("0", "1"):
    os.environ["MONAI_TPU_CONV_BARRIER"] = flag
    t = slope(unet_fwd(), xu)
    print(f"barrier={flag} unet_forward18: {t*1e3:.2f} ms", flush=True)
    t = slope(swin_fwd(), xs)
    print(f"barrier={flag} swin_forward6: {t*1e3:.2f} ms", flush=True)
