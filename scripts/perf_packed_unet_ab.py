"""End-to-end A/B on the real chip: plain UNet forward vs the level-resident
packed executor (networks/nets/packed_unet.py), bench config, batch-18 bf16
windows, two-K slope timing (33 ms steps -> jitter-proof).

Run: python scripts/perf_packed_unet_ab.py [batch=18] [variant,variant,...]
(variants: plain, tail-only, packed, packed+tail; default all)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from monai_tpu.networks.nets import UNet
from monai_tpu.networks.nets.packed_unet import packed_unet_forward

B = int(sys.argv[1]) if len(sys.argv) > 1 else 18
PEAK = 197e12
FLOPS_PER_WIN = 169.8e9 / 18  # bench cost-analysis per window

net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
           channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
           rngs=nnx.Rngs(0))
graphdef, state = nnx.split(net)
state = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
    state)
win = jnp.asarray(np.random.RandomState(0).rand(B, 1, 96, 96, 96).astype(np.float32)
                  ).astype(jnp.bfloat16)


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(make, K1=2, K2=6, n=4):
    r1, r2 = make(K1), make(K2)
    _sync(r1()); _sync(r2())
    t1, t2 = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1()); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2()); t2.append(time.perf_counter() - t0)
    return (min(t2) - min(t1)) / (K2 - K1)


def chain(fwd):
    def make(K):
        @jax.jit
        def run(w=win):
            acc = jnp.float32(0)
            x = w
            for _ in range(K):
                y = fwd(x)
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                x = x + 0.0 * s.astype(x.dtype)
            return acc
        return lambda: run()
    return make


def plain(x):
    return nnx.merge(graphdef, state)(x)


def packed(x):
    return packed_unet_forward(nnx.merge(graphdef, state), x, pack_tail=False)


def packed_tail(x):
    return packed_unet_forward(nnx.merge(graphdef, state), x, pack_tail=True)


def tail_only(x):
    return packed_unet_forward(nnx.merge(graphdef, state), x, pack_tail=True,
                               pack_level0=False)


only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

for name, fwd in [("plain", plain), ("tail-only", tail_only), ("packed", packed),
                  ("packed+tail", packed_tail)]:
    if only and name not in only:
        continue
    try:
        dt = slope(chain(fwd))
        mfu = B * FLOPS_PER_WIN / dt / PEAK
        print(f"{name:12s} forward{B} = {dt*1e3:7.2f} ms   useful-MFU {mfu*100:5.2f}%")
    except Exception as e:
        print(f"{name:12s} ERROR {str(e)[:200]}")
