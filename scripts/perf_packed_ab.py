"""A/B the packed-conv UNet forward vs plain XLA conv on the real chip.
Usage: python scripts/perf_packed_ab.py <0|1>   (MONAI_TPU_PACKED_CONV)
"""
import os
import sys
import time

os.environ["MONAI_TPU_PACKED_CONV"] = sys.argv[1]
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from monai_tpu.networks.nets import UNet

net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(16, 32, 64, 128, 256),
           strides=(2, 2, 2, 2), num_res_units=2, rngs=nnx.Rngs(0))
graphdef, state = nnx.split(net)
state = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
    state)

rng = np.random.RandomState(0)
win = jnp.asarray(rng.rand(18, 1, 96, 96, 96).astype(np.float32)).astype(jnp.bfloat16)


def chain(K):
    @jax.jit
    def run(w):
        acc = jnp.float32(0)
        x = w
        for _ in range(K):
            y = nnx.merge(graphdef, state)(x)
            s = jnp.ravel(y)[0].astype(jnp.float32)
            acc += s
            x = x + 0.0 * s.astype(x.dtype)
        return acc
    return run


r2, r6 = chain(2), chain(6)
float(r2(win)); float(r6(win))
t2s, t6s = [], []
for _ in range(4):
    t0 = time.perf_counter(); float(r2(win)); t2s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); float(r6(win)); t6s.append(time.perf_counter() - t0)
per = (min(t6s) - min(t2s)) / 4
print(f"packed={sys.argv[1]}: forward18 = {per*1e3:.2f} ms  "
      f"(t2={min(t2s)*1e3:.1f} t6={min(t6s)*1e3:.1f})")
