"""Bisect the UnetrBasicBlock (96^3, CO=24) pathology: individual ops measure
<1 ms but the composed block measures 76 ms (see perf_swin_breakdown.py /
perf_decoder_conv_ab.py). Times cumulative prefixes of the block's op sequence
to find which composition step destroys performance.

Run: python scripts/perf_block_bisect.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from monai_tpu.networks.blocks.dynunet_block import UnetrBasicBlock
from monai_tpu.networks.layers.fast_norm import fast_instance_norm

B, S = 6, 96


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


blk = UnetrBasicBlock(3, 1, 24, 3, 1, ("instance", {"affine": True}), True, rngs=nnx.Rngs(0))
graphdef, state = nnx.split(blk)
state = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
    state)
m = nnx.merge(graphdef, state)
rb = m.layer  # UnetResBlock

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, S, S, S, 1).astype(np.float32)).astype(jnp.bfloat16)

stages = [
    ("conv1", lambda z: rb.conv1(z)),
    ("conv1+norm1", lambda z: rb.norm1(rb.conv1(z))),
    ("conv1+norm1+act", lambda z: rb.act(rb.norm1(rb.conv1(z)))),
    ("..+conv2", lambda z: rb.conv2(rb.act(rb.norm1(rb.conv1(z))))),
    ("..+norm2", lambda z: rb.norm2(rb.conv2(rb.act(rb.norm1(rb.conv1(z)))))),
    ("full block", lambda z: rb(z)),
    ("norm only", lambda z: fast_instance_norm(jnp.tile(z, (1, 1, 1, 1, 24)))),
    ("conv1 f32w?", lambda z: rb.conv1(z.astype(jnp.float32))),
]
for name, fn in stages:
    try:
        t = slope(fn, x)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: ERR {str(e)[:140]}", flush=True)
