"""Measure per-HLO-op overhead inside one jit: chain K tiny dependent ops."""
import sys
import time

import jax
import jax.numpy as jnp

K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODE = sys.argv[2] if len(sys.argv) > 2 else "tiny"

if MODE == "tiny":
    x0 = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def run(x):
        for i in range(K):
            x = x * 1.000001 + 1e-6  # fuses? force distinct ops via sin
            x = jnp.sin(x)
        return x[0, 0]
elif MODE == "mm256":
    a = jnp.ones((256, 256), jnp.bfloat16) * 0.001
    x0 = a

    @jax.jit
    def run(x):
        for i in range(K):
            x = x @ a
        return x[0, 0].astype(jnp.float32)
elif MODE == "mm1024":
    a = jnp.ones((1024, 1024), jnp.bfloat16) * 0.001
    x0 = a

    @jax.jit
    def run(x):
        for i in range(K):
            x = x @ a
        return x[0, 0].astype(jnp.float32)

float(run(x0))
for t in range(3):
    t0 = time.perf_counter()
    float(run(x0))
    dt = time.perf_counter() - t0
    print(f"K={K} {MODE}: total {dt*1e3:.2f} ms, per-op {dt/K*1e6:.1f} us")
