"""Pure matmul peak probe: x <- x@a chained, minimal per-step overhead."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16

rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(N, N).astype(np.float32)).astype(jnp.bfloat16) * 0.01


@jax.jit
def run(x):
    for _ in range(K):
        x = x @ a
    return x[0, 0].astype(jnp.float32)


x0 = a
t0 = time.perf_counter()
print("first:", float(run(x0)), f"{time.perf_counter()-t0:.1f}s compile+run")
for trial in range(4):
    t0 = time.perf_counter()
    float(run(x0))
    dt = (time.perf_counter() - t0) / K
    print(f"trial {trial}: {dt*1e3:.3f} ms/matmul  mfu={2*N**3/dt/197e12*100:.1f}%")
