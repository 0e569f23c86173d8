"""Characterize the per-op overhead: is it fixed per op, or proportional to op
output bytes? Chain K=24 ops at several sizes."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

K = 24
results = {}
for n, tag in [(128, "mm128"), (512, "mm512"), (1024, "mm1024"), (2048, "mm2048")]:
    a = jnp.ones((n, n), jnp.bfloat16) * (1.0 / n)

    @jax.jit
    def run(x, a=a):
        for _ in range(K):
            x = x @ a
        return x[0, 0].astype(jnp.float32)

    float(run(a))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(a))
        ts.append((time.perf_counter() - t0) / K)
    dt = min(ts)
    out_bytes = n * n * 2
    print(f"{tag}: per-op {dt*1e6:.0f} us, out {out_bytes/1e6:.2f} MB, "
          f"implied stream {out_bytes/dt/1e9:.2f} GB/s", flush=True)
