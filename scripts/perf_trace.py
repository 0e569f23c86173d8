"""Try jax.profiler on the axon backend; fall back to slope-timing if unsupported.

Usage: python scripts/perf_trace.py trace   # attempt a profiler trace of forward18
       python scripts/perf_trace.py slope   # two-K slope timing of forward18 + parts
"""
import glob
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, "/root/repo")


def build_fwd():
    from monai_tpu.networks.nets import UNet

    net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
               channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
               rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(net)
    state = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        state)

    @jax.jit
    def fwd(x):
        return nnx.merge(graphdef, state)(x).astype(jnp.float32)

    return fwd


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "trace"
    rng = np.random.RandomState(0)
    win = jnp.asarray(rng.rand(18, 1, 96, 96, 96).astype(np.float32)).astype(jnp.bfloat16)
    fwd = build_fwd()
    out = fwd(win)
    print("warm:", float(jnp.ravel(out)[0]), flush=True)

    if mode == "trace":
        with jax.profiler.trace("/tmp/jaxtrace"):
            for _ in range(3):
                r = fwd(win)
            jnp.ravel(r)[0].block_until_ready()
        files = glob.glob("/tmp/jaxtrace/**/*", recursive=True)
        print("\n".join(files[-20:]))
    else:
        def slope(fn, x, K1=3, K2=11, n=4):
            def chain(K):
                @jax.jit
                def run(x):
                    acc = jnp.float32(0)
                    for _ in range(K):
                        y = fn(x)
                        s = jnp.ravel(y)[0].astype(jnp.float32)
                        acc = acc + s
                        x = x + 0.0 * s.astype(x.dtype)
                    return acc
                return run

            r1, r2 = chain(K1), chain(K2)
            float(r1(x)); float(r2(x))
            t1s, t2s = [], []
            for _ in range(n):
                t0 = time.perf_counter(); float(r1(x)); t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(r2(x)); t2s.append(time.perf_counter() - t0)
            t1, t2 = min(t1s), min(t2s)
            return (t2 - t1) / (K2 - K1), t1, t2

        per, t1, t2 = slope(fwd, win)
        print(f"forward18 slope: {per*1e3:.2f} ms/call (t3={t1*1e3:.1f} t11={t2*1e3:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
