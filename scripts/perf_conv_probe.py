"""Probe: why are 3D convs at 1-2% MFU? Run one named probe per invocation:
python scripts/perf_conv_probe.py <matmul|copy|ndhwc|ncdhw|conv2dsum|deep|f32|batch1>
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12
HBM = 819e9


def sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def chained(fn, x, K=8, n=3):
    @jax.jit
    def run(x):
        acc = 0.0
        for _ in range(K):
            y = fn(x)
            s = jnp.sum(y[..., 0, :1].astype(jnp.float32))
            acc = acc + s
            x = x + 0.0 * s.astype(x.dtype)
        return acc

    sync(run(x))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(run(x))
    return (time.perf_counter() - t0) / n / K


def main():
    which = sys.argv[1]
    out = {"probe": which}
    rng = np.random.RandomState(0)

    B, S, C = 18, 48, 16
    x = jnp.asarray(rng.rand(B, S, S, S, C).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, C, C).astype(np.float32)).astype(jnp.bfloat16) * 0.1
    fl = 2 * B * S**3 * 27 * C * C

    if which == "matmul":
        a = jnp.asarray(rng.rand(4096, 4096).astype(np.float32)).astype(jnp.bfloat16)
        t = chained(lambda x: x @ a, a, K=8)
        out["ms"] = round(t * 1e3, 3)
        out["mfu_pct"] = round(2 * 4096**3 / t / PEAK * 100, 1)
    elif which == "copy":
        big = jnp.zeros((64, 1024, 1024), jnp.float32)
        t = chained(lambda x: x * 1.0001 + 0.1, big, K=8)
        out["gbps"] = round(big.size * 8 / t / 1e9, 1)
        out["pct_hbm"] = round(big.size * 8 / t / HBM * 100, 1)
    elif which == "ndhwc":
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        t = chained(lambda x: jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                                           dimension_numbers=dn), x, K=8)
        out["ms"] = round(t * 1e3, 3)
        out["mfu_pct"] = round(fl / t / PEAK * 100, 2)
    elif which == "ncdhw":
        xcf = jnp.transpose(x, (0, 4, 1, 2, 3))
        wcf = jnp.transpose(w, (4, 3, 0, 1, 2))
        dn = jax.lax.conv_dimension_numbers(xcf.shape, wcf.shape, ("NCDHW", "OIDHW", "NCDHW"))
        t = chained(lambda x: jax.lax.conv_general_dilated(x, wcf, (1, 1, 1), "SAME",
                                                           dimension_numbers=dn), xcf, K=8)
        out["ms"] = round(t * 1e3, 3)
        out["mfu_pct"] = round(fl / t / PEAK * 100, 2)
    elif which == "conv2dsum":
        dn2 = jax.lax.conv_dimension_numbers((B * S, S, S, C), (3, 3, C, C),
                                             ("NHWC", "HWIO", "NHWC"))

        def conv_2dsum(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            acc = None
            for dz in range(3):
                sl = jax.lax.slice(xp, (0, dz, 0, 0, 0), (B, dz + S, S, S, C))
                pl = sl.reshape(B * S, S, S, C)
                y = jax.lax.conv_general_dilated(pl, w[dz], (1, 1), "SAME",
                                                 dimension_numbers=dn2)
                acc = y if acc is None else acc + y
            return acc.reshape(B, S, S, S, C)

        t = chained(conv_2dsum, x, K=8)
        out["ms"] = round(t * 1e3, 3)
        out["mfu_pct"] = round(fl / t / PEAK * 100, 2)
    elif which == "deep":
        B2, S2, C2 = 18, 12, 128
        x2 = jnp.asarray(rng.rand(B2, S2, S2, S2, C2).astype(np.float32)).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.rand(3, 3, 3, C2, C2).astype(np.float32)).astype(jnp.bfloat16) * .03
        fl2 = 2 * B2 * S2**3 * 27 * C2 * C2
        dn = jax.lax.conv_dimension_numbers(x2.shape, w1.shape, ("NDHWC", "DHWIO", "NDHWC"))
        t = chained(lambda x: jax.lax.conv_general_dilated(x, w1, (1, 1, 1), "SAME",
                                                           dimension_numbers=dn), x2, K=16)
        out["ms"] = round(t * 1e3, 3)
        out["mfu_pct"] = round(fl2 / t / PEAK * 100, 2)
    elif which == "f32":
        xf = x.astype(jnp.float32)
        wf = w.astype(jnp.float32)
        dn = jax.lax.conv_dimension_numbers(xf.shape, wf.shape, ("NDHWC", "DHWIO", "NDHWC"))
        t = chained(lambda x: jax.lax.conv_general_dilated(x, wf, (1, 1, 1), "SAME",
                                                           dimension_numbers=dn), xf, K=8)
        out["ms"] = round(t * 1e3, 3)
        out["mfu_pct"] = round(fl / t / PEAK * 100, 2)
    elif which == "batch1":
        x1 = x[:1]
        fl1 = fl // B
        dn = jax.lax.conv_dimension_numbers(x1.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        t = chained(lambda x: jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                                           dimension_numbers=dn), x1, K=8)
        out["ms"] = round(t * 1e3, 3)
        out["mfu_pct"] = round(fl1 / t / PEAK * 100, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
