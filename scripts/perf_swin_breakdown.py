"""Per-stage breakdown of the SwinUNETR bench forward (feature_size=24, 96^3 ROI,
batch=windows-in-flight) on the real chip: encoder swinViT stages vs the UNETR-style
decoder convs vs the window-attention core, with two-K slope timing so the ~30 ms
dispatch RPC cancels.

Also microbenches the window attention at each stage's exact (windows, heads, n, d)
shape, XLA einsum path vs materialization-free alternatives, to size the Pallas
window-attention opportunity (SURVEY hard part #4).

Run: python scripts/perf_swin_breakdown.py [batch]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from monai_tpu.networks.nets import SwinUNETR

B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
PEAK = 197e12


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def slope(fn, *args, K1=1, K2=4, n=3):
    def chain(K):
        @jax.jit
        def run(*a):
            acc = jnp.float32(0)
            a = list(a)
            for _ in range(K):
                y = fn(*a)
                s = jnp.ravel(y)[0].astype(jnp.float32)
                acc += s
                a[0] = a[0] + 0.0 * s.astype(a[0].dtype)
            return acc
        return run

    r1, r2 = chain(K1), chain(K2)
    _sync(r1(*args)); _sync(r2(*args))
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(r1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(r2(*args)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (K2 - K1)


def main():
    net = SwinUNETR(in_channels=1, out_channels=14, feature_size=24, spatial_dims=3,
                    rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(net)
    state = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        state)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 1, 96, 96, 96).astype(np.float32)).astype(jnp.bfloat16)

    def full(x, state=state):
        return nnx.merge(graphdef, state)(x)

    def encoder_only(xcl, state=state):
        m = nnx.merge(graphdef, state)
        outs = m.swinViT(xcl, m.normalize)
        return outs[-1]

    t_full = slope(full, x)
    print(f"batch={B} full={t_full*1e3:.1f} ms", flush=True)
    t_enc = slope(encoder_only, jnp.transpose(x, (0, 2, 3, 4, 1)))
    print(f"  encoder={t_enc*1e3:.1f} ms  decoder~={(t_full-t_enc)*1e3:.1f} ms", flush=True)

    # encoder sub-stages
    m = nnx.merge(graphdef, state)

    def stage(fn):
        return slope(fn, x)

    def pe(x):
        return m.swinViT.patch_embed(x)

    xcl = jnp.transpose(x, (0, 2, 3, 4, 1))
    t_pe = slope(pe, xcl)
    prev = jax.jit(pe)(xcl)
    feats = [prev]
    for i, layer in enumerate(m.swinViT.layers):
        t_l = slope(lambda p, layer=layer: layer(p), prev)
        prev = jax.jit(lambda p, layer=layer: layer(p))(prev)
        feats.append(prev)
        print(f"  stage{i+1}: {t_l*1e3:.2f} ms  out={tuple(prev.shape)}", flush=True)
    print(f"  patch_embed: {t_pe*1e3:.2f} ms", flush=True)

    # decoder pieces at their real shapes
    hidden = jax.jit(lambda x: tuple(m.swinViT(x, m.normalize)))(xcl)
    for name, fn, args in [
        ("encoder1(96^3 CO=24)", lambda a: m.encoder1(a), (xcl,)),
        ("encoder2", lambda a: m.encoder2(a), (hidden[0],)),
        ("encoder3", lambda a: m.encoder3(a), (hidden[1],)),
        ("encoder4", lambda a: m.encoder4(a), (hidden[2],)),
        ("encoder10", lambda a: m.encoder10(a), (hidden[4],)),
        ("decoder5", lambda a, b=hidden[3]: m.decoder5(a, b),
         (jax.jit(lambda a: m.encoder10(a))(hidden[4]),)),
        ("decoder2(24->48)", lambda a, b=jax.jit(lambda v: m.encoder2(v))(hidden[0]):
         m.decoder2(a, b),
         (jnp.zeros((B, 24, 24, 24, 48), jnp.bfloat16),)),
        ("decoder1(48->96)", lambda a, b=jax.jit(lambda v: m.encoder1(v))(xcl):
         m.decoder1(a, b),
         (jnp.zeros((B, 48, 48, 48, 24), jnp.bfloat16),)),
        ("out", lambda a: m.out(a), (jnp.zeros((B, 96, 96, 96, 24), jnp.bfloat16),)),
    ]:
        try:
            t = slope(fn, *args)
            print(f"  {name}: {t*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name}: ERR {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
