"""Bisect the UNet train step's 68.5 ms (r3: 0.96% MFU) into components on the
real chip: forward / loss / backward / optimizer, plus candidate fixes A/B'd.

Variants:
  fwd        forward only (bf16), batch-4 96^3
  loss       DiceCE(softmax,onehot) forward
  grad-none  value_and_grad, no optimizer apply (grads returned)
  sgd        value_and_grad + plain sgd apply
  adamw      the bench step (value_and_grad + optax.adamw tree update)
  adamw-flat value_and_grad + adamw on ONE flat concatenated f32 vector
  ce-only    adamw-flat but plain softmax CE loss (isolates the dice terms)

Run: python scripts/perf_train_bisect.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import nnx

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from monai_tpu.losses import DiceCELoss
from monai_tpu.networks.nets import UNet

B, S = 4, 96
net = UNet(spatial_dims=3, in_channels=1, out_channels=2,
           channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
           rngs=nnx.Rngs(0))
graphdef, params, rest = nnx.split(net, nnx.Param, ...)
loss_fn = DiceCELoss(to_onehot_y=True, softmax=True)
x = jax.random.uniform(jax.random.key(0), (B, 1, S, S, S), jnp.float32)
y = (jax.random.uniform(jax.random.key(1), (B, 1, S, S, S)) > 0.5).astype(jnp.float32)


def _sync(o):
    return float(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[0]))


def timeit(fn, args, n=6):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / n


def loss_of(p, xb, yb, which="dicece"):
    if which.endswith("-bf16"):
        from monai_tpu.networks.utils import cast_params_to_compute

        p = cast_params_to_compute(p)
        which = which[:-5]
    logits = nnx.merge(graphdef, p, rest)(xb.astype(jnp.bfloat16)).astype(jnp.float32)
    if which == "ce":
        logp = jax.nn.log_softmax(logits, axis=1)
        yi = yb[:, 0].astype(jnp.int32)
        return -jnp.mean(jnp.take_along_axis(logp, yi[:, None], axis=1))
    return loss_fn(logits, yb)


# flat-vector optimizer machinery
flat0, unravel = jax.flatten_util.ravel_pytree(params)
tx = optax.adamw(1e-4)


def report(name, dt):
    print(f"{name:11s} {dt*1e3:8.2f} ms   ({1.0/dt:6.2f} it/s)", flush=True)


# 1. forward only
fwd = jax.jit(lambda p, xb: nnx.merge(graphdef, p, rest)(xb.astype(jnp.bfloat16)))
report("fwd", timeit(fwd, (params, x)))

# 2. loss forward
lfwd = jax.jit(lambda p, xb, yb: loss_of(p, xb, yb))
report("loss", timeit(lfwd, (params, x, y)))

# 3. grad only
gr = jax.jit(lambda p, xb, yb: jax.value_and_grad(lambda q: loss_of(q, xb, yb))(p))
report("grad-none", timeit(gr, (params, x, y)))

# 4. sgd apply
def sgd_step(p, xb, yb):
    l, g = jax.value_and_grad(lambda q: loss_of(q, xb, yb))(p)
    return jax.tree_util.tree_map(lambda a, b: a - 1e-4 * b, p, g), l
sgd = jax.jit(sgd_step, donate_argnums=(0,))
p1 = jax.tree_util.tree_map(jnp.copy, params)
report("sgd", timeit(lambda xb, yb: sgd(jax.tree_util.tree_map(jnp.copy, params), xb, yb), (x, y)))

# 5. bench adamw (tree)
opt_state = tx.init(params)
def adamw_step(p, o, xb, yb):
    l, g = jax.value_and_grad(lambda q: loss_of(q, xb, yb))(p)
    up, o = tx.update(g, o, p)
    return optax.apply_updates(p, up), o, l
ad = jax.jit(adamw_step, donate_argnums=(0, 1))
report("adamw", timeit(lambda xb, yb: ad(jax.tree_util.tree_map(jnp.copy, params),
                                         jax.tree_util.tree_map(jnp.copy, opt_state), xb, yb), (x, y)))

# 6. adamw on a flat vector
flat_state = tx.init(flat0)
def flat_step(fp, o, xb, yb, which="dicece"):
    l, g = jax.value_and_grad(lambda q: loss_of(unravel(q), xb, yb, which))(fp)
    up, o = tx.update(g, o, fp)
    return fp + up, o, l
fl = jax.jit(flat_step, donate_argnums=(0, 1), static_argnums=(4,))
report("adamw-flat", timeit(lambda xb, yb: fl(jnp.copy(flat0), jax.tree_util.tree_map(jnp.copy, flat_state), xb, yb), (x, y)))

# 7. CE-only loss with flat adamw
report("ce-only", timeit(lambda xb, yb: fl(jnp.copy(flat0), jax.tree_util.tree_map(jnp.copy, flat_state), xb, yb, "ce"), (x, y)))

# 8. the committed bench step: bf16 param cast inside the loss, flat adamw
report("flat-bf16", timeit(lambda xb, yb: fl(jnp.copy(flat0), jax.tree_util.tree_map(jnp.copy, flat_state), xb, yb, "dicece-bf16"), (x, y)))

# 9. forward+grad with bf16 params, no optimizer
grb = jax.jit(lambda p, xb, yb: jax.value_and_grad(lambda q: loss_of(q, xb, yb, "dicece-bf16"))(p))
report("grad-bf16", timeit(grb, (params, x, y)))

# 10. fwd-only with bf16 params
fwdb = jax.jit(lambda p, xb: nnx.merge(graphdef, jax.tree_util.tree_map(
    lambda t: t.astype(jnp.bfloat16) if hasattr(t, 'dtype') and jnp.issubdtype(t.dtype, jnp.floating) else t, p), rest)(xb.astype(jnp.bfloat16)))
report("fwd-bf16", timeit(fwdb, (params, x)))

# 11. loss fwd only, bf16 params
lfb = jax.jit(lambda p, xb, yb: loss_of(p, xb, yb, "dicece-bf16"))
report("loss-bf16", timeit(lfb, (params, x, y)))
