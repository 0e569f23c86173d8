"""Lane-aware conv weight-grad VJP (ops/conv_vjp.py): the swapped-orientation
weight gradient must equal autodiff of the stock conv exactly — it is a layout
change, not an arithmetic change.  Reference behavior: stock torch Conv3d
autograd (monai/networks/blocks/convolutions.py:25)."""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from monai_tpu.ops.conv_vjp import conv3x3_lane_wgrad, wgrad_wants_swap

rng = np.random.RandomState(0)


def _ref_conv(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, w, (1, 1, 1), ((1, 1),) * 3, dimension_numbers=dn)


@pytest.mark.parametrize("ci,co,s", [(32, 2, 8), (16, 4, 6), (8, 8, 5), (3, 16, 6)])
def test_forward_and_grads_match_autodiff(ci, co, s):
    x = jnp.asarray(rng.randn(2, s, s, s, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)

    np.testing.assert_array_equal(np.asarray(conv3x3_lane_wgrad(x, w)),
                                  np.asarray(_ref_conv(x, w)))

    def ref_loss(x, w):
        y = _ref_conv(x, w)
        return jnp.sum(y * jnp.cos(y))  # non-trivial cotangent

    def got_loss(x, w):
        y = conv3x3_lane_wgrad(x, w)
        return jnp.sum(y * jnp.cos(y))

    rx, rw = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(got_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5, atol=1e-4)


def test_bf16_grads_finite_and_close():
    x = jnp.asarray(rng.randn(2, 6, 6, 6, 16).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, 16, 2).astype(np.float32) * 0.1).astype(jnp.bfloat16)

    gx, gw = jax.grad(lambda x, w: jnp.sum(conv3x3_lane_wgrad(x, w).astype(jnp.float32) ** 2),
                      argnums=(0, 1))(x, w)
    rx, rw = jax.grad(lambda x, w: jnp.sum(_ref_conv(x, w).astype(jnp.float32) ** 2),
                      argnums=(0, 1))(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gx, np.float32), np.asarray(rx, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gw, np.float32), np.asarray(rw, np.float32),
                               rtol=2e-2, atol=0.5)


def test_routing_rule():
    assert wgrad_wants_swap(32, 2)
    assert wgrad_wants_swap(48, 16)
    assert not wgrad_wants_swap(16, 16)
    assert not wgrad_wants_swap(1, 16)
    assert not wgrad_wants_swap(16, 32)
    # both saturate the 128 lanes: no reason to swap
    assert not wgrad_wants_swap(256, 128)


def test_unet_grads_match_unrouted():
    """End-to-end: UNet grads with the routed lane-aware VJP equal grads with
    the routing disabled (monkeypatched off).

    Run in float64 in a subprocess (jax_enable_x64 is process-global): the
    derivation is EXACT, so f64 grads must match to ~1e-12 — in f32 the deep
    instance-norm/PReLU chain chaotically amplifies the swapped orientation's
    different f32 contraction order into O(1) relative grad differences, which
    says nothing about correctness (the same blowup separates any two valid
    f32 reassociations)."""
    import subprocess
    import sys as _sys

    code = """
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp
from flax import nnx
import monai_tpu.ops.conv_vjp as cv
from monai_tpu.networks.nets import UNet
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(1, 1, 16, 16, 16).astype(np.float64))

def build_and_grad():
    net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
               strides=(2, 2), num_res_units=2, rngs=nnx.Rngs(0))
    gd, params, rest = nnx.split(net, nnx.Param, ...)
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.float64)
        if hasattr(t, 'dtype') and t.dtype == jnp.float32 else t, params)
    def loss(p):
        return jnp.sum(nnx.merge(gd, p, rest)(x) ** 2)
    return jax.grad(loss)(params)

g_on = build_and_grad()
cv.wgrad_wants_swap = lambda ci, co: False
g_off = build_and_grad()
for a, b in zip(jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-10)
print('OK')
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run([_sys.executable, "-c", code], capture_output=True, text=True,
                         env=env, timeout=600)
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr[-2000:]
