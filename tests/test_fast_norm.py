"""InstanceNormTPU (layers/fast_norm.py): lane-dense stats must match the plain
nnx.GroupNorm(groups=C) instance norm (the Norm.INSTANCE factory contract;
reference: torch InstanceNorm3d semantics)."""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

from monai_tpu.networks.layers.fast_norm import InstanceNormTPU, fast_instance_norm
from monai_tpu.networks.layers.factories import get_norm_layer

rng = np.random.RandomState(0)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 8, 2),
    (2, 8, 8, 8, 16),
    (2, 6, 6, 6, 16),
    (2, 5, 5, 5, 3),
    (2, 7, 9, 2),         # 2D spatial, odd sizes
    (3, 129, 256),
])
def test_matches_groupnorm(shape):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)) * 3.0 + 1.5
    c = shape[-1]
    ref = nnx.GroupNorm(num_features=c, num_groups=c, epsilon=1e-5,
                        use_bias=False, use_scale=False, rngs=nnx.Rngs(0))(x)
    got = fast_instance_norm(x, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_affine_params_and_factory():
    norm = get_norm_layer(("instance", {"affine": True}), 3, 4, rngs=nnx.Rngs(0))
    assert isinstance(norm, InstanceNormTPU)
    norm.scale.value = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    norm.bias.value = jnp.asarray([0.5, -0.5, 0.0, 1.0])
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 4).astype(np.float32))
    ref = nnx.GroupNorm(num_features=4, num_groups=4, epsilon=1e-5,
                        use_bias=True, use_scale=True, rngs=nnx.Rngs(0))
    ref.scale.value = norm.scale.value.reshape(ref.scale.value.shape)
    ref.bias.value = norm.bias.value.reshape(ref.bias.value.shape)
    np.testing.assert_allclose(np.asarray(norm(x)), np.asarray(ref(x)), rtol=1e-4, atol=1e-5)


def test_bf16_dtype_preserved():
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 2).astype(np.float32)).astype(jnp.bfloat16)
    y = fast_instance_norm(x)
    assert y.dtype == jnp.bfloat16
    ref = fast_instance_norm(x.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_custom_vjp_matches_autodiff_of_groupnorm():
    """The hand-derived VJP (dx = γ·inv·(g − mean g − x̂·mean g·x̂)) must equal
    autodiff of the plain normalization graph, incl. scale/bias grads."""
    import jax

    x0 = jnp.asarray(rng.randn(2, 6, 6, 6, 4).astype(np.float32))
    scale0 = jnp.asarray([1.0, 2.0, 0.5, -1.0])
    bias0 = jnp.asarray([0.1, -0.2, 0.0, 0.3])

    def ref_fn(x, scale, bias):
        axes = (1, 2, 3)
        m = jnp.mean(x, axis=axes, keepdims=True)
        v = jnp.mean((x - m) ** 2, axis=axes, keepdims=True)
        xhat = (x - m) * jax.lax.rsqrt(v + 1e-5)
        return jnp.sum((xhat * scale + bias) * jnp.cos(x))  # non-trivial cotangent

    def got_fn(x, scale, bias):
        return jnp.sum(fast_instance_norm(x, 1e-5, scale, bias) * jnp.cos(x))

    rg = jax.grad(ref_fn, argnums=(0, 1, 2))(x0, scale0, bias0)
    gg = jax.grad(got_fn, argnums=(0, 1, 2))(x0, scale0, bias0)
    for r, g in zip(rg, gg):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-4)


def test_custom_vjp_no_affine_and_bf16():
    import jax

    x0 = jnp.asarray(rng.randn(2, 6, 6, 6, 3).astype(np.float32))

    def ref_fn(x):
        axes = (1, 2, 3)
        m = jnp.mean(x, axis=axes, keepdims=True)
        v = jnp.mean((x - m) ** 2, axis=axes, keepdims=True)
        return jnp.sum(((x - m) * jax.lax.rsqrt(v + 1e-5)) ** 2 * jnp.sin(x))

    def got_fn(x):
        return jnp.sum(fast_instance_norm(x, 1e-5) ** 2 * jnp.sin(x))

    np.testing.assert_allclose(np.asarray(jax.grad(got_fn)(x0)),
                               np.asarray(jax.grad(ref_fn)(x0)), rtol=2e-3, atol=2e-4)
    # bf16 input: grads exist, carry bf16 dtype, and are finite
    xb = x0.astype(jnp.bfloat16)
    gb = jax.grad(lambda x: jnp.sum(fast_instance_norm(x, 1e-5).astype(jnp.float32)))(xb)
    assert gb.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gb, np.float32)).all()
