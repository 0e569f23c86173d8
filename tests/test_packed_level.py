"""Exactness of the level-resident packed conv maps and the packed UNet executor
(ops/packed_level.py, networks/nets/packed_unet.py).

Every weight map is validated against the live fine op it replaces: fine conv on
fine layout == d2s(packed conv on s2d layout). Reference workload:
monai/networks/nets/unet.py UNet forward.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax

from monai_tpu.networks.nets import UNet
from monai_tpu.networks.nets.packed_unet import packable, packed_unet_forward
from monai_tpu.ops.packed_level import (
    depth_to_space,
    pack_conv3x3_weights,
    pack_w_convT,
    pack_w_entry,
    pack_w_s2,
    packed_cat,
    packed_conv,
    packed_instance_norm,
    space_to_depth,
)

rng = np.random.RandomState(0)
_DN = ("NDHWC", "DHWIO", "NDHWC")


def _rand(*shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_pack_w_s2_exact():
    """Fine stride-2 SAME conv == packed-in/packed-out coarse stride-2 conv."""
    x = _rand(2, 8, 8, 8, 3)
    w = _rand(3, 3, 3, 3, 5)
    fine = lax.conv_general_dilated(x, w, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=_DN)
    xp = space_to_depth(x, (2, 2, 2))
    yp = packed_conv(xp, pack_w_s2(w), "s2")
    got = depth_to_space(yp, (2, 2, 2), 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fine), rtol=1e-5, atol=1e-5)


def test_pack_w_entry_exact():
    """Fine stride-2 SAME conv (fine input) == k5 s4 packed-output coarse conv."""
    x = _rand(2, 8, 8, 8, 3)
    w = _rand(3, 3, 3, 3, 5)
    fine = lax.conv_general_dilated(x, w, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=_DN)
    yp = packed_conv(x, pack_w_entry(w), "entry")
    got = depth_to_space(yp, (2, 2, 2), 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fine), rtol=1e-5, atol=1e-5)


def test_pack_w_convT_exact():
    """The blocks.Convolution transposed stride-2 conv == k2 s1 packed-output
    coarse conv (validates the torch-adjoint tap convention o = 2i + 2 - tau)."""
    from monai_tpu.networks.blocks.convolutions import Convolution

    conv = Convolution(3, 3, 5, strides=2, kernel_size=3, conv_only=True,
                       is_transposed=True, bias=True, rngs=nnx.Rngs(0))
    x = _rand(2, 6, 6, 6, 3)
    fine = conv(x)
    w = conv.conv.kernel.value
    b = conv.conv.bias.value
    yp = packed_conv(x, pack_w_convT(w), "convT", bias=b)
    got = depth_to_space(yp, (2, 2, 2), 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fine), rtol=1e-5, atol=1e-5)


def test_packed_instance_norm_matches_groupnorm():
    x = _rand(2, 8, 8, 8, 4)
    gn = nnx.GroupNorm(num_features=4, num_groups=4, epsilon=1e-5,
                       use_bias=False, use_scale=False, rngs=nnx.Rngs(0))
    fine = gn(x)
    xp = space_to_depth(x, (2, 2, 2))
    got = depth_to_space(packed_instance_norm(xp, 4), (2, 2, 2), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fine), rtol=1e-4, atol=1e-5)


def test_packed_cat_matches_fine_concat():
    a, b = _rand(1, 4, 4, 4, 3), _rand(1, 4, 4, 4, 2)
    fine = jnp.concatenate([a, b], axis=-1)
    got = depth_to_space(
        packed_cat(space_to_depth(a, (2, 2, 2)), 3, space_to_depth(b, (2, 2, 2)), 2),
        (2, 2, 2), 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fine), rtol=0, atol=0)


@pytest.mark.parametrize("pack_tail,pack_level0", [(False, True), (True, True),
                                                   (True, False)])
def test_packed_unet_forward_matches_plain(pack_tail, pack_level0):
    """The packed executor reproduces UNet.__call__ on the bench config family.
    (pack_tail=True, pack_level0=False) is the shipped bench eval path — the only
    measured-winning combination (packed_unet.py docstring table)."""
    net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
               strides=(2, 2), num_res_units=2, rngs=nnx.Rngs(0))
    x = _rand(2, 1, 16, 16, 16)
    assert packable(net, x.shape)
    ref = net(x)
    got = packed_unet_forward(net, x, pack_tail=pack_tail, pack_level0=pack_level0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_packed_unet_forward_jits_and_grads():
    net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
               strides=(2, 2), num_res_units=2, rngs=nnx.Rngs(0))
    graphdef, params, rest = nnx.split(net, nnx.Param, ...)
    x = _rand(1, 1, 16, 16, 16)

    @jax.jit
    def loss(params, x):
        return jnp.sum(jnp.abs(packed_unet_forward(nnx.merge(graphdef, params, rest), x)))

    g = jax.grad(loss)(params, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_packable_guards():
    net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
               strides=(2, 2), num_res_units=2, rngs=nnx.Rngs(0))
    assert packable(net, (1, 1, 16, 16, 16))
    assert not packable(net, (1, 1, 18, 18, 18))  # not divisible by 4
    net2d = UNet(spatial_dims=2, in_channels=1, out_channels=2, channels=(4, 8, 16),
                 strides=(2, 2), num_res_units=2, rngs=nnx.Rngs(0))
    assert not packable(net2d, (1, 1, 16, 16))
    wide = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(32, 64, 128),
                strides=(2, 2), num_res_units=2, rngs=nnx.Rngs(0))
    assert not packable(wide, (1, 1, 16, 16, 16))  # top level not lane-starved
    plain = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
                 strides=(2, 2), num_res_units=0, rngs=nnx.Rngs(0))
    assert not packable(plain, (1, 1, 16, 16, 16))
