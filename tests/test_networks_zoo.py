"""Smoke tests for the wider network zoo: construct tiny configs and check output shapes
(modeled on the reference's per-net shape tests, e.g. tests/test_flexible_unet.py)."""
import jax.numpy as jnp
import pytest
from flax import nnx

import monai_tpu.networks.nets as nets


def _rngs():
    return nnx.Rngs(0)


CASES = [
    # (builder, input shape, expected output shape or checker)
    (lambda: nets.EfficientNetBN("efficientnet-b0", spatial_dims=2, in_channels=3,
                                 num_classes=4, rngs=_rngs()),
     (1, 3, 64, 64), (1, 4)),
    (lambda: nets.FlexibleUNet(in_channels=3, out_channels=2, backbone="efficientnet-b0",
                               rngs=_rngs()),
     (1, 3, 64, 64), (1, 2, 64, 64)),
    (lambda: nets.MedNeXt(spatial_dims=2, in_channels=1, out_channels=2, init_filters=8,
                          blocks_down=(1, 1), blocks_bottleneck=1, blocks_up=(1, 1),
                          kernel_size=3, use_residual_connection=True, rngs=_rngs()),
     (1, 1, 32, 32), (1, 2, 32, 32)),
    (lambda: nets.SEResNet50(spatial_dims=2, in_channels=3, num_classes=3, rngs=_rngs()),
     (1, 3, 64, 64), (1, 3)),
    (lambda: nets.Quicknat(num_classes=3, num_channels=1, num_filters=8, rngs=_rngs()),
     (1, 1, 32, 32), (1, 3, 32, 32)),
    (lambda: nets.HoVerNet(out_classes=3, rngs=_rngs()),
     (1, 3, 64, 64), None),  # dict output, checked below
    (lambda: nets.MILModel(num_classes=4, mil_mode="att", rngs=_rngs()),
     (1, 2, 3, 32, 32), (1, 4)),
    (lambda: nets.SPADENet(2, in_channels=1, out_channels=1, label_nc=3, input_shape=(32, 32),
                           channels=[8, 16], z_dim=4, is_vae=True, rngs=_rngs()),
     None, None),  # custom call below
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_network_forward_shapes(case_idx):
    builder, in_shape, out_shape = CASES[case_idx]
    net = builder()
    if in_shape is None:  # SPADENet: (seg, x) signature
        seg = jnp.ones((1, 3, 32, 32))
        x = jnp.ones((1, 1, 32, 32))
        out, mu, logvar = net(seg, x)
        assert out.shape == (1, 1, 32, 32) and mu.shape == (1, 4)
        return
    out = net(jnp.ones(in_shape))
    if out_shape is None:  # HoVerNet dict
        assert set(out) == {"nucleus_prediction", "horizontal_vertical", "type_prediction"}
        assert out["nucleus_prediction"].shape == (1, 2, 64, 64)
        return
    assert out.shape == out_shape


def test_vista3d_class_and_point_branches():
    m = nets.vista3d132(encoder_embed_dim=8, rngs=_rngs())
    x = jnp.ones((1, 1, 16, 16, 16))
    assert m(x, class_vector=jnp.asarray([1, 2])).shape == (2, 1, 16, 16, 16)
    out = m(x, point_coords=jnp.asarray([[[8.0, 8.0, 8.0]]]), point_labels=jnp.asarray([[1]]))
    assert out.shape == (1, 1, 16, 16, 16)


def test_netadapter_replaces_head():
    base = nets.resnet18(spatial_dims=2, n_input_channels=3, num_classes=10, rngs=_rngs())
    adapted = nets.NetAdapter(base, num_classes=5, dim=2, rngs=_rngs())
    assert adapted(jnp.ones((2, 3, 32, 32))).shape == (2, 5)
