"""Shape/behavior tests for network blocks and layers
(reference: tests/networks/blocks/*, tests/networks/layers/* — the reference has a
test file per block; this is the parametrized equivalent)."""
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import monai_tpu.networks.blocks as B
import monai_tpu.networks.layers as L


def R():
    return nnx.Rngs(0)


def _x(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape).astype(np.float32))


# Blocks are CHANNEL-LAST internally (TPU-first layout; the networks transpose at
# their own boundary) — inputs here are (B, *spatial, C).
# (name, builder, input shape, expected output shape or None)
BLOCK_CASES = [
    ("Convolution2d", lambda: B.Convolution(2, 1, 4, strides=2, rngs=R()), (1, 16, 16, 1),
     (1, 8, 8, 4)),
    ("Convolution3d", lambda: B.Convolution(3, 2, 4, rngs=R()), (1, 8, 8, 8, 2),
     (1, 8, 8, 8, 4)),
    ("ConvolutionTransposed", lambda: B.Convolution(2, 4, 2, strides=2, is_transposed=True,
                                                    rngs=R()), (1, 8, 8, 4), (1, 16, 16, 2)),
    ("ResidualUnit", lambda: B.ResidualUnit(2, 1, 4, strides=2, rngs=R()), (1, 16, 16, 1),
     (1, 8, 8, 4)),
    ("UpSample-deconv", lambda: B.UpSample(2, in_channels=4, out_channels=2, scale_factor=2,
                                           mode="deconv", rngs=R()), (1, 8, 8, 4),
     (1, 16, 16, 2)),
    ("UpSample-nontrainable", lambda: B.UpSample(2, in_channels=4, out_channels=4,
                                                 scale_factor=2, mode="nontrainable", rngs=R()),
     (1, 8, 8, 4), (1, 16, 16, 4)),
    ("UpSample-pixelshuffle", lambda: B.UpSample(2, in_channels=4, out_channels=1,
                                                 scale_factor=2, mode="pixelshuffle", rngs=R()),
     (1, 8, 8, 4), (1, 16, 16, 1)),
    ("SubpixelUpsample", lambda: B.SubpixelUpsample(2, 4, 2, scale_factor=2, rngs=R()),
     (1, 8, 8, 4), (1, 16, 16, 2)),
    ("SubpixelDownsample", lambda: B.SubpixelDownsample(2, 1, scale_factor=2, rngs=R()),
     (1, 8, 8, 1), (1, 4, 4, 4)),
    ("MaxAvgPool", lambda: B.MaxAvgPool(2, kernel_size=2), (1, 8, 8, 3), (1, 4, 4, 6)),
    ("SABlock", lambda: B.SABlock(hidden_size=16, num_heads=2, rngs=R()), (2, 5, 16),
     (2, 5, 16)),
    ("CrossAttentionBlock", lambda: B.CrossAttentionBlock(hidden_size=16, num_heads=2,
                                                          rngs=R()), (2, 5, 16), (2, 5, 16)),
    ("TransformerBlock", lambda: B.TransformerBlock(hidden_size=16, mlp_dim=32, num_heads=2,
                                                    rngs=R()), (2, 5, 16), (2, 5, 16)),
    ("MLPBlock", lambda: B.MLPBlock(hidden_size=16, mlp_dim=32, rngs=R()), (2, 5, 16),
     (2, 5, 16)),
    ("PatchEmbeddingBlock", lambda: B.PatchEmbeddingBlock(
        in_channels=1, img_size=(16, 16), patch_size=(4, 4), hidden_size=16, num_heads=2,
        proj_type="conv", pos_embed_type="learnable", spatial_dims=2, rngs=R()),
     (2, 1, 16, 16), (2, 16, 16)),
    ("PatchEmbed", lambda: B.PatchEmbed(patch_size=2, in_chans=1, embed_dim=8,
                                        spatial_dims=2, rngs=R()), (2, 16, 16, 1),
     (2, 8, 8, 8)),
    ("UnetBasicBlock", lambda: B.UnetBasicBlock(2, 1, 4, kernel_size=3, stride=1,
                                                norm_name="instance", rngs=R()),
     (1, 16, 16, 1), (1, 16, 16, 4)),
    ("UnetResBlock", lambda: B.UnetResBlock(2, 1, 4, kernel_size=3, stride=2,
                                            norm_name="instance", rngs=R()),
     (1, 16, 16, 1), (1, 8, 8, 4)),
    ("UnetrBasicBlock", lambda: B.UnetrBasicBlock(2, 1, 4, kernel_size=3, stride=1,
                                                  norm_name="instance", rngs=R()),
     (1, 16, 16, 1), (1, 16, 16, 4)),
    ("ChannelSELayer", lambda: B.ChannelSELayer(2, in_channels=8, r=2, rngs=R()),
     (1, 8, 8, 8), (1, 8, 8, 8)),
    ("ResidualSELayer", lambda: B.ResidualSELayer(2, in_channels=8, r=2, rngs=R()),
     (1, 8, 8, 8), (1, 8, 8, 8)),
    ("SimpleASPP", lambda: B.SimpleASPP(2, 4, 2, rngs=R()), (1, 8, 8, 4), (1, 8, 8, 8)),
    ("DenseBlock", lambda: B.DenseBlock([B.Convolution(2, 1, 2, rngs=R()),
                                         B.Convolution(2, 3, 2, rngs=R())]),
     (1, 8, 8, 1), (1, 8, 8, 5)),
    ("FCN", lambda: B.FCN(out_channels=2, rngs=R()), (1, 3, 32, 32), (1, 2, 32, 32)),  # wraps a resnet NET: channel-first
    ("SEBlock", lambda: B.SEBlock(2, 4, 4, 4, 4, r=2, rngs=R()), (1, 8, 8, 4), (1, 8, 8, 4)),
    ("SpatialAttentionBlock", lambda: B.SpatialAttentionBlock(spatial_dims=2, num_channels=8,
                                                              num_head_channels=4, rngs=R()),
     (1, 8, 8, 8), (1, 8, 8, 8)),
]


@pytest.mark.parametrize("name,build,in_shape,out_shape", BLOCK_CASES,
                         ids=[c[0] for c in BLOCK_CASES])
def test_block_shapes(name, build, in_shape, out_shape):
    blk = build()
    out = blk(_x(in_shape))
    if isinstance(out, (list, tuple)):
        out = out[0]
    assert bool(jnp.all(jnp.isfinite(out))), name
    if out_shape is not None:
        assert tuple(out.shape) == out_shape, f"{name}: {out.shape} vs {out_shape}"


def test_warp_identity_flow():
    warp = B.Warp()
    img = _x((1, 1, 8, 8))
    ddf = jnp.zeros((1, 2, 8, 8))
    out = warp(img, ddf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_dvf2ddf_zero_velocity():
    dvf2ddf = B.DVF2DDF(num_steps=4)
    dvf = jnp.zeros((1, 2, 8, 8))
    out = dvf2ddf(dvf)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_fpn_shapes():
    fpn = B.FeaturePyramidNetwork(spatial_dims=2, in_channels_list=[4, 8], out_channels=8,
                                  rngs=R())
    from collections import OrderedDict
    feats = OrderedDict([("feat0", _x((1, 16, 16, 4))), ("feat1", _x((1, 8, 8, 8)))])
    out = fpn(feats)
    assert tuple(out["feat0"].shape) == (1, 16, 16, 8)
    assert tuple(out["feat1"].shape) == (1, 8, 8, 8)


def test_crf_smoke():
    crf = B.CRF(iterations=2)
    unary = _x((1, 2, 8, 8))
    ref_img = _x((1, 1, 8, 8), seed=1)
    out = crf(unary, ref_img)
    assert out.shape == unary.shape


LAYER_CASES = [
    ("GaussianFilter", lambda: L.GaussianFilter(2, sigma=1.0), (1, 1, 12, 12)),
    ("MedianFilter", lambda: L.MedianFilter(radius=1, spatial_dims=2), (1, 1, 8, 8)),
    ("MeanFilter", lambda: L.MeanFilter(2, 3), (1, 1, 8, 8)),
    ("SavitzkyGolayFilter", lambda: L.SavitzkyGolayFilter(window_length=5, order=2),
     (1, 1, 16, 16)),
    ("SkipConnection", lambda: L.SkipConnection(lambda x: x * 2), (1, 2, 8, 8)),
    ("ChannelPad-pad", lambda: L.ChannelPad(2, 2, 6, mode="pad"), (1, 2, 8, 8)),
]


@pytest.mark.parametrize("name,build,in_shape", LAYER_CASES, ids=[c[0] for c in LAYER_CASES])
def test_layer_shapes(name, build, in_shape):
    layer = build()
    out = layer(_x(in_shape))
    assert bool(jnp.all(jnp.isfinite(jnp.asarray(out)))), name


def test_drop_path_zero_prob_is_identity():
    dp = L.DropPath(drop_prob=0.0, rngs=R())
    x = _x((4, 2, 8, 8))
    out = dp(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_vector_quantizer_roundtrip():
    vq = L.VectorQuantizer(spatial_dims=2, num_embeddings=8, embedding_dim=4, rngs=R())
    x = _x((1, 4, 8, 8))  # channel-first like the VQVAE net boundary
    quantized, loss, indices = vq(x)
    assert quantized.shape == x.shape
    assert indices.shape == (1, 8, 8)
    assert np.isfinite(float(loss))


def test_affine_transform_identity():
    at = L.AffineTransform(normalized=True, align_corners=False)
    img = _x((1, 1, 8, 8))
    theta = jnp.asarray(np.tile(np.eye(2, 3, dtype=np.float32), (1, 1, 1)))
    out = at(img, theta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_conjugate_gradient_solves():
    # solve A x = y for SPD A via the ConjugateGradient layer
    rng = np.random.RandomState(0)
    m = rng.rand(4, 4).astype(np.float32)
    A = m @ m.T + 4 * np.eye(4, dtype=np.float32)

    def linop(x):
        return jnp.asarray(A) @ x

    cg = L.ConjugateGradient(linop, num_iter=20)
    y = jnp.asarray(rng.rand(4).astype(np.float32))
    x0 = jnp.zeros(4)
    x = cg(x0, y)
    np.testing.assert_allclose(np.asarray(linop(x)), np.asarray(y), atol=1e-3)


def test_lltm_forward():
    lltm = L.LLTM(input_features=4, state_size=3, rngs=R())
    x = _x((2, 4))
    h, c = lltm(x, (jnp.zeros((2, 3)), jnp.zeros((2, 3))))
    assert h.shape == (2, 3) and c.shape == (2, 3)


def test_gaussian_mixture_model():
    gmm = L.GaussianMixtureModel(channel_count=2, mixture_count=2, mixture_size=2,
                                 verbose_build=False)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 2, 64).astype(np.float32))
    labels = jnp.asarray((rng.rand(1, 64) > 0.5).astype(np.int32))
    gmm.learn(feats, labels)
    out = gmm.apply(feats)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()


SCHED_NAMES = ["DDPMScheduler", "DDIMScheduler", "PNDMScheduler", "RFlowScheduler"]


@pytest.mark.parametrize("name", SCHED_NAMES)
def test_scheduler_add_noise_and_step(name):
    import monai_tpu.networks.schedulers as S

    sched = getattr(S, name)(num_train_timesteps=100)
    x0 = _x((1, 1, 8, 8))
    noise = _x((1, 1, 8, 8), seed=1)
    if name == "RFlowScheduler":
        noisy = sched.add_noise(x0, noise, jnp.asarray([50]))
    else:
        noisy = sched.add_noise(x0, noise, jnp.asarray([50]))
    assert noisy.shape == x0.shape
    sched.set_timesteps(10)
    t = sched.timesteps[0]
    model_out = _x((1, 1, 8, 8), seed=2)
    res = sched.step(model_out, t, noisy)
    prev = res[0] if isinstance(res, tuple) else res
    assert np.asarray(prev).shape == x0.shape
    assert np.isfinite(np.asarray(prev)).all()
