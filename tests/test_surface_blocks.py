"""Behavior tests for the round-3 public-surface additions: reference-named
building blocks, dict wrappers, and utility classes (VERDICT r2 #4 acceptance:
each new component has a behavior test)."""
from __future__ import annotations

import json
import os
import warnings

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

rng = np.random.RandomState(0)


# ---------------------------------------------------------------------------
# pathology dict wrappers
# ---------------------------------------------------------------------------
def _hovernet_maps():
    """Synthetic 2-nucleus NP logits + hover maps."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w]
    m1 = ((yy - 10) ** 2 + (xx - 10) ** 2) < 25
    m2 = ((yy - 22) ** 2 + (xx - 22) ** 2) < 25
    fg = m1 | m2
    logits = np.stack([np.where(fg, -4.0, 4.0), np.where(fg, 4.0, -4.0)]).astype(np.float32)
    hmap = np.zeros((h, w), np.float32)
    vmap = np.zeros((h, w), np.float32)
    for m, (cy, cx) in [(m1, (10, 10)), (m2, (22, 22))]:
        hmap[m] = ((xx - cx) / 5.0)[m]
        vmap[m] = ((yy - cy) / 5.0)[m]
    return logits, np.stack([hmap, vmap])


def test_pathology_dict_wrapper_chain_matches_array_path():
    from monai_tpu.apps.pathology import (
        GenerateDistanceMap, GenerateDistanceMapd, GenerateInstanceBorder,
        GenerateInstanceBorderd, GenerateWatershedMarkers, GenerateWatershedMarkersd,
        GenerateWatershedMask, GenerateWatershedMaskd,
    )

    logits, hv = _hovernet_maps()
    d = {"pred": logits, "hover_map": hv}
    d = GenerateWatershedMaskd(keys="pred")(d)
    d = GenerateInstanceBorderd()(d)
    d = GenerateDistanceMapd()(d)
    d = GenerateWatershedMarkersd()(d)

    mask = GenerateWatershedMask()(logits)
    border = GenerateInstanceBorder()(mask, hv)
    np.testing.assert_array_equal(d["mask"], mask)
    np.testing.assert_allclose(d["border"], border)
    np.testing.assert_allclose(d["dist_map"], GenerateDistanceMap()(mask, border))
    np.testing.assert_array_equal(d["markers"], GenerateWatershedMarkers()(mask, border))
    # output-key collision raises, as in the reference
    with pytest.raises(KeyError):
        GenerateInstanceBorderd()(d)


def test_hovernet_instance_map_post_processing_d():
    from monai_tpu.apps.pathology import HoVerNetInstanceMapPostProcessingd
    from monai_tpu.transforms import ComputeHoVerMaps

    y, x = np.ogrid[0:48, 0:48]
    lab = np.zeros((48, 48), int)
    lab[(x - 12) ** 2 + (y - 12) ** 2 <= 49] = 1
    lab[(x - 34) ** 2 + (y - 32) ** 2 <= 36] = 2
    hv = np.asarray(ComputeHoVerMaps()(lab[None]))
    logits = np.where(lab > 0, 6.0, -6.0)[None]
    d = {"nucleus_prediction": logits, "horizontal_vertical": hv}
    out = HoVerNetInstanceMapPostProcessingd(activation="sigmoid")(d)
    assert "instance_map" in out and "instance_info" in out
    inst = np.asarray(out["instance_map"])
    assert len(set(np.unique(inst)) - {0}) == 2  # both nuclei found
    info = out["instance_info"]
    for v in info.values():
        assert {"bounding_box", "centroid", "contour"} <= set(v)


# ---------------------------------------------------------------------------
# auto3dseg EnsureSameShaped
# ---------------------------------------------------------------------------
def test_ensure_same_shaped():
    from monai_tpu.apps.auto3dseg import EnsureSameShaped

    img = np.zeros((1, 16, 16, 16), np.float32)
    lbl = np.zeros((1, 15, 16, 17), np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = EnsureSameShaped(allowed_shape_difference=5)({"image": img, "label": lbl})
    assert tuple(out["label"].shape) == (1, 16, 16, 16)
    # already matching: untouched
    out2 = EnsureSameShaped()({"image": img, "label": np.ones((1, 16, 16, 16))})
    assert np.all(np.asarray(out2["label"]) == 1)
    with pytest.raises(ValueError):
        EnsureSameShaped(allowed_shape_difference=2)(
            {"image": img, "label": np.zeros((1, 30, 16, 16))})


# ---------------------------------------------------------------------------
# diffusion UNet building blocks
# ---------------------------------------------------------------------------
def test_diffusion_blocks_shapes():
    from monai_tpu.networks.nets.diffusion_model_unet import (
        AttnDownBlock, AttnMidBlock, CrossAttnUpBlock, DiffusionUnetDownsample,
        DownBlock, UpBlock, WrappedUpsample,
    )

    r = nnx.Rngs(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))  # (B, H, W, C)
    temb = jnp.asarray(rng.rand(2, 64).astype(np.float32))

    down = DownBlock(2, 16, 32, 64, num_res_blocks=2, norm_num_groups=8, rngs=r)
    h, skips = down(x, temb)
    assert h.shape == (2, 4, 4, 32) and len(skips) == 3
    assert skips[0].shape == (2, 8, 8, 32)

    attn_down = AttnDownBlock(2, 16, 32, 64, num_res_blocks=1, norm_num_groups=8,
                              num_head_channels=8, add_downsample=False, rngs=r)
    h2, skips2 = attn_down(x, temb)
    assert h2.shape == (2, 8, 8, 32) and len(skips2) == 1

    mid = AttnMidBlock(2, 16, 64, norm_num_groups=8, num_head_channels=8, rngs=r)
    assert mid(x, temb).shape == x.shape

    up = UpBlock(2, 16, 16, 16, 64, num_res_blocks=1, norm_num_groups=8,
                 add_upsample=True, rngs=r)
    out = up(x, [x], temb)
    assert out.shape == (2, 16, 16, 16)

    ctx = jnp.asarray(rng.rand(2, 3, 24).astype(np.float32))
    cup = CrossAttnUpBlock(2, 16, 16, 16, 64, cross_attention_dim=24, num_res_blocks=1,
                           norm_num_groups=8, num_head_channels=8, add_upsample=False,
                           rngs=r)
    assert cup(x, [x], temb, context=ctx).shape == x.shape

    ds = DiffusionUnetDownsample(2, 16, use_conv=True, rngs=r)
    assert ds(x).shape == (2, 4, 4, 16)
    dsp = DiffusionUnetDownsample(2, 16, use_conv=False, rngs=r)
    assert dsp(x).shape == (2, 4, 4, 16)
    np.testing.assert_allclose(np.asarray(dsp(x))[0, 0, 0, 0],
                               np.asarray(x)[0, :2, :2, 0].mean(), rtol=1e-5)
    upz = WrappedUpsample(2, 16, rngs=r)
    assert upz(x).shape == (2, 16, 16, 16)


# ---------------------------------------------------------------------------
# AEKL building blocks
# ---------------------------------------------------------------------------
def test_aekl_encoder_decoder():
    from monai_tpu.networks.nets.autoencoderkl import (
        AEKLDownsample, AsymmetricPad, Decoder, Encoder,
    )

    r = nnx.Rngs(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    enc = Encoder(2, 1, (8, 16), 6, (1, 1), norm_num_groups=8,
                  attention_levels=(False, False), with_nonlocal_attn=False, rngs=r)
    z = enc(x)
    assert z.shape == (1, 8, 8, 6)
    dec = Decoder(2, (8, 16), 3, 1, (1, 1), norm_num_groups=8,
                  attention_levels=(False, False), with_nonlocal_attn=False, rngs=r)
    y = dec(jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32)))
    assert y.shape == (1, 16, 16, 1)
    assert AsymmetricPad(2)(x).shape == (1, 17, 17, 1)
    assert AEKLDownsample(2, 1, rngs=r)(x).shape == (1, 8, 8, 1)


def test_spade_up_block():
    from monai_tpu.networks.nets.spade_diffusion_model_unet import SPADEUpBlock

    r = nnx.Rngs(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 16).astype(np.float32))
    temb = jnp.asarray(rng.rand(1, 32).astype(np.float32))
    seg = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))  # channels-last seg
    blk = SPADEUpBlock(2, 16, 16, 16, 32, label_nc=3, num_res_blocks=1,
                       norm_num_groups=8, add_upsample=True, rngs=r)
    out = blk(x, [x], temb, seg)
    assert out.shape == (1, 16, 16, 16)


# ---------------------------------------------------------------------------
# quicknat / dynunet / dints helpers
# ---------------------------------------------------------------------------
def test_quicknat_helpers():
    from monai_tpu.networks.nets.quicknat import (
        Bottleneck, ClassifierBlock, SequentialWithIdx, SkipConnectionWithIdx,
    )

    r = nnx.Rngs(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    cls = ClassifierBlock(2, 4, 3, rngs=r)
    y, idx = cls(x)
    assert y.shape == (1, 8, 8, 3) and idx is None

    bn = Bottleneck(4, num_filters=4, kernel_size=3, rngs=r)
    y, idx = bn(x, None)
    assert y.shape == (1, 8, 8, 4)

    seq = SequentialWithIdx(bn, SkipConnectionWithIdx(bn))
    y2, _ = seq(x, None)
    assert y2.shape == (1, 8, 8, 8)  # cat doubles channels


def test_dynunet_skip_layer_and_stem():
    from monai_tpu.networks.nets.dints import StemTS
    from monai_tpu.networks.nets.dynunet import DynUNetSkipLayer

    class Half(nnx.Module):
        def __call__(self, x):
            return x * 0.5

    class UpCat(nnx.Module):
        def __call__(self, x, skip):
            return x + skip

    heads = [None]
    layer = DynUNetSkipLayer(1, Half(), UpCat(), Half(), heads=heads, super_head=Half())
    out = layer(jnp.ones((1, 4, 4, 2)))
    np.testing.assert_allclose(np.asarray(out), 0.75)  # 0.25 (down→next) + 0.5 skip
    np.testing.assert_allclose(np.asarray(heads[0]), 0.375)

    stem = StemTS(Half(), Half())
    np.testing.assert_allclose(np.asarray(stem(jnp.ones((2, 2)))), 0.25)


# ---------------------------------------------------------------------------
# regunet / segresnet / daf3d / controlnet / transformer blocks
# ---------------------------------------------------------------------------
def test_affine_head_identity_init_gives_zero_ddf():
    from monai_tpu.networks.nets.regunet import AdditiveUpSampleBlock, AffineHead

    r = nnx.Rngs(0)
    head = AffineHead(2, image_size=(8, 8), decode_size=(2, 2), in_channels=4, rngs=r)
    feat = jnp.asarray(rng.rand(3, 2, 2, 4).astype(np.float32))
    ddf = head(feat)
    assert ddf.shape == (3, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(ddf), 0.0, atol=1e-6)

    up = AdditiveUpSampleBlock(2, 8, 4, rngs=r)
    out = up(jnp.asarray(rng.rand(1, 4, 4, 8).astype(np.float32)))
    assert out.shape == (1, 8, 8, 4)


def test_segres_encoder_pyramid():
    from monai_tpu.networks.nets.segresnet_ds import SegResBlock, SegResEncoder

    r = nnx.Rngs(0)
    enc = SegResEncoder(2, init_filters=8, in_channels=1, blocks_down=(1, 1, 1),
                        norm=("GROUP", {"num_groups": 8}), rngs=r)
    feats = enc(jnp.asarray(rng.rand(1, 1, 16, 16).astype(np.float32)))
    assert [f.shape for f in feats] == [(1, 8, 16, 16), (1, 16, 8, 8), (1, 32, 4, 4)]

    blk = SegResBlock(2, 8, norm=("GROUP", {"num_groups": 8}), rngs=r)
    x = jnp.asarray(rng.rand(1, 8, 8, 8).astype(np.float32))
    assert blk(x).shape == x.shape


def test_daf3d_fpn():
    from monai_tpu.networks.nets.daf3d import Daf3dFPN

    r = nnx.Rngs(0)
    fpn = Daf3dFPN(3, (8, 16), 4, rngs=r)
    feats = [jnp.asarray(rng.rand(1, 4, 8, 8, 8).astype(np.float32)),
             jnp.asarray(rng.rand(1, 2, 4, 4, 16).astype(np.float32))]
    outs = fpn(feats)
    assert [o.shape for o in outs] == [(1, 4, 8, 8, 4), (1, 2, 4, 4, 4)]


def test_controlnet_conditioning_embedding():
    from monai_tpu.networks.nets.controlnet import ControlNetConditioningEmbedding

    r = nnx.Rngs(0)
    emb = ControlNetConditioningEmbedding(2, 1, 8, channels=(4, 8), rngs=r)
    out = emb(jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32)))
    assert out.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)  # zero-init out conv


def test_absolute_positional_embedding():
    from monai_tpu.networks.nets.transformer import AbsolutePositionalEmbedding

    emb = AbsolutePositionalEmbedding(16, 8, rngs=nnx.Rngs(0))
    tok = jnp.zeros((2, 5), jnp.int32)
    out = emb(tok)
    assert out.shape == (2, 5, 8)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))


# ---------------------------------------------------------------------------
# detection: heads + sampler base
# ---------------------------------------------------------------------------
def test_retinanet_heads_and_sampler_base():
    from monai_tpu.apps.detection import (
        HardNegativeSamplerBase, RetinaNetClassificationHead, RetinaNetRegressionHead,
    )

    r = nnx.Rngs(0)
    feats = [jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32)),
             jnp.asarray(rng.rand(1, 4, 4, 4, 16).astype(np.float32))]
    cls = RetinaNetClassificationHead(16, num_anchors=3, num_classes=2, spatial_dims=3,
                                      rngs=r)
    outs = cls(feats)
    assert [o.shape for o in outs] == [(1, 8, 8, 8, 6), (1, 4, 4, 4, 6)]
    reg = RetinaNetRegressionHead(16, num_anchors=3, spatial_dims=3, rngs=r)
    outs = reg(feats)
    assert [o.shape for o in outs] == [(1, 8, 8, 8, 18), (1, 4, 4, 4, 18)]

    base = HardNegativeSamplerBase(pool_size=2)
    probs = np.asarray([0.9, 0.1, 0.8, 0.2, 0.7, 0.3])
    neg = np.arange(6)
    sel = base.select_negatives(neg, 2, probs)
    assert len(sel) == 2 and set(sel) <= {0, 2, 4, 5}  # from the top-4 pool


# ---------------------------------------------------------------------------
# maisi blocks
# ---------------------------------------------------------------------------
def test_maisi_blocks():
    from monai_tpu.apps.generation.maisi.networks.autoencoderkl_maisi import (
        MaisiConvolution, MaisiDownsample, MaisiGroupNorm3D, MaisiResBlock, MaisiUpsample,
    )

    r = nnx.Rngs(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 8, 8).astype(np.float32))
    gn = MaisiGroupNorm3D(4, 8, norm_float16=True, rngs=r)
    assert gn(x).dtype == jnp.float16
    conv = MaisiConvolution(3, 8, 4, rngs=r)
    assert conv(x).shape == (1, 8, 8, 8, 4)
    assert MaisiDownsample(3, 8, rngs=r)(x).shape == (1, 4, 4, 4, 8)
    assert MaisiUpsample(3, 8, rngs=r)(x).shape == (1, 16, 16, 16, 8)
    assert MaisiResBlock(3, 8, 4, 1e-6, 8, rngs=r)(x).shape == x.shape


# ---------------------------------------------------------------------------
# nnunet utils
# ---------------------------------------------------------------------------
def test_nnunet_dataset_json_and_data_copy(tmp_path):
    from monai_tpu.apps.nnunet import (
        NNUNETMode, analyze_data, create_new_data_copy, create_new_dataset_json,
    )
    from monai_tpu.data.nifti import write_nifti

    assert NNUNETMode.N_3D_FULLRES == "3d_fullres"

    out_json = tmp_path / "dataset.json"
    create_new_dataset_json("CT", 2, 1, 5, str(out_json))
    data = json.loads(out_json.read_text())
    assert data["channel_names"] == {"0": "CT"}
    assert data["labels"] == {"background": 0, "class1": 1, "class2": 2}
    assert data["numTraining"] == 5

    # tiny dataset on disk
    data_dir = tmp_path / "raw"
    data_dir.mkdir()
    img = rng.rand(6, 6, 6).astype(np.float32)
    seg = (rng.rand(6, 6, 6) > 0.5).astype(np.uint8) * 2
    write_nifti(img, data_dir / "img0.nii.gz", affine=np.eye(4))
    write_nifti(seg, data_dir / "seg0.nii.gz", affine=np.eye(4))
    datalist = {"training": [{"image": "img0.nii.gz", "label": "seg0.nii.gz"}],
                "testing": []}
    nic, nfc = analyze_data(datalist, str(data_dir))
    assert (nic, nfc) == (1, 2)

    out_dir = tmp_path / "nnraw"
    for sub in ("imagesTr", "imagesTs", "labelsTr", "labelsTs"):
        (out_dir / sub).mkdir(parents=True)
    create_new_data_copy("testing", datalist, str(data_dir), 1, str(out_dir))
    assert (out_dir / "imagesTr" / "case_0_0000.nii.gz").exists()
    assert (out_dir / "labelsTr" / "case_0.nii.gz").exists()
    mapping = json.loads((out_dir / "datalist.json").read_text())
    assert mapping["training"][0]["new_name"] == "case_0"


# ---------------------------------------------------------------------------
# misc utility classes
# ---------------------------------------------------------------------------
def test_lr_finder_iters():
    from monai_tpu.optimizers import DataLoaderIter, TrainDataLoaderIter, ValDataLoaderIter

    batches = [{"image": i, "label": -i} for i in range(3)]
    get_i, get_l = (lambda b: b["image"]), (lambda b: b["label"])
    it = DataLoaderIter(batches, get_i, get_l)
    assert next(it) == (0, 0)

    tr = TrainDataLoaderIter(batches, get_i, get_l, auto_reset=True)
    vals = [next(tr) for _ in range(5)]  # wraps past the end
    assert vals[3] == (0, 0)

    va = ValDataLoaderIter(batches, get_i, get_l)
    assert [v for v in va] == [(0, 0), (1, -1), (2, -2)]
    assert [v for v in iter(va)] == [(0, 0), (1, -1), (2, -2)]  # re-enterable


def test_yaml_duplicate_loader_and_stderr_suppress():
    import yaml

    from monai_tpu.data.video_dataset import SuppressStderr
    from monai_tpu.utils.misc import CheckKeyDuplicatesYamlLoader

    with pytest.warns(UserWarning, match="Duplicate key"):
        yaml.load("a: 1\na: 2\n", Loader=CheckKeyDuplicatesYamlLoader)
    os.environ["MONAI_FAIL_ON_DUPLICATE_CONFIG"] = "1"
    try:
        with pytest.raises(ValueError):
            yaml.load("a: 1\na: 2\n", Loader=CheckKeyDuplicatesYamlLoader)
    finally:
        del os.environ["MONAI_FAIL_ON_DUPLICATE_CONFIG"]

    import sys

    with SuppressStderr():
        print("silenced", file=sys.stderr)  # must not raise


def test_cast_to_float_all_and_trt_shim():
    from monai_tpu.networks.trt_compiler import ShapeError, TrtCompiler
    from monai_tpu.networks.utils import CastToFloatAll

    class TwoOut(nnx.Module):
        def __call__(self, x):
            assert x.dtype == jnp.float32
            return x * 2, x + 1

    wrapped = CastToFloatAll(TwoOut())
    a, b = wrapped(jnp.ones((2,), jnp.bfloat16))
    assert a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16

    assert issubclass(ShapeError, Exception)
    with pytest.raises(RuntimeError, match="StableHLO"):
        TrtCompiler()


def test_deprecated_types_warning_filter():
    import logging

    from monai_tpu import DeprecatedTypesWarningFilter

    f = DeprecatedTypesWarningFilter()
    rec_drop = logging.LogRecord("t", logging.WARNING, "", 0,
                                 "np.bool8 is deprecated", None, None)
    rec_keep = logging.LogRecord("t", logging.WARNING, "", 0, "other warning", None, None)
    assert not f.filter(rec_drop)
    assert f.filter(rec_keep)


def test_metrics_reloaded_wrapper_is_base():
    from monai_tpu.metrics import (
        MetricsReloadedBinary, MetricsReloadedWrapper,
    )

    assert issubclass(MetricsReloadedBinary, MetricsReloadedWrapper)
