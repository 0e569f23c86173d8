"""Behavior tests for the round-4 function-level API surface additions
(VERDICT r3 #7 / Missing #3). Grouped by subsystem; each test exercises real
behavior, not just importability. Reference files cited per group."""
from __future__ import annotations

import json
import os

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# transforms (reference: monai/transforms/utils.py, spatial/functional.py)
# ---------------------------------------------------------------------------
class TestTransformsFunctions:
    def test_soft_clip_bounds_and_monotonicity(self):
        from monai_tpu.transforms import soft_clip

        x = np.linspace(-5, 5, 101, dtype=np.float32)
        y = np.asarray(soft_clip(x, sharpness_factor=3.0, minv=-1.0, maxv=1.0))
        assert y.min() > -1.6 and y.max() < 1.6
        assert np.all(np.diff(y) > 0)  # strictly increasing (soft, not hard, clip)
        one_sided = np.asarray(soft_clip(x, 3.0, minv=0.0, maxv=None))
        assert one_sided.min() > -0.1 and one_sided.max() > 4.5

    def test_get_unique_labels_onehot_and_discard(self):
        from monai_tpu.transforms import get_unique_labels

        lab = np.zeros((1, 4, 4))
        lab[0, 1, 1], lab[0, 2, 2] = 3, 5
        assert get_unique_labels(lab, is_onehot=False, discard=0) == {3, 5}
        oh = np.zeros((4, 2, 2))
        oh[1, 0, 0] = 1
        oh[3, 1, 1] = 1
        assert get_unique_labels(oh, is_onehot=True) == {1, 3}

    def test_paste_and_paste_slices(self):
        from monai_tpu.transforms import paste, paste_slices

        orig = np.zeros((2, 8))
        block = np.ones((4,))  # reference semantics: 1-D block pasted along the row axis
        out = paste(orig, block, (2,))
        assert out[0, 2:6].sum() == 4 and out[1, 2:6].sum() == 4
        o_sl, b_sl = paste_slices((-2, 4, np.zeros((8,))))
        assert o_sl == slice(0, 2) and b_sl == slice(2, None)

    def test_squarepulse_matches_scipy_semantics(self):
        from monai_tpu.transforms import squarepulse

        t = np.linspace(0, 4 * np.pi, 64)
        y = squarepulse(t, duty=0.5)
        assert set(np.unique(y)) <= {-1.0, 1.0}
        assert y[0] == 1.0 and y[20] == -1.0

    def test_allow_missing_keys_mode(self):
        from monai_tpu.transforms import allow_missing_keys_mode
        from monai_tpu.transforms.dictionary import SpatialPadd

        data = {"image": np.arange(16, dtype=float).reshape(1, 4, 4)}
        t = SpatialPadd(["image", "label"], spatial_size=10, allow_missing_keys=False)
        with pytest.raises(Exception):
            t(dict(data))
        with allow_missing_keys_mode(t):
            out = t(dict(data))
        assert out["image"].shape[-2:] == (10, 10)
        assert t.allow_missing_keys is False  # restored

    def test_has_status_keys_and_check_applied_operations(self):
        from monai_tpu.data.meta_image import MetaImage
        from monai_tpu.transforms import check_applied_operations, has_status_keys
        from monai_tpu.utils.enums import TraceKeys, TraceStatusKeys

        key = TraceStatusKeys.PENDING_DURING_APPLY
        img = MetaImage(np.zeros((1, 4, 4)))
        ok, msgs = has_status_keys(img, key)
        assert ok and msgs is None
        img.applied_operations.append({TraceKeys.STATUSES: {key: "left pending"}})
        ok, msgs = has_status_keys([img, {"x": img}], key)
        assert not ok and msgs == ["left pending", "left pending"]
        assert check_applied_operations({"no": "statuses"}, key, "dflt") == []

    def test_apply_affine_to_points(self):
        from monai_tpu.transforms import apply_affine_to_points

        pts = np.array([[[1.0, 2.0], [3.0, 4.0]]])  # (C=1, N=2, 2)
        aff = np.array([[2.0, 0, 1.0], [0, 2.0, -1.0], [0, 0, 1]])
        out = apply_affine_to_points(pts, aff)
        assert np.allclose(out, [[[3.0, 3.0], [7.0, 7.0]]])

    def test_convert_to_contiguous_recurses(self):
        from monai_tpu.transforms import convert_to_contiguous

        arr = np.arange(12).reshape(3, 4).T  # non-contiguous view
        out = convert_to_contiguous({"a": [arr, "s"], "b": 5})
        assert out["a"][0].flags["C_CONTIGUOUS"] and out["a"][1] == "s" and out["b"] == 5

    def test_morphological_t_functions(self):
        from monai_tpu.transforms import dilate_t, erode_t

        m = np.zeros((1, 1, 5, 5), np.float32)
        m[0, 0, 2, 2] = 1.0
        d = dilate_t(m, 3)
        assert d.sum() == 9  # 3x3 neighborhood
        e = erode_t(d, 3)
        assert e.sum() == 1 and e[0, 0, 2, 2] == 1.0

    def test_switch_endianness_roundtrip(self):
        from monai_tpu.transforms import switch_endianness

        a = np.arange(4, dtype=">f4")
        b = switch_endianness(a, "<")
        assert b.dtype.byteorder in ("<", "=") and np.allclose(a.astype(float), b.astype(float))
        nested = switch_endianness({"k": (a, [a])}, "<")
        assert np.allclose(nested["k"][1][0].astype(float), a.astype(float))

    def test_replace_element_tuple_and_dict(self):
        from monai_tpu.transforms import replace_element

        batch = [(1, 2), (3, 4)]
        replace_element(9, batch, 0, 1)
        assert batch[0] == (1, 9)
        batch2 = [{"x": 1}]
        replace_element(7, batch2, 0, "x")
        assert batch2[0]["x"] == 7

    def test_spatial_functional_forms_match_classes(self):
        from monai_tpu.data.meta_image import MetaImage
        from monai_tpu.transforms import Flip, Rotate90, flip, resize, rotate90, zoom

        img = MetaImage(np.arange(32, dtype=np.float32).reshape(2, 4, 4))
        assert np.allclose(np.asarray(flip(img, 0).data),
                           np.asarray(Flip(spatial_axis=0)(img).data))
        assert np.allclose(np.asarray(rotate90(img, (0, 1), 1).data),
                           np.asarray(Rotate90(1, (0, 1))(img).data))
        assert resize(img, (8, 8)).data.shape == (2, 8, 8)
        assert zoom(img, 2.0, keep_size=True).data.shape == (2, 4, 4)

    def test_box_points_roundtrip_2d_3d(self):
        from monai_tpu.transforms import convert_box_to_points, convert_points_to_box

        b2 = np.array([[0.0, 1.0, 4.0, 5.0], [2.0, 2.0, 3.0, 6.0]])
        p2 = convert_box_to_points(b2, "xyxy")
        assert p2.shape == (2, 4, 2) and np.allclose(convert_points_to_box(p2), b2)
        b3 = np.array([[0.0, 0.0, 0.0, 2.0, 3.0, 4.0]])
        p3 = convert_box_to_points(b3, None)
        assert p3.shape == (1, 8, 3) and np.allclose(convert_points_to_box(p3), b3)


# ---------------------------------------------------------------------------
# data (reference: monai/data/utils.py, box_utils.py, itk_torch_bridge.py,
# thread_buffer.py, image_writer.py)
# ---------------------------------------------------------------------------
class TestDataFunctions:
    def test_batched_nms_keeps_per_class(self):
        from monai_tpu.data import batched_nms

        boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [0, 0, 10, 10.0]])
        keep = batched_nms(boxes, np.array([0.9, 0.8, 0.7]), np.array([0, 0, 1]), 0.5)
        assert 0 in keep and 2 in keep and 1 not in keep

    def test_get_boxmode_and_corners(self):
        from monai_tpu.data import CenterSizeMode, get_boxmode

        bm = get_boxmode("ccwh")
        assert isinstance(bm, CenterSizeMode)
        corners = bm.boxes_to_corners(np.array([[2.0, 2.0, 2.0, 2.0]]))
        assert np.allclose(np.concatenate(corners, 1), [[1.0, 1.0, 3.0, 3.0]])
        assert isinstance(get_boxmode(CenterSizeMode), CenterSizeMode)
        assert isinstance(get_boxmode(bm), CenterSizeMode)

    def test_is_no_channel(self):
        from monai_tpu.data import is_no_channel

        assert is_no_channel("no_channel") and is_no_channel(None) and is_no_channel(float("nan"))
        assert not is_no_channel(0) and not is_no_channel("0")

    def test_collate_meta_tensor_fn_and_dev_collate(self):
        from monai_tpu.data import collate_meta_tensor_fn, dev_collate
        from monai_tpu.data.meta_image import MetaImage

        batch = [MetaImage(np.ones((1, 2, 2))), MetaImage(np.zeros((1, 2, 2)))]
        out = collate_meta_tensor_fn(batch)
        assert out.data.shape == (2, 1, 2, 2) and out.is_batch
        assert dev_collate([np.ones(2), np.zeros(2)]).shape == (2, 2)
        assert dev_collate([{"a": 1.0}, {"a": 2.0}])["a"] == [1.0, 2.0]
        assert dev_collate([np.ones(2), np.zeros(3)]) is None  # logged, not raised

    def test_buffer_iterator_repeats(self):
        from monai_tpu.data import buffer_iterator

        vals = list(buffer_iterator(iter([1, 2]), buffer_size=1, timeout=0.01, repeats=3))
        assert vals == [1, 1, 1, 2, 2, 2]

    def test_image_writer_init_registers(self):
        from monai_tpu.data.image_writer import init, resolve_writer

        init()
        assert len(resolve_writer("nii.gz")) >= 1 and len(resolve_writer("png")) >= 1

    def test_itk_affine_roundtrip_with_direction_and_center(self):
        from monai_tpu.data.itk_torch_bridge import (
            get_itk_image_center,
            itk_to_monai_affine,
            monai_to_itk_affine,
        )

        class Region:
            def GetSize(self):
                return (4, 5, 6)

            def GetIndex(self):
                return (0, 0, 0)

        class Img:
            ndim = 3
            shape = (6, 5, 4)

            def GetLargestPossibleRegion(self):
                return Region()

            def GetSpacing(self):
                return (1.0, 1.5, 2.0)

            def GetOrigin(self):
                return (10.0, -3.0, 0.0)

            def GetDirection(self):
                th = 0.3
                return np.array([[np.cos(th), -np.sin(th), 0],
                                 [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])

        img = Img()
        rng = np.random.RandomState(0)
        m = np.eye(3) + rng.rand(3, 3) * 0.1
        t = [1.0, -2.0, 0.5]
        center = get_itk_image_center(img)
        aff = itk_to_monai_affine(img, m, t, center_of_rotation=center)
        m2, t2 = monai_to_itk_affine(img, aff, center_of_rotation=center)
        assert np.allclose(m2, m, atol=1e-9) and np.allclose(t2, t, atol=1e-9)


# ---------------------------------------------------------------------------
# networks (reference: layers/factories.py, nets/*.py, networks/utils.py)
# ---------------------------------------------------------------------------
class TestNetworkFunctions:
    def test_factory_functions_build_working_modules(self):
        import jax.numpy as jnp

        from monai_tpu.networks.layers.factories import (
            adaptive_avgpooling_factory,
            geglu_factory,
            maxpooling_factory,
            mish_factory,
            swish_factory,
        )

        x = jnp.ones((1, 4, 4, 2))
        assert maxpooling_factory(2) is not None
        assert adaptive_avgpooling_factory(2) is not None
        for f in (swish_factory, mish_factory):
            mod = f()()
            y = mod(x)
            assert y.shape == x.shape

        geglu = geglu_factory()()
        assert geglu(jnp.ones((1, 8))).shape == (1, 4)

    def test_zero_module_and_block_factories(self):
        import jax.numpy as jnp
        from flax import nnx

        from monai_tpu.networks.nets.diffusion_model_unet import (
            get_down_block,
            get_mid_block,
            get_up_block,
            zero_module,
        )

        rngs = nnx.Rngs(0)
        conv = nnx.Conv(2, 2, kernel_size=(3,), rngs=rngs)
        zero_module(conv)
        assert float(jnp.abs(conv.kernel[...]).max()) == 0.0

        temb = jnp.zeros((1, 32))
        h = jnp.zeros((1, 8, 8, 8))
        down = get_down_block(2, 8, 16, 32, num_res_blocks=1, norm_num_groups=8, rngs=rngs)
        for blk in down:
            h = blk(h, temb) if not isinstance(blk, nnx.Conv) else blk(h)
        assert h.shape == (1, 4, 4, 16)
        mid = get_mid_block(2, 16, 32, norm_num_groups=8, rngs=rngs)
        m = mid[0](h, temb)
        m = mid[1](m)
        m = mid[2](m, temb)
        assert m.shape == h.shape

    def test_segresnet_vnet_resnet_helpers(self):
        from monai_tpu.networks.nets.resnet import (
            get_avgpool,
            get_inplanes,
            get_medicalnet_pretrained_resnet_args,
        )
        from monai_tpu.networks.nets.segresnet_ds import aniso_kernel, scales_for_resolution
        from monai_tpu.networks.nets.vnet import get_acti_layer

        assert scales_for_resolution([1, 1, 5], n_stages=5)[0] == (2, 2, 1)
        assert aniso_kernel((1, 2, 2)) == ([1, 3, 3], [0, 1, 1], (1, 2, 2))
        assert get_inplanes() == [64, 128, 256, 512]
        assert get_avgpool()[3] == (1, 1, 1)
        assert get_medicalnet_pretrained_resnet_args(50) == (False, "B")
        act = get_acti_layer("prelu", nchan=8)
        import jax.numpy as jnp

        assert act(jnp.full((1, 2, 8), -1.0)).shape == (1, 2, 8)

    def test_filter_swinunetr_key_mapping(self):
        from monai_tpu.networks.nets.swin_unetr import filter_swinunetr

        assert filter_swinunetr("encoder.mask_token", 0) is None
        k, _ = filter_swinunetr("encoder.patch_embed.proj.weight", 0)
        assert k == "swinViT.patch_embed.proj.weight"
        k, _ = filter_swinunetr("encoder.layers1.0.blocks.0.norm1.weight", 0)
        assert k.startswith("swinViT.layers1")
        assert filter_swinunetr("decoder.x", 0) is None

    def test_networks_utils_helpers(self):
        from monai_tpu.networks.utils import (
            get_profile_shapes,
            has_nvfuser_instance_norm,
            simple_replace,
            wrap_module,
        )

        mn, opt, mx = get_profile_shapes((4, 1, 16, 16), (1, 2, 8))
        assert mn[0] == 1 and opt[0] == 2 and mx[0] == 8
        assert has_nvfuser_instance_norm() is False

        class A:
            __constants__ = ("n",)
            n = 3

        class B:
            def __init__(self, n):
                self.n = n

        swapped = simple_replace(A, B)(A())
        assert isinstance(swapped, B) and swapped.n == 3
        assert simple_replace(A, B)(B(1)) is None
        wrapped = wrap_module(A, lambda mod: ("wrapped", mod))(A())
        assert wrapped[0] == "wrapped"

    def test_ahnet_param_copy(self):
        import jax.numpy as jnp
        from flax import nnx

        from monai_tpu.networks.nets.ahnet import copy_bn_param, copy_conv_param

        c2 = nnx.Conv(2, 4, kernel_size=(3, 3), rngs=nnx.Rngs(0))
        c3 = nnx.Conv(2, 4, kernel_size=(3, 3, 1), rngs=nnx.Rngs(1))
        copy_conv_param(c2, c3)
        assert jnp.allclose(c3.kernel[...][:, :, 0], c2.kernel[...])
        n2 = nnx.BatchNorm(4, rngs=nnx.Rngs(0))
        n3 = nnx.BatchNorm(4, rngs=nnx.Rngs(1))
        copy_bn_param(n2, n3)
        assert jnp.allclose(n3.scale[...], n2.scale[...])


# ---------------------------------------------------------------------------
# losses & metrics (reference: cldice.py, deform.py, sure_loss.py,
# f_beta_score.py, fid.py, regression.py)
# ---------------------------------------------------------------------------
class TestLossMetricFunctions:
    def test_soft_morphology_and_soft_dice(self):
        import jax.numpy as jnp

        from monai_tpu.losses import soft_dice, soft_dilate, soft_erode, soft_open

        img = jnp.zeros((1, 1, 7, 7)).at[0, 0, 2:5, 2:5].set(1.0)
        er = soft_erode(img)
        assert float(er.sum()) == 1.0
        di = soft_dilate(img)
        assert float(di.sum()) == 25.0
        op = soft_open(img)
        assert op.shape == img.shape
        y = jnp.stack([1 - img[:, 0], img[:, 0]], axis=1)
        assert float(soft_dice(y, y)) < 1e-3

    def test_spatial_gradient_central_difference(self):
        import jax.numpy as jnp

        from monai_tpu.losses import spatial_gradient

        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8) ** 2
        g = spatial_gradient(x, dim=2)
        # d(x^2)/dx = 2x exactly under central differences
        assert np.allclose(np.asarray(g[0, 0]), 2 * np.arange(1, 7))

    def test_sure_loss_function_runs(self):
        import jax.numpy as jnp

        from monai_tpu.losses import complex_diff_abs_loss, sure_loss_function

        x = jnp.ones((2, 1, 4, 4))
        y = x * 2

        def op(v):
            return v * 2

        loss = sure_loss_function(op, x, y)
        assert np.isfinite(float(loss))
        z = jnp.ones((2, 2, 4, 4))
        assert float(complex_diff_abs_loss(z, z)) < 1e-6

    def test_f_beta_functions(self):
        from monai_tpu.metrics import compute_f_beta_score, get_f_beta_score

        y_pred = np.array([[[1, 0, 1, 1]]])
        y = np.array([[[1, 0, 0, 1]]])
        cm = get_f_beta_score(y_pred, y)
        assert cm.shape == (1, 1, 4)
        tp, fp, tn, fn = cm[0, 0]
        assert (tp, fp, tn, fn) == (2, 1, 1, 0)
        f1 = compute_f_beta_score(cm, 1.0)
        assert np.isclose(f1[0, 0], 2 * 2 / (2 * 2 + 0 + 1))
        assert np.isnan(compute_f_beta_score(np.zeros((1, 4)), 1.0))[0]

    def test_fid_and_mean_error(self):
        from monai_tpu.metrics import compute_mean_error_metrics, get_fid_score

        rng = np.random.RandomState(0)
        feats = rng.randn(64, 8)
        assert abs(get_fid_score(feats, feats.copy())) < 1e-6
        shifted = feats + 5.0
        assert get_fid_score(shifted, feats) > 10.0
        me = compute_mean_error_metrics(np.zeros((2, 3)), np.ones((2, 3)), func=np.abs)
        assert me.shape == (2, 1) and np.allclose(me, 1.0)


# ---------------------------------------------------------------------------
# apps (reference: detection utils, pathology handlers, reconstruction nets
# utils, auto3dseg utils)
# ---------------------------------------------------------------------------
class TestAppsFunctions:
    def test_detector_utils_pad_and_validate(self):
        from monai_tpu.apps.detection.utils.detector_utils import (
            check_input_images,
            check_training_targets,
            pad_images,
            preprocess_images,
        )

        imgs = [np.ones((1, 10, 13)), np.ones((1, 12, 9))]
        batch, sizes = pad_images(imgs, 2, size_divisible=8)
        assert batch.shape == (2, 1, 16, 16) and sizes == [[10, 13], [12, 9]]
        batch2, _ = preprocess_images(np.ones((2, 1, 10, 13)), 2, 4)
        assert batch2.shape == (2, 1, 12, 16)
        with pytest.raises(ValueError):
            check_input_images(np.ones((2, 1, 10, 13)), 3)
        targets = [{"labels": np.array([1]), "boxes": np.zeros((0,))}]
        fixed = check_training_targets([imgs[0]], targets, 2, "labels", "boxes")
        assert fixed[0]["boxes"].shape == (0, 4)

    def test_predict_with_inferer_dict_network(self):
        import jax.numpy as jnp

        from monai_tpu.apps.detection.utils.predict_utils import (
            check_dict_values_same_length,
            ensure_dict_value_to_list_,
            predict_with_inferer,
        )
        from monai_tpu.inferers import SlidingWindowInferer

        d = {"a": np.ones(3)}
        ensure_dict_value_to_list_(d)
        assert isinstance(d["a"], list)
        with pytest.raises(ValueError):
            check_dict_values_same_length({"a": [1], "b": [1, 2]})

        def net(x, keys=None):
            return {"cls": x * 2, "box_reg": [x + 1]}

        def seq_net(x, keys=None):
            from monai_tpu.apps.detection.utils.predict_utils import _network_sequence_output

            return _network_sequence_output(x, lambda v: {"cls": v * 2, "box_reg": [v + 1]}, keys)

        inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=2, overlap=0.25)
        x = jnp.asarray(np.random.rand(1, 1, 16, 16).astype(np.float32))
        out = predict_with_inferer(x, lambda v: {"cls": v * 2, "box_reg": [v + 1]},
                                   keys=["cls", "box_reg"], inferer=inferer)
        assert set(out) == {"cls", "box_reg"}
        assert np.allclose(np.asarray(out["cls"][0]), np.asarray(x) * 2, atol=1e-5)
        assert np.allclose(np.asarray(out["box_reg"][0]), np.asarray(x) + 1, atol=1e-5)

    def test_encode_boxes_roundtrip_with_box_coder(self):
        from monai_tpu.apps.detection.utils.box_coder import BoxCoder, encode_boxes

        rng = np.random.RandomState(1)
        proposals = np.array([[0, 0, 10, 10], [5, 5, 20, 30.0]])
        gt = proposals + rng.rand(2, 4) * 2
        w = np.ones(4)
        codes = encode_boxes(gt, proposals, w)
        back = BoxCoder(weights=tuple(w)).decode_single(codes, proposals)
        assert np.allclose(back, gt, atol=1e-4)

    def test_retinanet_resnet50_fpn_detector_forward(self):
        import jax.numpy as jnp
        from flax import nnx

        from monai_tpu.apps.detection.networks import retinanet_resnet50_fpn_detector
        from monai_tpu.apps.detection.utils.anchor_utils import AnchorGeneratorWithAnchorShape

        anchor_gen = AnchorGeneratorWithAnchorShape(
            feature_map_scales=(1, 2, 4, 8), base_anchor_shapes=((4, 4),))
        det = retinanet_resnet50_fpn_detector(
            num_classes=2, anchor_generator=anchor_gen, returned_layers=[1, 2, 3],
            spatial_dims=2, n_input_channels=1, rngs=nnx.Rngs(0))
        cls_logits, box_regs = det.network(jnp.zeros((1, 1, 64, 64), jnp.float32))
        assert len(cls_logits) == 4  # 3 returned layers + LastLevelMaxPool
        assert cls_logits[0].shape[1] == det.network.num_anchors * 2
        assert box_regs[0].shape[1] == det.network.num_anchors * 4

    def test_from_engine_hovernet(self):
        from monai_tpu.apps.pathology import from_engine_hovernet

        f = from_engine_hovernet(["A", "B"], "C")
        assert f({"A": {"C": 1}, "B": {"C": 2}}) == (1, 2)
        out = f([{"A": {"C": 1}, "B": {"C": 2}}, {"A": {"C": 3}, "B": {"C": 4}}])
        assert out == ([1, 3], [2, 4])

    def test_reconstruction_reshapes_roundtrip(self):
        import jax.numpy as jnp

        from monai_tpu.apps.reconstruction.networks.nets.utils import (
            complex_normalize,
            divisible_pad_t,
            floor_ceil,
            inverse_divisible_pad_t,
            reshape_batch_channel_to_channel_dim,
            reshape_channel_complex_to_last_dim,
            reshape_channel_to_batch_dim,
            reshape_complex_to_channel_dim,
        )

        x = jnp.asarray(np.random.rand(3, 2, 6, 7, 2).astype(np.float32))
        chan = reshape_complex_to_channel_dim(x)
        assert chan.shape == (3, 4, 6, 7)
        back = reshape_channel_complex_to_last_dim(chan)
        assert np.allclose(np.asarray(back), np.asarray(x))
        merged, b = reshape_channel_to_batch_dim(x)
        assert merged.shape == (6, 1, 6, 7, 2) and b == 3
        assert np.allclose(np.asarray(reshape_batch_channel_to_channel_dim(merged, b)),
                           np.asarray(x))
        normed, mean, std = complex_normalize(chan)
        assert abs(float(normed.mean())) < 1e-5
        assert floor_ceil(2.5) == (2, 3)
        padded, sizes = divisible_pad_t(jnp.ones((3, 2, 50, 70)), k=16)
        assert padded.shape == (3, 2, 64, 80)
        assert inverse_divisible_pad_t(padded, sizes).shape == (3, 2, 50, 70)

    def test_sensitivity_map_reduce_expand_adjointish(self):
        import jax.numpy as jnp

        from monai_tpu.apps.reconstruction.networks.nets.utils import (
            sensitivity_map_expand,
            sensitivity_map_reduce,
        )

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(1, 1, 8, 8, 2).astype(np.float32))
        # unit sensitivity: reduce(expand(img)) == img
        sens = jnp.zeros((1, 1, 8, 8, 2)).at[..., 0].set(1.0)
        k = sensitivity_map_expand(img, sens)
        back = sensitivity_map_reduce(k, sens)
        assert np.allclose(np.asarray(back), np.asarray(img), atol=1e-4)

    def test_auto3dseg_utils(self, tmp_path):
        from monai_tpu.auto3dseg.utils import (
            check_and_set_optional_args,
            concat_multikeys_to_dict,
            concat_val_to_np,
            datafold_read,
            get_foreground_image,
            get_foreground_label,
            get_label_ccp,
            list_to_python_fire_arg_str,
            verify_report_format,
        )

        img = np.zeros((1, 6, 6))
        img[0, 2:4, 2:4] = 5.0
        fg = get_foreground_image(img)
        assert np.asarray(fg.data if hasattr(fg, "data") else fg).shape[-2:] == (2, 2)
        lab = (img > 0).astype(np.float32)
        assert np.all(get_foreground_label(img, lab) == 5.0)
        mask = np.zeros((5, 5))
        mask[0, 0] = 1
        mask[3:5, 3:5] = 1
        shapes, n = get_label_ccp(mask)
        assert n == 2 and [2, 2] in shapes

        data_list = [{"s": {"v": [1, 2]}}, {"s": {"v": [3, 4]}}]
        arr = concat_val_to_np(data_list, ["s", "v"])
        assert arr.shape == (2, 2)
        d = concat_multikeys_to_dict([{"s": [{"a": 1}]}, {"s": [{"a": 2}]}], ["s"], ["a"])
        assert d["a"].tolist() == [1, 2]  # reference np.concatenate([np_list]) flattening

        dl = {"training": [{"image": "i0.nii", "fold": 0}, {"image": "i1.nii", "fold": 1}]}
        tr, val = datafold_read(dl, "/base", fold=0)
        assert len(tr) == 1 and val[0]["image"] == "/base/i0.nii"

        assert verify_report_format({"a": 1, "b": [{"c": 2}]}, {"a": None, "b": [{"c": None}]})
        assert not verify_report_format({"b": 1}, {"a": None})
        assert list_to_python_fire_arg_str([1, 2]) == "'1,2'"
        assert check_and_set_optional_args({"x": 1, "y": [2, 3]}) == " --x=1 --y='2,3'"

    def test_algo_pickle_roundtrip(self, tmp_path):
        from monai_tpu.auto3dseg.utils import algo_from_pickle, algo_to_pickle

        algo = _TinyAlgo(tmp_path)
        pkl = algo_to_pickle(algo, template_path=None, best_metric=0.9)
        algo2, meta = algo_from_pickle(pkl)
        assert algo2.out == algo.out and meta["best_metric"] == 0.9


class _TinyAlgo:
    """Module-level so pickle can resolve it (algo_to_pickle round-trip test)."""

    def __init__(self, out):
        self.out = str(out)

    def get_output_path(self):
        return self.out


# ---------------------------------------------------------------------------
# bundle / fl / inferers / utils / config (reference: bundle/utils.py,
# bundle/scripts.py, fl/client/monai_algo.py, inferers/merger.py, utils/*)
# ---------------------------------------------------------------------------
class TestInfraFunctions:
    def test_merge_kv(self):
        from monai_tpu.bundle.utils import merge_kv

        args = {"a": {"x": 1}, "b": [1]}
        merge_kv(args, "+a", {"y": 2})
        merge_kv(args, "+b", [2])
        merge_kv(args, "c", 3)
        assert args["a"] == {"x": 1, "y": 2} and args["b"] == [1, 2] and args["c"] == 3
        with pytest.raises(ValueError):
            merge_kv(args, "+a", [1])

    def test_load_bundle_config_dir(self, tmp_path):
        from monai_tpu.bundle.utils import load_bundle_config

        cfg_dir = tmp_path / "bundle" / "configs"
        cfg_dir.mkdir(parents=True)
        (cfg_dir / "metadata.json").write_text(json.dumps({"name": "tiny", "version": "0.0.1"}))
        (cfg_dir / "inference.json").write_text(json.dumps({"roi": [64, 64]}))
        parser = load_bundle_config(str(tmp_path / "bundle"), "inference.json")
        assert parser["roi"] == [64, 64]
        with pytest.raises(ValueError):
            load_bundle_config(str(tmp_path / "bundle"), "nope.json")

    def test_create_workflow_initializes(self, tmp_path):
        from monai_tpu.bundle.scripts import create_workflow

        cfg = {"trainer": {"_target_": "dict", "_disabled_": True},
               "run": "$print('hi')"}
        p = tmp_path / "c.json"
        p.write_text(json.dumps(cfg))
        wf = create_workflow(config_file=str(p), workflow_type="train", run_id="run")
        assert wf is not None

    def test_convert_global_weights_and_disable_ckpt_loaders(self):
        from monai_tpu.bundle.config_parser import ConfigParser
        from monai_tpu.fl.client import convert_global_weights, disable_ckpt_loaders

        local = {"w": np.zeros((2, 2))}
        out, n = convert_global_weights({"w": [1, 2, 3, 4], "other": 0}, local)
        assert n == 1 and out["w"].shape == (2, 2) and out["w"][1, 1] == 4
        parser = ConfigParser({"validate": {"handlers": [
            {"_target_": "monai_tpu.handlers.CheckpointLoader", "load_path": "x"},
            {"_target_": "monai_tpu.handlers.StatsHandler"}]}})
        disable_ckpt_loaders(parser)
        assert parser["validate"]["handlers"][0]["_disabled_"] is True
        assert "_disabled_" not in parser["validate"]["handlers"][1]

    def test_iterate_over_chunks(self):
        from monai_tpu.inferers.merger import iterate_over_chunks

        slices = list(iterate_over_chunks((2, 3), (2, 2)))
        assert len(slices) == 4 and slices[0] == (slice(0, 2), slice(0, 3))
        with pytest.raises(ValueError):
            list(iterate_over_chunks((2,), (2, 2)))

    def test_version_helpers(self):
        from monai_tpu.utils.module import (
            compute_capabilities_after,
            get_torch_version_tuple,
            parse_version_strs,
            pytorch_after,
        )

        assert pytorch_after(0, 1) is True
        assert pytorch_after(1, 12, 0, "1.12.0") is True
        assert pytorch_after(1, 12, 0, "1.11.0a0+1234") is False
        assert pytorch_after(2, 0, 1, "2.0.0") is False
        lhs, rhs = parse_version_strs("1.12rc1+cu113", "1.9")
        assert list(lhs)[:2] == [1, 12]
        assert len(get_torch_version_tuple()) == 2
        assert compute_capabilities_after(8, 0) is True  # no CUDA -> reference default
        assert compute_capabilities_after(8, 0, "7.5") is False

    def test_check_key_duplicates(self):
        from monai_tpu.utils.misc import check_key_duplicates

        with pytest.warns(UserWarning):
            d = check_key_duplicates([("a", 1), ("a", 2)])
        assert d == {"a": 2}
        assert json.loads('{"a": 1, "b": 2}', object_pairs_hook=check_key_duplicates) == {"a": 1, "b": 2}
        os.environ["MONAI_FAIL_ON_DUPLICATE_CONFIG"] = "1"
        try:
            with pytest.raises(ValueError):
                check_key_duplicates([("a", 1), ("a", 2)])
        finally:
            os.environ.pop("MONAI_FAIL_ON_DUPLICATE_CONFIG")

    def test_misc_small_functions(self):
        from monai_tpu.utils.component_store import is_variable
        from monai_tpu.utils.deprecate_utils import warn_deprecated
        from monai_tpu.utils.jupyter_utils import tensor_to_images
        from monai_tpu.utils.type_conversion import (
            dtype_numpy_to_torch,
            dtype_torch_to_numpy,
            get_dtype_bound_value,
            get_dtype_string,
            get_numpy_dtype_from_string,
            get_torch_dtype_from_string,
            safe_dtype_range,
        )

        assert is_variable("abc") and not is_variable("for") and not is_variable("a-b")
        with pytest.warns(FutureWarning):
            warn_deprecated("obj", "msg")
        assert tensor_to_images("x", np.zeros((2, 8, 8))).shape == (2, 8, 8)
        assert tensor_to_images("x", np.zeros((2, 6, 8, 8))).shape == (2, 8, 8)
        assert tensor_to_images("x", np.zeros((2,))) is None

        import torch

        assert dtype_numpy_to_torch(np.float32) == torch.float32
        assert dtype_torch_to_numpy(torch.float64) == np.float64
        assert get_numpy_dtype_from_string("torch.float32") == np.float32
        assert get_torch_dtype_from_string("float16") == torch.float16
        assert get_dtype_string(torch.float32) == "float32"
        assert get_dtype_bound_value(np.uint8) == (0, 255)
        clipped = safe_dtype_range(np.array([300.0, -5.0]), np.uint8)
        assert clipped.tolist() == [255.0, 0.0]

    def test_profiling_decorators_run(self, capsys):
        from monai_tpu.utils.profiling import (
            torch_profiler_full,
            torch_profiler_time_cpu_gpu,
            torch_profiler_time_end_to_end,
        )

        for deco in (torch_profiler_full, torch_profiler_time_cpu_gpu,
                     torch_profiler_time_end_to_end):
            @deco
            def f(a, b):
                return a + b

            assert f(1, 2) == 3
        out = capsys.readouterr().out
        assert "time" in out

    def test_gpu_info_and_lr_extractors(self):
        from monai_tpu.config.deviceconfig import get_gpu_info, print_gpu_info
        from monai_tpu.optimizers.lr_finder import default_image_extractor, default_label_extractor

        info = get_gpu_info()
        assert "Num devices" in info
        import io

        buf = io.StringIO()
        print_gpu_info(buf)
        assert "Num devices" in buf.getvalue()
        assert default_image_extractor({"image": 1, "label": 2}) == 1
        assert default_label_extractor((1, 2)) == 2

    def test_default_upsampler_and_custom_warning_handler(self):
        import monai_tpu
        from monai_tpu.visualize import default_upsampler

        up = default_upsampler((8, 8))
        out = up(np.ones((1, 2, 4, 4)))
        assert out.shape == (1, 2, 8, 8)
        # handler drops listed module warnings, passes others through
        import warnings as w

        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            monai_tpu.custom_warning_handler("m", UserWarning, "ignite/handlers/checkpoint.py", 1)
        assert rec == []

    def test_strenum_representer_yaml(self):
        import yaml

        from monai_tpu.apps.auto3dseg import strenum_representer
        from monai_tpu.utils.enums import MetricReduction

        dumped = yaml.safe_dump({"r": MetricReduction.MEAN})
        assert "mean" in dumped
        node = strenum_representer(yaml.SafeDumper(None), MetricReduction.MEAN)
        assert node is not None

    def test_get_filename_from_url(self):
        from monai_tpu.apps.utils import get_filename_from_url

        assert get_filename_from_url("https://x.org/a/b/model%20v1.zip") == "model v1.zip"
