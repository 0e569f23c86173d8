"""Golden parity vs the actual PyTorch reference (north star, BASELINE.md).

Runs the *reference MONAI* (from /root/reference, torch CPU) next to monai_tpu on
identical inputs and asserts outputs match: transform-level, network-forward with
copied weights, and the full Spleen-style sliding-window segmentation chain with
Dice within 1e-3 (ref pattern: tests/integration/test_integration_segmentation_3d.py
+ testing_data/integration_answers.py).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
    import monai as ref_monai  # noqa: F401
    from monai.data import MetaTensor as RefMetaTensor
    from monai.networks.nets import UNet as RefUNet
    from monai.inferers import sliding_window_inference as ref_swi
    import monai.transforms as RT
    HAS_REF = True
except Exception:  # pragma: no cover
    HAS_REF = False
finally:
    if "/root/reference" in sys.path:
        sys.path.remove("/root/reference")

import jax.numpy as jnp
from flax import nnx

import monai_tpu.transforms as T
from monai_tpu.data import MetaImage, create_test_image_3d
from monai_tpu.inferers import sliding_window_inference
from monai_tpu.metrics import compute_dice
from monai_tpu.networks.nets import UNet
from monai_tpu.networks.torch_compat import load_torch_unet_state

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference MONAI not importable")

AFFINE = np.diag([1.2, 1.2, 2.0, 1.0]).astype(np.float64)


@pytest.fixture(scope="module")
def vol():
    rs = np.random.RandomState(0)
    img, seg = create_test_image_3d(48, 48, 48, rad_max=12, random_state=rs)
    return img.astype(np.float32)[None], seg.astype(np.float32)[None]  # (1, H, W, D)


def _ref_mt(arr):
    return RefMetaTensor(torch.from_numpy(np.ascontiguousarray(arr)),
                         affine=torch.from_numpy(AFFINE))


def _our_mi(arr):
    return MetaImage(arr, affine=AFFINE)


class TestTransformParity:
    def test_spacing(self, vol):
        img, _ = vol
        want = RT.Spacing(pixdim=(1.0, 1.0, 1.0), mode="bilinear")(_ref_mt(img))
        got = T.Spacing(pixdim=(1.0, 1.0, 1.0), mode="bilinear")(_our_mi(img))
        assert tuple(got.shape) == tuple(want.shape)
        np.testing.assert_allclose(np.asarray(got.data), want.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.affine), want.affine.numpy(), atol=1e-5)

    def test_orientation(self, vol):
        # the reference Orientation requires nibabel (unavailable here); the
        # analytically-known result for an LAS volume reoriented to RAS is a flip
        # of the first spatial axis plus the corresponding affine correction
        img, _ = vol
        flipped_affine = AFFINE.copy()
        flipped_affine[0, 0] *= -1  # LAS input so RAS reorientation does work
        got = T.Orientation(axcodes="RAS")(MetaImage(img, affine=flipped_affine))
        want = img[:, ::-1]
        want_affine = flipped_affine.copy()
        want_affine[0, 0] *= -1
        want_affine[:3, 3] = flipped_affine[:3, :3] @ np.array([img.shape[1] - 1, 0, 0]) \
            + flipped_affine[:3, 3]
        np.testing.assert_allclose(np.asarray(got.data), want, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.affine), want_affine, atol=1e-5)

    def test_scale_intensity_range(self, vol):
        img, _ = vol
        args = dict(a_min=0.1, a_max=0.9, b_min=0.0, b_max=1.0, clip=True)
        want = RT.ScaleIntensityRange(**args)(torch.from_numpy(img)).numpy()
        got = np.asarray(T.ScaleIntensityRange(**args)(img))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_flip(self, vol):
        img, _ = vol
        want = RT.Flip(spatial_axis=(0, 2))(_ref_mt(img))
        got = T.Flip(spatial_axis=(0, 2))(_our_mi(img))
        np.testing.assert_allclose(np.asarray(got.data), want.numpy(), atol=1e-6)

    def test_resize(self, vol):
        img, _ = vol
        want = RT.Resize(spatial_size=(32, 32, 24), mode="trilinear", align_corners=False)(_ref_mt(img))
        got = T.Resize(spatial_size=(32, 32, 24), mode="trilinear", align_corners=False)(_our_mi(img))
        np.testing.assert_allclose(np.asarray(got.data), want.numpy(), atol=1e-3)

    def test_lazy_fused_chain_matches_reference_eager(self, vol):
        """Our lazy engine fuses Spacing+Flip into one resample; the result must
        still match the reference's eager per-transform execution."""
        img, _ = vol
        ref_out = RT.Flip(spatial_axis=(1,))(
            RT.Spacing(pixdim=(1.0, 1.0, 1.0), mode="bilinear")(_ref_mt(img)))
        chain = T.Compose([
            T.Spacing(pixdim=(1.0, 1.0, 1.0), mode="bilinear"),
            T.Flip(spatial_axis=(1,)),
        ], lazy=True)
        got = chain(_our_mi(img))
        np.testing.assert_allclose(np.asarray(got.data), ref_out.numpy(), atol=1e-3)


class TestNetworkParity:
    @pytest.mark.parametrize("num_res_units", [0, 2])
    def test_unet_forward_with_copied_weights(self, num_res_units):
        torch.manual_seed(0)
        ref = RefUNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
                      strides=(2, 2), num_res_units=num_res_units).eval()
        ours = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
                    strides=(2, 2), num_res_units=num_res_units, rngs=nnx.Rngs(0))
        load_torch_unet_state(ours, ref.state_dict())
        x = np.random.RandomState(0).rand(1, 1, 16, 16, 16).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = np.asarray(ours(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_unet_2d_forward_with_copied_weights(self):
        torch.manual_seed(1)
        ref = RefUNet(spatial_dims=2, in_channels=3, out_channels=4, channels=(4, 8),
                      strides=(2,), num_res_units=1).eval()
        ours = UNet(spatial_dims=2, in_channels=3, out_channels=4, channels=(4, 8),
                    strides=(2,), num_res_units=1, rngs=nnx.Rngs(0))
        load_torch_unet_state(ours, ref.state_dict())
        x = np.random.RandomState(1).rand(2, 3, 24, 24).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = np.asarray(ours(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestEndToEndDiceParity:
    """The BASELINE north star: Spleen-style preprocess -> UNet -> sliding-window
    eval -> Dice, within 1e-3 of the reference running the same weights."""

    def test_sliding_window_dice(self, vol):
        img, seg = vol
        torch.manual_seed(0)
        ref_net = RefUNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
                          strides=(2, 2), num_res_units=2).eval()
        our_net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
                       strides=(2, 2), num_res_units=2, rngs=nnx.Rngs(0))
        load_torch_unet_state(our_net, ref_net.state_dict())

        # preprocessing: Spacing -> ScaleIntensityRange on both sides
        ref_img = RT.ScaleIntensityRange(a_min=0.0, a_max=1.0, b_min=0.0, b_max=1.0, clip=True)(
            RT.Spacing(pixdim=(1.0, 1.0, 1.0), mode="bilinear")(_ref_mt(img)))
        our_img = T.ScaleIntensityRange(a_min=0.0, a_max=1.0, b_min=0.0, b_max=1.0, clip=True)(
            T.Spacing(pixdim=(1.0, 1.0, 1.0), mode="bilinear")(_our_mi(img)))
        np.testing.assert_allclose(np.asarray(our_img.data), ref_img.numpy(), atol=1e-3)

        # sliding-window inference (gaussian blending) on both sides
        roi, swb, ov = (32, 32, 32), 4, 0.25
        with torch.no_grad():
            ref_logits = ref_swi(ref_img.as_tensor()[None], roi, swb, ref_net,
                                 overlap=ov, mode="gaussian").numpy()

        graphdef, state = nnx.split(our_net)

        def predictor(w):
            import jax
            return jax.jit(lambda s, ww: nnx.merge(graphdef, s)(ww))(state, w)

        our_logits = np.asarray(sliding_window_inference(
            jnp.asarray(np.asarray(our_img.data))[None], roi, swb, our_net,
            overlap=ov, mode="gaussian"))
        # float accumulation-order differences leave a handful of voxels at ~3e-3
        np.testing.assert_allclose(our_logits, ref_logits, atol=5e-3)

        # final Dice vs the synthetic label, resampled the same way on both sides
        ref_seg = RT.Spacing(pixdim=(1.0, 1.0, 1.0), mode="nearest")(_ref_mt(seg))
        our_pred = (our_logits.argmax(axis=1, keepdims=True) > 0).astype(np.float32)
        ref_pred = (ref_logits.argmax(axis=1, keepdims=True) > 0).astype(np.float32)
        y = ref_seg.numpy()[None]
        our_dice = float(np.nanmean(np.asarray(compute_dice(our_pred, y))))
        ref_dice = float(np.nanmean(np.asarray(compute_dice(ref_pred, y))))
        assert abs(our_dice - ref_dice) < 1e-3, (our_dice, ref_dice)
