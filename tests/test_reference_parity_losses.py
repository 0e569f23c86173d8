"""Live golden parity for losses & metrics vs the actual PyTorch reference.

Every case runs BOTH implementations on identical inputs in-process (the reference
imports from /root/reference on CPU torch) and asserts the scalar outputs agree —
much stronger than the recorded-constant goldens of round 1.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
    import monai.losses as RL
    import monai.metrics as RM
    HAS_REF = True
except Exception:
    HAS_REF = False
finally:
    if "/root/reference" in sys.path:
        sys.path.remove("/root/reference")

import jax.numpy as jnp

import monai_tpu.losses as L
import monai_tpu.metrics as M

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference MONAI not importable")


@pytest.fixture(scope="module")
def seg():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = rng.randint(0, 3, (2, 1, 16, 16)).astype(np.float32)
    onehot = np.eye(3, dtype=np.float32)[labels[:, 0].astype(int)].transpose(0, 3, 1, 2)
    return logits, labels, onehot


def _both(name, ours_fn, ref_fn, a, b, tol=1e-4, extra=()):
    ours = float(np.asarray(ours_fn(jnp.asarray(a), jnp.asarray(b),
                                    *[jnp.asarray(e) for e in extra])))
    ref = float(ref_fn(torch.from_numpy(a), torch.from_numpy(b),
                       *[torch.from_numpy(e) for e in extra]).item())
    assert abs(ours - ref) < tol, f"{name}: ours={ours} ref={ref}"


LOSS_CASES = [
    # (name, kwargs, input kind): 'logits+labels' or 'logits+onehot' or 'pred+pred'
    ("DiceLoss", dict(to_onehot_y=True, softmax=True), "labels"),
    ("DiceCELoss", dict(to_onehot_y=True, softmax=True), "labels"),
    ("DiceFocalLoss", dict(to_onehot_y=True, softmax=True), "labels"),
    ("GeneralizedDiceLoss", dict(to_onehot_y=True, softmax=True), "labels"),
    ("GeneralizedDiceFocalLoss", dict(to_onehot_y=True, softmax=True), "labels"),
    ("FocalLoss", dict(to_onehot_y=True, gamma=2.0), "labels"),
    ("TverskyLoss", dict(to_onehot_y=True, softmax=True, alpha=0.3, beta=0.7), "labels"),
    ("MaskedDiceLoss", dict(to_onehot_y=True, softmax=True), "labels"),
]


@pytest.mark.parametrize("name,kwargs,kind", LOSS_CASES, ids=[c[0] for c in LOSS_CASES])
def test_segmentation_losses(seg, name, kwargs, kind):
    logits, labels, onehot = seg
    ours = getattr(L, name)(**kwargs)
    ref = getattr(RL, name)(**kwargs)
    target = labels if kind == "labels" else onehot
    _both(name, ours, ref, logits, target)


class TestRegistrationLosses:
    def test_bending_energy(self):
        rng = np.random.RandomState(1)
        ddf = rng.randn(1, 3, 12, 12, 12).astype(np.float32)
        ours = float(np.asarray(L.BendingEnergyLoss()(jnp.asarray(ddf))))
        ref = float(RL.BendingEnergyLoss()(torch.from_numpy(ddf)).item())
        assert abs(ours - ref) < 1e-4

    def test_diffusion_loss(self):
        rng = np.random.RandomState(2)
        ddf = rng.randn(1, 3, 12, 12, 12).astype(np.float32)
        ours = float(np.asarray(L.DiffusionLoss()(jnp.asarray(ddf))))
        ref = float(RL.DiffusionLoss()(torch.from_numpy(ddf)).item())
        assert abs(ours - ref) < 1e-4

    def test_local_normalized_cross_correlation(self):
        rng = np.random.RandomState(3)
        a = rng.rand(1, 1, 16, 16, 16).astype(np.float32)
        b = rng.rand(1, 1, 16, 16, 16).astype(np.float32)
        ours = float(np.asarray(L.LocalNormalizedCrossCorrelationLoss(
            spatial_dims=3, kernel_size=3)(jnp.asarray(a), jnp.asarray(b))))
        ref = float(RL.LocalNormalizedCrossCorrelationLoss(
            spatial_dims=3, kernel_size=3)(torch.from_numpy(a), torch.from_numpy(b)).item())
        assert abs(ours - ref) < 1e-3

    def test_global_mutual_information(self):
        rng = np.random.RandomState(4)
        a = rng.rand(1, 1, 16, 16, 16).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(1, 1, 16, 16, 16).astype(np.float32), 0, 1)
        ours = float(np.asarray(L.GlobalMutualInformationLoss()(jnp.asarray(a), jnp.asarray(b))))
        ref = float(RL.GlobalMutualInformationLoss()(torch.from_numpy(a),
                                                     torch.from_numpy(b)).item())
        assert abs(ours - ref) < 1e-3


class TestContrastiveLosses:
    def test_contrastive(self):
        rng = np.random.RandomState(5)
        a = rng.randn(4, 16).astype(np.float32)
        b = rng.randn(4, 16).astype(np.float32)
        ours = float(np.asarray(L.ContrastiveLoss(temperature=0.5)(jnp.asarray(a), jnp.asarray(b))))
        ref = float(RL.ContrastiveLoss(temperature=0.5)(torch.from_numpy(a),
                                                        torch.from_numpy(b)).item())
        assert abs(ours - ref) < 1e-4

    def test_barlow_twins(self):
        rng = np.random.RandomState(6)
        a = rng.randn(8, 16).astype(np.float32)
        b = rng.randn(8, 16).astype(np.float32)
        ours = float(np.asarray(L.BarlowTwinsLoss(lambd=5e-3)(jnp.asarray(a), jnp.asarray(b))))
        ref = float(RL.BarlowTwinsLoss(lambd=5e-3)(torch.from_numpy(a),
                                                   torch.from_numpy(b)).item())
        assert abs(ours - ref) < 1e-2


class TestOtherLosses:
    def test_ssim_loss(self):
        rng = np.random.RandomState(7)
        a = rng.rand(2, 1, 24, 24).astype(np.float32)
        b = np.clip(a + 0.05 * rng.randn(2, 1, 24, 24).astype(np.float32), 0, 1)
        ours = float(np.asarray(L.SSIMLoss(spatial_dims=2)(jnp.asarray(a), jnp.asarray(b))))
        ref = float(RL.SSIMLoss(spatial_dims=2)(torch.from_numpy(a), torch.from_numpy(b)).item())
        assert abs(ours - ref) < 1e-3

    def test_deep_supervision(self, seg):
        logits, labels, _ = seg
        heads = [logits, logits[:, :, ::2, ::2].copy()]
        base_o = L.DiceCELoss(to_onehot_y=True, softmax=True)
        base_r = RL.DiceCELoss(to_onehot_y=True, softmax=True)
        ours = float(np.asarray(L.DeepSupervisionLoss(base_o)(
            [jnp.asarray(h) for h in heads], jnp.asarray(labels))))
        ref = float(RL.DeepSupervisionLoss(base_r)(
            [torch.from_numpy(h) for h in heads], torch.from_numpy(labels)).item())
        assert abs(ours - ref) < 1e-3

    def test_soft_cldice(self, seg):
        # reference signature is (y_true, y_pred) and it excludes channel 0, so a
        # meaningful comparison needs >= 2 channels
        logits, labels, onehot = seg
        probs = np.exp(logits[:, :2]) / np.exp(logits[:, :2]).sum(1, keepdims=True)
        y = onehot[:, :2]
        ours = float(np.asarray(L.SoftclDiceLoss(iter_=2)(jnp.asarray(y), jnp.asarray(probs))))
        ref = float(RL.SoftclDiceLoss(iter_=2)(torch.from_numpy(y),
                                               torch.from_numpy(probs)).item())
        assert 0.0 < ref < 1.0  # non-degenerate
        assert abs(ours - ref) < 1e-3

    def test_hausdorff_dt_loss(self, seg):
        logits, labels, _ = seg
        ours = float(np.asarray(L.HausdorffDTLoss(to_onehot_y=True, softmax=True)(
            jnp.asarray(logits), jnp.asarray(labels))))
        ref = float(RL.HausdorffDTLoss(to_onehot_y=True, softmax=True)(
            torch.from_numpy(logits), torch.from_numpy(labels)).item())
        assert abs(ours - ref) < 1e-3


class TestMetricsParity:
    def _pair(self, seed=0):
        rng = np.random.RandomState(seed)
        pred = (rng.rand(2, 3, 16, 16) > 0.5).astype(np.float32)
        gt = (rng.rand(2, 3, 16, 16) > 0.5).astype(np.float32)
        return pred, gt

    def test_dice_metric(self):
        pred, gt = self._pair()
        ours = np.asarray(M.compute_dice(jnp.asarray(pred), jnp.asarray(gt)))
        ref = RM.compute_dice(torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_iou(self):
        pred, gt = self._pair(1)
        ours = np.asarray(M.compute_iou(jnp.asarray(pred), jnp.asarray(gt)))
        ref = RM.compute_iou(torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_hausdorff(self):
        pred, gt = self._pair(2)
        ours = np.asarray(M.compute_hausdorff_distance(jnp.asarray(pred), jnp.asarray(gt)))
        ref = RM.compute_hausdorff_distance(torch.from_numpy(pred),
                                            torch.from_numpy(gt)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_average_surface_distance(self):
        pred, gt = self._pair(3)
        ours = np.asarray(M.compute_average_surface_distance(jnp.asarray(pred), jnp.asarray(gt)))
        ref = RM.compute_average_surface_distance(torch.from_numpy(pred),
                                                  torch.from_numpy(gt)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_surface_dice(self):
        pred, gt = self._pair(4)
        ours = np.asarray(M.compute_surface_dice(jnp.asarray(pred), jnp.asarray(gt),
                                                 class_thresholds=[1.0, 1.0]))
        ref = RM.compute_surface_dice(torch.from_numpy(pred), torch.from_numpy(gt),
                                      class_thresholds=[1.0, 1.0]).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_confusion_matrix(self):
        pred, gt = self._pair(5)
        ours = np.asarray(M.get_confusion_matrix(jnp.asarray(pred), jnp.asarray(gt)))
        ref = RM.get_confusion_matrix(torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_roc_auc(self):
        rng = np.random.RandomState(6)
        scores = rng.rand(32).astype(np.float32)
        y = (rng.rand(32) > 0.5).astype(np.float32)
        ours = float(M.compute_roc_auc(jnp.asarray(scores), jnp.asarray(y)))
        ref = float(RM.compute_roc_auc(torch.from_numpy(scores), torch.from_numpy(y)))
        assert abs(ours - ref) < 1e-6

    def test_mmd(self):
        rng = np.random.RandomState(7)
        a = rng.rand(8, 32).astype(np.float32)
        b = rng.rand(8, 32).astype(np.float32)
        ours = float(np.asarray(M.MMDMetric()(jnp.asarray(a), jnp.asarray(b))))
        ref = float(RM.MMDMetric()(torch.from_numpy(a), torch.from_numpy(b)).item())
        assert abs(ours - ref) < 1e-4

    def test_psnr(self):
        rng = np.random.RandomState(8)
        a = rng.rand(2, 1, 16, 16).astype(np.float32)
        b = rng.rand(2, 1, 16, 16).astype(np.float32)
        ours = np.mean(np.asarray(M.PSNRMetric(max_val=1.0)._compute_metric(
            jnp.asarray(a), jnp.asarray(b))))
        ref = RM.PSNRMetric(max_val=1.0)._compute_metric(
            torch.from_numpy(a), torch.from_numpy(b)).mean().item()
        assert abs(float(ours) - ref) < 1e-4
