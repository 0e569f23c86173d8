"""Loss & metric tests (golden values vs the reference recorded offline)."""
import jax.numpy as jnp
import numpy as np
import pytest

from monai_tpu.losses import (
    DiceCELoss,
    DiceFocalLoss,
    DiceLoss,
    FocalLoss,
    GeneralizedDiceLoss,
    TverskyLoss,
)
from monai_tpu.metrics import (
    ConfusionMatrixMetric,
    DiceMetric,
    HausdorffDistanceMetric,
    MeanIoU,
    compute_dice,
    compute_hausdorff_distance,
    compute_roc_auc,
)


@pytest.fixture()
def seg_data(rng):
    logits = jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 1, 8, 8)).astype(np.float32))
    return logits, labels


# golden values computed from the PyTorch reference implementation (same RandomState(0) inputs)
GOLDEN = {
    "DiceLoss": 0.640383,
    "DiceCELoss": 1.949164,
    "GeneralizedDice": 0.653095,
    "Tversky": 0.638571,
    "Focal": 0.316808,
    "DiceFocal": 0.957191,
}


def test_losses_match_reference_golden(seg_data):
    logits, labels = seg_data
    assert abs(float(DiceLoss(to_onehot_y=True, softmax=True)(logits, labels)) - GOLDEN["DiceLoss"]) < 1e-4
    assert abs(float(DiceCELoss(to_onehot_y=True, softmax=True)(logits, labels)) - GOLDEN["DiceCELoss"]) < 1e-4
    assert abs(float(GeneralizedDiceLoss(to_onehot_y=True, softmax=True)(logits, labels)) - GOLDEN["GeneralizedDice"]) < 1e-4
    assert abs(float(TverskyLoss(to_onehot_y=True, softmax=True, alpha=0.3, beta=0.7)(logits, labels)) - GOLDEN["Tversky"]) < 1e-4
    assert abs(float(FocalLoss(to_onehot_y=True, gamma=2.0)(logits, labels)) - GOLDEN["Focal"]) < 1e-4
    assert abs(float(DiceFocalLoss(to_onehot_y=True, softmax=True)(logits, labels)) - GOLDEN["DiceFocal"]) < 1e-4


def test_dice_loss_gradient(seg_data):
    import jax

    logits, labels = seg_data
    loss_fn = DiceLoss(to_onehot_y=True, softmax=True)
    g = jax.grad(lambda x: loss_fn(x, labels))(logits)
    assert g.shape == logits.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_dice_metric_perfect_prediction():
    y = np.zeros((2, 2, 8, 8), dtype=np.float32)
    y[:, 1, 2:6, 2:6] = 1
    y[:, 0] = 1 - y[:, 1]
    metric = DiceMetric(include_background=False)
    metric(y, y)
    assert float(metric.aggregate()) == pytest.approx(1.0)


def test_dice_metric_known_value():
    y_pred = np.zeros((1, 2, 4, 4), dtype=np.float32)
    y = np.zeros((1, 2, 4, 4), dtype=np.float32)
    y_pred[0, 1, :2] = 1  # 8 voxels
    y[0, 1, :, :2] = 1  # 8 voxels, overlap 4
    dice = compute_dice(y_pred[:, 1:], y[:, 1:])
    assert dice[0, 0] == pytest.approx(2 * 4 / (8 + 8))


def test_mean_iou():
    y_pred = np.zeros((1, 1, 4, 4), dtype=np.float32)
    y = np.zeros((1, 1, 4, 4), dtype=np.float32)
    y_pred[0, 0, :2] = 1
    y[0, 0, :, :2] = 1
    m = MeanIoU()
    m(y_pred, y)
    assert float(m.aggregate()) == pytest.approx(4 / 12)


def test_confusion_matrix_accuracy():
    y_pred = np.asarray([[[1, 0], [0, 1]]], dtype=np.float32)[:, None]
    y = np.asarray([[[1, 0], [1, 1]]], dtype=np.float32)[:, None]
    cm = ConfusionMatrixMetric(metric_name="accuracy")
    cm(y_pred, y)
    acc = cm.aggregate()[0]
    assert float(np.asarray(acc)) == pytest.approx(0.75)


def test_hausdorff_identical_is_zero():
    y = np.zeros((1, 2, 10, 10), dtype=np.float32)
    y[0, 1, 3:7, 3:7] = 1
    y[0, 0] = 1 - y[0, 1]
    hd = compute_hausdorff_distance(y, y)
    assert hd[0, 0] == pytest.approx(0.0)


def test_roc_auc_perfect():
    y_pred = np.asarray([0.1, 0.2, 0.8, 0.9])
    y = np.asarray([0, 0, 1, 1])
    assert compute_roc_auc(y_pred, y) == pytest.approx(1.0)


def test_roc_auc_half():
    y_pred = np.asarray([0.5] * 8)
    y = np.asarray([0, 1, 0, 1, 0, 1, 0, 1])
    assert compute_roc_auc(y_pred, y) == pytest.approx(0.5)


def test_dicece_binary_fast_path_matches_general(rng):
    """The C=2 lane-dense fast path (losses/dice.py DiceCELoss._binary_fast)
    must match the general softmax/one-hot path in value and gradient."""
    import jax

    logits = jnp.asarray(rng.randn(2, 2, 6, 7, 5).astype(np.float32) * 3)
    labels = jnp.asarray(rng.randint(0, 2, (2, 1, 6, 7, 5)).astype(np.float32))
    for batch in (False, True):
        loss = DiceCELoss(to_onehot_y=True, softmax=True, batch=batch)
        assert loss._binary_fast_applicable(logits, labels)

        def general(x):
            return loss.lambda_dice * loss.dice(x, labels) + loss.lambda_ce * loss.ce(x, labels)

        v_fast, g_fast = jax.value_and_grad(lambda x: loss(x, labels))(logits)
        v_gen, g_gen = jax.value_and_grad(general)(logits)
        assert abs(float(v_fast) - float(v_gen)) < 1e-5
        assert float(jnp.max(jnp.abs(g_fast - g_gen))) < 1e-5

    # gate must NOT fire for configs the fast path doesn't cover
    assert not DiceCELoss(to_onehot_y=True, softmax=True, include_background=False)._binary_fast_applicable(logits, labels)
    assert not DiceCELoss(to_onehot_y=True, softmax=True, squared_pred=True)._binary_fast_applicable(logits, labels)
    assert not DiceCELoss(sigmoid=True)._binary_fast_applicable(logits, labels)
    three = jnp.asarray(rng.randn(2, 3, 6, 7, 5).astype(np.float32))
    assert not DiceCELoss(to_onehot_y=True, softmax=True)._binary_fast_applicable(three, labels)


def test_dicece_channels_last_matches_channel_first(rng):
    """The TPU-native channels_last extension (losses/dice.py DiceCELoss) must
    match the channel-first path in value and gradient, on both the C=2 fast
    path and the general (transpose-fallback) path."""
    import jax

    logits = jnp.asarray(rng.randn(2, 2, 6, 7, 5).astype(np.float32) * 3)
    labels = jnp.asarray(rng.randint(0, 2, (2, 1, 6, 7, 5)).astype(np.float32))
    perm = (0, 2, 3, 4, 1)
    logits_cl, labels_cl = jnp.transpose(logits, perm), jnp.transpose(labels, perm)

    cf = DiceCELoss(to_onehot_y=True, softmax=True)
    cl = DiceCELoss(to_onehot_y=True, softmax=True, channels_last=True)
    assert cl._binary_fast_applicable(logits_cl, labels_cl)
    v_cf, g_cf = jax.value_and_grad(lambda x: cf(x, labels))(logits)
    v_cl, g_cl = jax.value_and_grad(lambda x: cl(x, labels_cl))(logits_cl)
    assert abs(float(v_cf) - float(v_cl)) < 1e-5
    assert float(jnp.max(jnp.abs(jnp.transpose(g_cl, (0, 4, 1, 2, 3)) - g_cf))) < 1e-5

    # general path (C=3: fast gate must not fire; transpose fallback must match)
    logits3 = jnp.asarray(rng.randn(2, 3, 6, 7, 5).astype(np.float32))
    logits3_cl = jnp.transpose(logits3, perm)
    cl3 = DiceCELoss(to_onehot_y=True, softmax=True, channels_last=True)
    assert not cl3._binary_fast_applicable(logits3_cl, labels_cl)
    v3_cf = cf(logits3, labels)
    v3_cl = cl3(logits3_cl, labels_cl)
    assert abs(float(v3_cf) - float(v3_cl)) < 1e-5
