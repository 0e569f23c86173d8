"""End-to-end integration: UNet training on synthetic 3D data + sliding-window eval.

Mirrors the reference's tests/integration/test_integration_segmentation_3d.py pattern:
synthetic phantoms → dict pipeline → train → SW eval → Dice threshold.
Kept small so it runs on CPU CI in minutes.
"""
import os
import tempfile

import numpy as np
import pytest

import monai_tpu.transforms as T
from monai_tpu.data import DataLoader, Dataset, create_test_image_3d, decollate_batch, write_nifti
from monai_tpu.losses import DiceCELoss
from monai_tpu.metrics import DiceMetric
from monai_tpu.networks.nets import UNet
from monai_tpu.inferers import sliding_window_inference
from monai_tpu.transforms import AsDiscrete


@pytest.mark.slow
def test_unet_training_improves_dice():
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    rs = np.random.RandomState(42)
    tmpdir = tempfile.mkdtemp()
    files = []
    for i in range(4):
        img, seg = create_test_image_3d(32, 32, 32, num_objs=4, rad_max=10, rad_min=4,
                                        num_seg_classes=1, random_state=rs)
        ip = os.path.join(tmpdir, f"img{i}.nii.gz")
        sp = os.path.join(tmpdir, f"seg{i}.nii.gz")
        write_nifti(img, ip)
        write_nifti(seg.astype(np.float32), sp)
        files.append({"image": ip, "label": sp})

    xform = T.Compose([
        T.LoadImaged(keys=["image", "label"]),
        T.EnsureChannelFirstd(keys=["image", "label"], channel_dim="no_channel"),
        T.ScaleIntensityd(keys="image"),
    ])
    xform.set_random_state(0)
    ds = Dataset(files, xform)
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0)

    net = UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
               strides=(2, 2), num_res_units=1, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(net, optax.adam(2e-3), wrt=nnx.Param)
    loss_fn = DiceCELoss(to_onehot_y=True, softmax=True)

    @nnx.jit
    def train_step(model, opt, x, y):
        def loss_of(m):
            return loss_fn(m(x), y)

        loss, grads = nnx.value_and_grad(loss_of)(model)
        opt.update(model, grads)
        return loss

    losses = []
    for _epoch in range(3):
        for batch in loader:
            x = jnp.asarray(batch["image"].data)
            y = jnp.asarray(batch["label"].data)
            losses.append(float(train_step(net, optimizer, x, y)))
    assert losses[-1] < losses[0], f"training did not reduce loss: {losses[0]} -> {losses[-1]}"
    # seeded golden values (the reference's integration_answers.py pattern,
    # tests/integration/test_integration_segmentation_3d.py): everything above is
    # deterministically seeded (phantoms rs=42, loader seed 0, params Rngs(0));
    # measured twice identical on CPU. The tolerance absorbs cross-version
    # accumulation-order drift, not behavior changes.
    np.testing.assert_allclose(losses[0], 1.48017, atol=2e-2,
                               err_msg="first-step loss left the golden window")
    np.testing.assert_allclose(losses[-1], 1.23009, atol=2e-2,
                               err_msg="final loss left the golden window")

    # sliding-window eval
    graphdef, state = nnx.split(net)

    @jax.jit
    def fwd(state, w):
        return nnx.merge(graphdef, state)(w)

    post = AsDiscrete(argmax=True, to_onehot=2)
    metric = DiceMetric(include_background=False)
    batch = next(iter(loader))
    x = jnp.asarray(batch["image"].data)
    pred = sliding_window_inference(x, roi_size=(16, 16, 16), sw_batch_size=4,
                                    predictor=lambda w: fwd(state, w), overlap=0.25)
    pred_list = [post(np.asarray(p)) for p in np.asarray(pred)]
    y_list = [post(np.asarray(l), argmax=False) for l in np.asarray(batch["label"].data)]
    metric(np.stack(pred_list), np.stack(y_list))
    dice = float(metric.aggregate())
    assert np.isfinite(dice)
    # golden Dice (see note above): 0.43998 measured, window +-0.05 for library
    # drift; the old `> 0.3` floor stays as the hard failure line
    assert dice > 0.3, f"dice too low after short training: {dice}"
    np.testing.assert_allclose(dice, 0.43998, atol=5e-2,
                               err_msg="eval Dice left the golden window")
