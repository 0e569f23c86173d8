"""Interactive-segmentation app coverage: vista3d sampler/transforms/point inferer,
nuclick transforms, deepedit guidance transforms + the Interaction inner loop
(reference: monai/apps/{vista3d,nuclick,deepedit,deepgrow}/)."""
import numpy as np
import pytest

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# vista3d
# ---------------------------------------------------------------------------

def _label_vol():
    lab = np.zeros((1, 1, 24, 24, 24), np.int64)
    lab[0, 0, 4:10, 4:10, 4:10] = 1
    lab[0, 0, 14:20, 14:20, 14:20] = 3
    return lab


def test_sample_prompt_pairs():
    from monai_tpu.apps.vista3d.sampler import sample_prompt_pairs

    lab = _label_vol()
    lp, pc, pl, cls = sample_prompt_pairs(lab, label_set=[0, 1, 2, 3], max_point=4,
                                          drop_label_prob=0.0, drop_point_prob=0.0,
                                          rand_state=np.random.RandomState(0))
    assert pc is not None and pl is not None
    pc = np.asarray(pc)
    assert pc.ndim == 3 and pc.shape[-1] == 3  # (prompts, points, xyz)
    # every sampled foreground point must land on its class
    for row_idx in range(pc.shape[0]):
        for pt_idx in range(pc.shape[1]):
            if np.asarray(pl)[row_idx, pt_idx] == 1:
                z, y, x = pc[row_idx, pt_idx].astype(int)
                assert lab[0, 0, z, y, x] != 0


def test_vista_pre_post_transforms():
    from monai_tpu.apps.vista3d.transforms import Relabeld, VistaPostTransformd, VistaPreTransformd

    pre = VistaPreTransformd(keys="image", labels_dict={1: "spleen", 2: "liver"},
                             subclass={"1": [1, 2]})
    d = pre({"image": np.zeros((1, 8, 8, 8), np.float32), "label_prompt": ["spleen"]})
    assert d["label_prompt"] is not None

    # post: logits -> labels placed back by prompt class
    logits = np.full((2, 8, 8, 8), -10.0, np.float32)
    logits[0, 2:5, 2:5, 2:5] = 10.0
    logits[1, 5:7, 5:7, 5:7] = 10.0
    data = {"pred": logits, "label_prompt": np.asarray([4, 9])}
    post = VistaPostTransformd(keys="pred")
    out = post(data)
    pred = np.asarray(out["pred"])
    assert set(np.unique(pred)).issubset({0.0, 4.0, 9.0})

    r = Relabeld(keys="label", label_mappings={"default": [[4, 1], [9, 2]]})
    rel = r({"label": pred.copy()})
    assert set(np.unique(np.asarray(rel["label"]))).issubset({0.0, 1.0, 2.0})


def test_point_based_window_inferer():
    from monai_tpu.apps.vista3d.inferer import point_based_window_inferer

    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 32, 32, 32), jnp.float32)

    def predictor(win, point_coords=None, point_labels=None, **kw):
        # emit ones over the window -> stitched output marks visited voxels
        return jnp.ones((1, 1) + win.shape[2:], jnp.float32)

    pts = np.asarray([[[8, 8, 8]]], np.float32)
    pls = np.asarray([[1]], np.int64)
    out = point_based_window_inferer(x, (16, 16, 16), predictor, pts, pls)
    out = np.asarray(out)
    assert out.shape == (1, 1, 32, 32, 32)
    assert out[0, 0, 8, 8, 8] > 0  # clicked region predicted
    assert out.max() <= 1.0 + 1e-5


# ---------------------------------------------------------------------------
# nuclick
# ---------------------------------------------------------------------------

def test_nuclick_flatten_split_extract():
    from monai_tpu.apps.nuclick.transforms import ExtractPatchd, FlattenLabeld, SplitLabeld

    lab = np.zeros((1, 32, 32), np.int64)
    lab[0, 4:10, 4:10] = 5
    lab[0, 20:26, 20:26] = 9
    d = FlattenLabeld(keys="label")({"label": lab.copy()})
    flat = np.asarray(d["label"])
    assert set(np.unique(flat)) == {0, 1, 2}

    d2 = SplitLabeld(keys="label", mask_value="mask_value", min_area=1)(
        {"label": flat.copy(), "mask_value": 1})
    assert "others" in d2
    assert set(np.unique(np.asarray(d2["label"]))).issubset({0, 1})

    d3 = ExtractPatchd(keys="img", patch_size=16)(
        {"img": np.random.RandomState(0).rand(3, 32, 32).astype(np.float32),
         "centroid": (7, 7)})
    assert np.asarray(d3["img"]).shape == (3, 16, 16)


def test_nuclick_click_signals():
    from monai_tpu.apps.nuclick.transforms import AddClickSignalsd

    img = np.random.RandomState(0).rand(3, 64, 64).astype(np.float32)
    d = AddClickSignalsd(image="image", foreground="foreground", bb_size=32)(
        {"image": img, "foreground": [[20, 20], [40, 44]]})
    out = np.asarray(d["image"])
    assert out.shape[0] == 2 and out.shape[1] == 5  # 2 patches, RGB + 2 guidance ch
    assert out.shape[2:] == (32, 32)


# ---------------------------------------------------------------------------
# deepedit
# ---------------------------------------------------------------------------

def test_deepedit_guidance_chain():
    from monai_tpu.apps.deepedit.transforms import (
        AddGuidanceSignalDeepEditd,
        AddInitialSeedPointDeepEditd,
        FindAllValidSlicesDeepEditd,
        NormalizeLabelsInDatasetd,
    )

    lab = np.zeros((1, 16, 16, 16), np.float32)
    lab[0, 4:10, 4:10, 6:12] = 2
    data = {"image": np.random.RandomState(0).rand(1, 16, 16, 16).astype(np.float32),
            "label": lab}
    data = NormalizeLabelsInDatasetd(keys="label",
                                     label_names={"organ": 2, "background": 0})(data)
    assert set(np.unique(np.asarray(data["label"]))) == {0.0, 1.0}
    data = FindAllValidSlicesDeepEditd(keys="label", sids="sids")(data)
    data = AddInitialSeedPointDeepEditd(keys="label", guidance="guidance",
                                        sids="sids")(data)
    assert "guidance" in data and "organ" in data["guidance"]
    data = AddGuidanceSignalDeepEditd(keys="image", guidance="guidance",
                                      number_intensity_ch=1)(data)
    img = np.asarray(data["image"])
    assert img.shape[0] == 1 + len(data["guidance"])  # intensity + per-label guidance


def test_deepgrow_interaction_loop():
    """The Interaction inner loop runs click-simulation iterations inside a trainer
    iteration (reference: deepgrow/interaction.py:26 / deepedit interaction)."""
    from flax import nnx
    import optax

    from monai_tpu.apps.deepgrow.interaction import Interaction
    from monai_tpu.engines import SupervisedTrainer
    from monai_tpu.losses import DiceCELoss
    from monai_tpu.networks.nets import UNet
    from monai_tpu.transforms import Compose, Activationsd, AsDiscreted

    net = UNet(spatial_dims=2, in_channels=3, out_channels=2, channels=(4, 8),
               strides=(2,), num_res_units=1, rngs=nnx.Rngs(0))

    def _data(n=2):
        rng = np.random.RandomState(0)
        out = []
        for _ in range(n):
            img = rng.rand(2, 3, 16, 16).astype(np.float32)
            lab = (rng.rand(2, 1, 16, 16) > 0.5).astype(np.float32)
            out.append({"image": img, "label": lab})
        return out

    transforms = Compose([Activationsd(keys="pred", softmax=True),
                          AsDiscreted(keys="pred", argmax=True)])
    interaction = Interaction(deepgrow_probability=1.0, transforms=transforms,
                              max_interactions=2, train=True)
    trainer = SupervisedTrainer(
        max_epochs=1, train_data_loader=_data(), network=net,
        optimizer=optax.adam(1e-3), loss_function=DiceCELoss(to_onehot_y=True, softmax=True),
        iteration_update=interaction, decollate=False)
    trainer.run()
    out = trainer.state.output
    loss = out[0]["loss"] if isinstance(out, list) else out["loss"]
    assert np.isfinite(float(np.asarray(loss)))
