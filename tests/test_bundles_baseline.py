"""Smoke-run the five BASELINE bundle configs end-to-end at tiny sizes
(reference pattern: tests/integration/test_integration_bundle_run.py; bundle layout
from the MONAI model zoo). Each runs the full pipeline on synthetic phantom data:
dataset build, augmentation, compiled train step, validation (sliding-window where
configured), metrics, checkpointing."""
import glob
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLES = os.path.join(REPO, "bundles")


def _run(config, tmp_path, workflow_type="train", **overrides):
    from monai_tpu.bundle.workflows import ConfigWorkflow

    wf = ConfigWorkflow(config_file=config, workflow_type=workflow_type,
                        bundle_root=str(tmp_path), **overrides)
    wf.initialize()
    wf.run()
    wf.finalize()
    return wf


@pytest.mark.slow
def test_spleen_bundle_train_and_inference(tmp_path):
    cfg = os.path.join(BUNDLES, "spleen_ct_segmentation", "configs")
    wf = _run(os.path.join(cfg, "train.json"), tmp_path, num_synth_images=4, epochs=1,
              roi_size=[32, 32, 32])
    assert os.path.exists(os.path.join(tmp_path, "models", "model_final.ckpt"))
    metrics = wf.parser.get_parsed_content("evaluator").state.metrics
    # seeded golden window (the reference's integration_answers.py pattern): the
    # bundle's set_determinism(seed=123) governs synth data, shuffle order (via
    # the r5 DataLoader ambient-seed fix), and init; measured twice identical on
    # CPU. Tolerance absorbs accumulation-order drift only.
    np.testing.assert_allclose(metrics["val_mean_dice"], 0.0963085, atol=5e-3,
                               err_msg="val_mean_dice left the golden window")
    # inference: load checkpoint, sliding-window predict, invert, save
    _run(os.path.join(cfg, "inference.json"), tmp_path, workflow_type="infer",
         roi_size=[32, 32, 32])
    outs = glob.glob(str(tmp_path / "eval" / "**" / "*seg*"), recursive=True)
    assert len(outs) >= 1


@pytest.mark.slow
def test_mednist_bundle_train(tmp_path):
    cfg = os.path.join(BUNDLES, "mednist_classification", "configs", "train.json")
    wf = _run(cfg, tmp_path, num_synth_images=24, num_classes=4, epochs=1)
    metrics = wf.parser.get_parsed_content("evaluator").state.metrics
    # seeded golden window (the reference's integration_answers.py pattern): the
    # bundle's set_determinism(seed=0) governs synth data, shuffle order (via the
    # r5 DataLoader ambient-seed fix), augmentations, and init; measured twice
    # identical on CPU. Tolerance absorbs accumulation-order drift only.
    np.testing.assert_allclose(metrics["val_rocauc"], 0.375, atol=2e-2,
                               err_msg="val_rocauc left the golden window")


@pytest.mark.slow
def test_brats_bundle_train(tmp_path):
    cfg = os.path.join(BUNDLES, "brats_segresnet", "configs", "train.json")
    wf = _run(cfg, tmp_path, num_synth_images=4, epochs=1, roi_size=[32, 32, 32])
    metrics = wf.parser.get_parsed_content("evaluator").state.metrics
    assert np.isfinite(metrics["val_mean_dice"])


@pytest.mark.slow
def test_btcv_bundle_train(tmp_path):
    cfg = os.path.join(BUNDLES, "btcv_swinunetr", "configs", "train.json")
    wf = _run(cfg, tmp_path, num_synth_images=4, epochs=1, roi_size=[32, 32, 32],
              **{"network#feature_size": 12, "network#use_checkpoint": False})
    metrics = wf.parser.get_parsed_content("evaluator").state.metrics
    assert np.isfinite(metrics["val_mean_dice"])


@pytest.mark.slow
def test_auto3dseg_bundle_run(tmp_path):
    cfg = os.path.join(BUNDLES, "auto3dseg", "configs", "run.json")
    wf = _run(cfg, tmp_path, num_synth_images=4, algos=["unet"],
              training_params={"roi_size": [16, 16, 16], "max_epochs": 1, "batch_size": 1})
    runner = wf.parser.get_parsed_content("runner")
    assert any(os.path.isdir(os.path.join(str(tmp_path), "work_dir", d))
               for d in os.listdir(os.path.join(str(tmp_path), "work_dir")))


def test_bundle_metadata_present():
    for b in ["mednist_classification", "spleen_ct_segmentation", "brats_segresnet",
              "btcv_swinunetr", "auto3dseg"]:
        meta = os.path.join(BUNDLES, b, "configs", "metadata.json")
        assert os.path.exists(meta), meta
        md = json.load(open(meta))
        assert md.get("name") and md.get("description")
