"""nnU-Net bundle integration (VERDICT r2 missing #5: ModelnnUNetWrapper surface).

nnunetv2 is not installed in this environment; the checkpoint/file orchestration
runs for real with torch, the predictor construction is covered with mocks.

Reference: monai/apps/nnunet/nnunet_bundle.py:142,293,347,478.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from monai_tpu.apps.nnunet import (
    ModelnnUNetWrapper,
    convert_monai_bundle_to_nnunet,
    convert_nnunet_to_monai_bundle,
    get_nnunet_monai_predictor,
)
from monai_tpu.data.meta_image import MetaImage


def test_spacing_from_meta():
    assert ModelnnUNetWrapper.spacing_from_meta(
        {"pixdim": np.asarray([[1.0, 1.5, 2.0, 2.5, 0, 0, 0, 0]])}) == [1.5, 2.0, 2.5]
    aff = np.diag([-1.25, 2.0, 3.0, 1.0])
    assert ModelnnUNetWrapper.spacing_from_meta({"affine": aff}) == [1.25, 2.0, 3.0]
    assert ModelnnUNetWrapper.spacing_from_meta({}) == [1.0, 1.0, 1.0]


def test_wrapper_requires_nnunetv2():
    with pytest.raises(ImportError):
        get_nnunet_monai_predictor("/tmp/nope")


def _fake_nnunet_results(root, dataset="Dataset001_Test", fold=0):
    mdir = os.path.join(root, dataset, "nnUNetTrainer__nnUNetPlans__3d_fullres")
    os.makedirs(os.path.join(mdir, f"fold_{fold}"), exist_ok=True)
    weights = {"conv.weight": torch.randn(2, 2)}
    for name in ("checkpoint_final.pth", "checkpoint_best.pth"):
        torch.save({"inference_allowed_mirroring_axes": (0, 1, 2),
                    "init_args": {"configuration": "3d_fullres"},
                    "trainer_name": "nnUNetTrainer",
                    "network_weights": weights},
                   os.path.join(mdir, f"fold_{fold}", name))
    import json

    for fname in ("plans.json", "dataset.json"):
        with open(os.path.join(mdir, fname), "w") as f:
            json.dump({"name": fname}, f)
    return mdir


def test_convert_nnunet_to_monai_bundle(tmp_path, monkeypatch):
    results = str(tmp_path / "results")
    bundle = str(tmp_path / "bundle")
    _fake_nnunet_results(results)
    monkeypatch.setenv("nnUNet_results", results)
    os.makedirs(os.path.join(bundle, "models"), exist_ok=True)
    convert_nnunet_to_monai_bundle({"dataset_name_or_id": "Dataset001_Test"}, bundle)
    models = os.path.join(bundle, "models")
    assert os.path.exists(os.path.join(models, "nnunet_checkpoint.pth"))
    assert os.path.exists(os.path.join(models, "fold_0", "model.pt"))
    assert os.path.exists(os.path.join(models, "fold_0", "best_model.pt"))
    assert os.path.exists(os.path.join(models, "plans.json"))
    ck = torch.load(os.path.join(models, "nnunet_checkpoint.pth"), weights_only=False)
    assert ck["trainer_name"] == "nnUNetTrainer"
    assert "network_weights" not in ck  # stripped into model.pt
    mk = torch.load(os.path.join(models, "fold_0", "model.pt"), weights_only=False)
    assert "network_weights" in mk


def test_convert_monai_bundle_to_nnunet(tmp_path, monkeypatch):
    results = str(tmp_path / "results")
    bundle = str(tmp_path / "bundle")
    monkeypatch.setenv("nnUNet_results", results)
    fold_dir = os.path.join(bundle, "models", "fold_0")
    os.makedirs(fold_dir, exist_ok=True)
    torch.save({"inference_allowed_mirroring_axes": (0,),
                "init_args": {"configuration": "3d_fullres"},
                "trainer_name": "nnUNetTrainer"},
               os.path.join(bundle, "models", "nnunet_checkpoint.pth"))
    weights = {"w": torch.ones(2)}
    torch.save({"network_weights": weights, "optimizer_state": {}},
               os.path.join(fold_dir, "checkpoint_epoch=7.pt"))
    torch.save({"network_weights": weights},
               os.path.join(fold_dir, "checkpoint_key_metric=0.91.pt"))
    convert_monai_bundle_to_nnunet({"dataset_name_or_id": "Dataset001_Test"}, bundle)
    out = os.path.join(results, "Dataset001_Test",
                       "nnUNetTrainer__nnUNetPlans__3d_fullres", "fold_0")
    final = torch.load(os.path.join(out, "checkpoint_final.pth"), weights_only=False)
    assert final["current_epoch"] == 7
    assert "network_weights" in final
    assert os.path.exists(os.path.join(out, "checkpoint_best.pth"))


def test_wrapper_forward_with_mock_predictor():
    """__call__ path: spacing extraction + predictor invocation + MetaImage out."""
    wrapper = ModelnnUNetWrapper.__new__(ModelnnUNetWrapper)  # skip nnunetv2 init

    class MockPredictor:
        def predict_from_list_of_npy_arrays(self, image, _, props, **kw):
            assert props["spacing"] == [1.5, 1.5, 2.0]
            return [np.zeros(image.shape[-3:], np.int64)]

    wrapper.predictor = MockPredictor()
    x = MetaImage(np.zeros((1, 1, 8, 8, 4), np.float32),
                  meta={"pixdim": np.asarray([[1.0, 1.5, 1.5, 2.0, 0, 0, 0, 0]])})
    out = wrapper(x)
    assert isinstance(out, MetaImage)
    assert np.asarray(out.data).shape == (1, 1, 8, 8, 4)
    with pytest.raises(TypeError):
        wrapper(np.zeros((1, 1, 4, 4, 4)))
