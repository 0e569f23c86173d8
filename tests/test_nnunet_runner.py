"""nnUNetV2Runner orchestration tests (reference: monai/apps/nnunet/nnunetv2_runner.py).

The external nnunetv2 package is absent here; these cover the natively-implemented
parts: dataset conversion to the nnU-Net raw layout, training-command generation,
multi-device job scheduling, environment setup, and the gating behavior.
"""
import json
import os

import numpy as np
import pytest

from monai_tpu.apps.nnunet import nnUNetV2Runner
from monai_tpu.data import create_test_image_3d, write_nifti


@pytest.fixture()
def msd_input(tmp_path):
    rs = np.random.RandomState(0)
    items, tests = [], []
    for i in range(3):
        img, seg = create_test_image_3d(16, 16, 16, rad_max=6, random_state=rs)
        ip, sp = str(tmp_path / f"im{i}.nii.gz"), str(tmp_path / f"lb{i}.nii.gz")
        write_nifti(img.astype(np.float32), ip)
        write_nifti(seg.astype(np.float32), sp)
        items.append({"image": ip, "label": sp})
    img, _ = create_test_image_3d(16, 16, 16, rad_max=6, random_state=rs)
    tp = str(tmp_path / "test0.nii.gz")
    write_nifti(img.astype(np.float32), tp)
    tests.append({"image": tp})
    cfg = {"dataset_name_or_id": "7", "dataset_name": "Toy", "modality": "CT",
           "datalist": {"training": items, "testing": tests},
           "labels": {"0": "background", "1": "lesion"}, "num_folds": 2}
    return cfg


class TestConvertDataset:
    def test_raw_layout_written(self, msd_input, tmp_path):
        runner = nnUNetV2Runner(msd_input, work_dir=str(tmp_path / "wd"))
        out = runner.convert_dataset()
        assert os.path.basename(out) == "Dataset007_Toy"
        imgs = sorted(os.listdir(os.path.join(out, "imagesTr")))
        labs = sorted(os.listdir(os.path.join(out, "labelsTr")))
        assert imgs == ["case_00000_0000.nii.gz", "case_00001_0000.nii.gz",
                        "case_00002_0000.nii.gz"]
        assert labs == ["case_00000.nii.gz", "case_00001.nii.gz", "case_00002.nii.gz"]
        assert os.listdir(os.path.join(out, "imagesTs")) == ["case_00000_0000.nii.gz"]
        with open(os.path.join(out, "dataset.json")) as f:
            meta = json.load(f)
        assert meta["numTraining"] == 3
        assert meta["channel_names"] == {"0": "CT"}
        assert meta["labels"] == {"background": 0, "lesion": 1}

    def test_env_layout(self, msd_input, tmp_path):
        runner = nnUNetV2Runner(msd_input, work_dir=str(tmp_path / "wd"))
        assert os.environ["nnUNet_raw"] == runner.nnunet_raw
        for p in (runner.nnunet_raw, runner.nnunet_preprocessed, runner.nnunet_results):
            assert os.path.isdir(p)


class TestCommandGeneration:
    def test_single_command(self, msd_input, tmp_path):
        runner = nnUNetV2Runner(msd_input, work_dir=str(tmp_path / "wd"))
        cmd = runner.train_single_model_command("3d_fullres", 2, device_id=1,
                                                kwargs={"num_epochs": 5})
        assert "nnUNetv2_train 7 3d_fullres 2" in cmd
        assert "CUDA_VISIBLE_DEVICES=1" in cmd
        assert "-tr nnUNetTrainer" in cmd and "--npz" in cmd and "--num_epochs=5" in cmd

    def test_parallel_round_robin(self, msd_input, tmp_path):
        runner = nnUNetV2Runner(msd_input, work_dir=str(tmp_path / "wd"))
        queues = runner.train_parallel_cmd(configs=("3d_fullres", "2d"), device_ids=(0, 1, 2))
        # 2 configs x 2 folds = 4 jobs over 3 devices
        assert [len(q) for q in queues] == [2, 1, 1]
        assert all("CUDA_VISIBLE_DEVICES=0" in c for c in queues[0])
        assert all("CUDA_VISIBLE_DEVICES=2" in c for c in queues[2])


class TestGating:
    def test_external_steps_raise_cleanly(self, msd_input, tmp_path):
        runner = nnUNetV2Runner(msd_input, work_dir=str(tmp_path / "wd"))
        for step in (runner.extract_fingerprints, runner.plan_experiments,
                     runner.preprocess, runner.find_best_configuration):
            with pytest.raises(ImportError):
                step()
        with pytest.raises(ImportError):
            runner.train_single_model("3d_fullres", 0)
        with pytest.raises(ImportError):
            runner.predict([], str(tmp_path / "o"))
