"""Auto3DSeg end-to-end: analyze -> BundleGen -> bundle train -> ensemble (+HPO).

Reference pattern: tests/integration/test_integration_autorunner.py,
monai/apps/auto3dseg/bundle_gen.py, hpo_gen.py.
"""
import json
import os

import numpy as np
import pytest

from monai_tpu.apps.auto3dseg import (
    AutoRunner,
    BundleAlgo,
    BundleGen,
    GridHPOGen,
    NNIGen,
    algo_templates,
)
from monai_tpu.data import create_test_image_3d, write_nifti
from monai_tpu.utils.enums import AlgoKeys


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("a3s")
    rs = np.random.RandomState(0)
    items = []
    for i in range(4):
        img, seg = create_test_image_3d(32, 32, 32, rad_max=8, random_state=rs)
        ip, sp = str(root / f"img{i}.nii.gz"), str(root / f"seg{i}.nii.gz")
        write_nifti(img.astype(np.float32), ip)
        write_nifti(seg.astype(np.float32), sp)
        items.append({"image": ip, "label": sp})
    datalist_path = str(root / "datalist.json")
    with open(datalist_path, "w") as f:
        json.dump({"training": items}, f)
    return str(root), datalist_path, items


TRAIN_PARAMS = {"roi_size": (16, 16, 16), "max_epochs": 1, "batch_size": 1}


class TestBundleGen:
    def test_generate_writes_bundles(self, seg_dataset, tmp_path):
        root, datalist_path, items = seg_dataset
        gen = BundleGen(algos=["unet", "segresnet"], data_stats_filename={})
        history = gen.generate(str(tmp_path), num_fold=2, datalist=items, **TRAIN_PARAMS)
        assert len(history) == 4  # 2 algos x 2 folds
        for rec in history:
            algo = rec[AlgoKeys.ALGO]
            cfg_file = os.path.join(algo.get_output_path(), "configs", "train.json")
            assert os.path.exists(cfg_file)
            with open(cfg_file) as f:
                cfg = json.load(f)
            assert cfg["network"]["_target_"] in ("UNet", "SegResNet")
            assert len(cfg["datalist"]) == 2  # leave-one-fold-out of 4

    def test_template_stats_fill(self):
        stats = {"stats_summary": {"image_stats": {"spacing": {"median": [2.0, 2.0, 3.0]},
                                                   "intensity": {"mean": 5.0, "std": 2.0}},
                                   "label_stats": {"labels": [0, 1, 2]}}}
        algo = BundleAlgo("unet")
        cfg = algo.fill_template_config(stats, **TRAIN_PARAMS)
        assert cfg["pixdim"] == [2.0, 2.0, 3.0]
        assert cfg["n_classes"] == 3

    def test_all_templates_have_network(self):
        for name in algo_templates:
            cfg = BundleAlgo(name).fill_template_config({}, **TRAIN_PARAMS)
            assert "_target_" in cfg["network"]
            assert cfg["run"] == ["$@trainer.run()"]

    def test_unknown_template_raises(self):
        with pytest.raises(ValueError):
            BundleAlgo("notanalgo").fill_template_config({})


@pytest.mark.slow
class TestAutoRunnerE2E:
    def test_full_pipeline(self, seg_dataset, tmp_path):
        root, datalist_path, _ = seg_dataset
        runner = AutoRunner(work_dir=str(tmp_path), algos=["unet"], ensemble=True,
                            input={"datalist": datalist_path, "dataroot": root,
                                   "modality": "CT"}, num_fold=2)
        runner.set_training_params(TRAIN_PARAMS)
        ensemble = runner.run()
        assert ensemble is not None
        trained = [r for r in runner.history if r.get(AlgoKeys.IS_TRAINED)]
        assert len(trained) == 2
        for rec in trained:
            out = rec[AlgoKeys.ALGO].get_output_path()
            assert os.path.exists(os.path.join(out, "configs", "train.json"))
            assert os.path.exists(os.path.join(out, "result.json"))


class TestHPO:
    def test_grid_search_over_trainable(self):
        class ToyAlgo:
            """Algo whose score is maximized at lr=0.1, depth=2."""

            def __init__(self):
                self.score = -1.0

            def train(self, params):
                self.score = -abs(params["lr"] - 0.1) - abs(params["depth"] - 2)

            def get_score(self):
                return self.score

        driver = GridHPOGen(algo=ToyAlgo(),
                            search_space={"lr": [0.01, 0.1, 1.0], "depth": [1, 2]})
        best_params, best_score, trials = driver.run()
        assert best_params == {"lr": 0.1, "depth": 2}
        assert best_score == 0.0
        assert len(trials) == 6

    def test_nnigen_raises_without_nni(self):
        gen = NNIGen()
        if gen._has_nni:
            pytest.skip("nni installed")
        with pytest.raises(ImportError):
            gen.get_hyperparameters()
