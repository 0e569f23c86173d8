"""nnU-Net V2 orchestration runner (reference: monai/apps/nnunet/nnunetv2_runner.py:37).

The runner shells out to the optional `nnunetv2` package, which is not bundled in this
environment — every method gates on its availability with a clear ImportError. The
class structure (convert/plan/preprocess/train/validate/predict/run) mirrors the
reference so bundles and user scripts can target the same API.
"""
from __future__ import annotations

import os
from typing import Any

from ...utils.module import optional_import

__all__ = ["nnUNetV2Runner"]


class nnUNetV2Runner:  # noqa: N801
    """(reference: nnunetv2_runner.py:37)."""

    def __init__(self, input_config: Any, trainer_class_name: str = "nnUNetTrainer",
                 work_dir: str = "work_dir", export_validation_probabilities: bool = True):
        _, has = optional_import("nnunetv2")
        if not has:
            raise ImportError(
                "nnUNetV2Runner requires the optional 'nnunetv2' package, which is not "
                "installed in this environment.")
        from ...bundle.config_parser import ConfigParser

        self.input_info_path = input_config if isinstance(input_config, str) else None
        self.input_info = ConfigParser.load_config_file(input_config) \
            if isinstance(input_config, str) else dict(input_config)
        self.trainer_class_name = trainer_class_name
        self.work_dir = work_dir
        self.export_validation_probabilities = export_validation_probabilities
        os.makedirs(self.work_dir, exist_ok=True)
        self.dataset_name_or_id = str(self.input_info.get("dataset_name_or_id", "1"))
        # nnU-Net environment layout
        self.nnunet_raw = os.path.join(self.work_dir, "nnUNet_raw_data_base")
        self.nnunet_preprocessed = os.path.join(self.work_dir, "nnUNet_preprocessed")
        self.nnunet_results = os.path.join(self.work_dir, "nnUNet_trained_models")
        for p in (self.nnunet_raw, self.nnunet_preprocessed, self.nnunet_results):
            os.makedirs(p, exist_ok=True)
        os.environ["nnUNet_raw"] = self.nnunet_raw
        os.environ["nnUNet_preprocessed"] = self.nnunet_preprocessed
        os.environ["nnUNet_results"] = self.nnunet_results

    def convert_dataset(self):
        raise NotImplementedError("requires nnunetv2 dataset conversion utilities")

    def convert_msd_dataset(self, data_dir: str, overwrite_id: str | None = None,
                            n_proc: int = -1) -> None:
        from nnunetv2.dataset_conversion.convert_MSD_dataset import convert_msd_dataset

        convert_msd_dataset(data_dir, overwrite_id, n_proc)

    def extract_fingerprints(self, **kwargs) -> None:
        from nnunetv2.experiment_planning.plan_and_preprocess_api import extract_fingerprints

        extract_fingerprints([int(self.dataset_name_or_id)], **kwargs)

    def plan_experiments(self, **kwargs) -> None:
        from nnunetv2.experiment_planning.plan_and_preprocess_api import plan_experiments

        plan_experiments([int(self.dataset_name_or_id)], **kwargs)

    def preprocess(self, **kwargs) -> None:
        from nnunetv2.experiment_planning.plan_and_preprocess_api import preprocess

        preprocess([int(self.dataset_name_or_id)], **kwargs)

    def plan_and_process(self, **kwargs) -> None:
        self.extract_fingerprints()
        self.plan_experiments()
        self.preprocess()

    def train_single_model(self, config: Any, fold: int, gpu_id=0, **kwargs) -> None:
        from nnunetv2.run.run_training import run_training

        run_training(self.dataset_name_or_id, config, fold,
                     trainer_class_name=self.trainer_class_name, **kwargs)

    def train(self, configs=("3d_fullres", "2d", "3d_lowres", "3d_cascade_fullres"),
              **kwargs) -> None:
        for cfg in ([configs] if isinstance(configs, str) else configs):
            for fold in range(5):
                self.train_single_model(cfg, fold, **kwargs)

    def validate_single_model(self, config: str, fold: int, **kwargs) -> None:
        self.train_single_model(config, fold, val=True, **kwargs)

    def validate(self, configs=("3d_fullres", "2d", "3d_lowres", "3d_cascade_fullres"),
                 **kwargs) -> None:
        for cfg in ([configs] if isinstance(configs, str) else configs):
            for fold in range(5):
                self.validate_single_model(cfg, fold, **kwargs)

    def find_best_configuration(self, **kwargs) -> None:
        from nnunetv2.evaluation.find_best_configuration import (
            find_best_configuration as _find,
        )

        _find(int(self.dataset_name_or_id), **kwargs)

    def predict(self, list_of_lists_or_source_folder, output_folder, **kwargs) -> None:
        from nnunetv2.inference.predict_from_raw_data import nnUNetPredictor

        predictor = nnUNetPredictor()
        predictor.predict_from_files(list_of_lists_or_source_folder, output_folder, **kwargs)

    def run(self, run_convert_dataset: bool = True, run_plan_and_process: bool = True,
            run_train: bool = True, run_find_best_configuration: bool = True,
            run_predict_ensemble_postprocessing: bool = True) -> None:
        if run_convert_dataset:
            self.convert_dataset()
        if run_plan_and_process:
            self.plan_and_process()
        if run_train:
            self.train()
        if run_find_best_configuration:
            self.find_best_configuration()
