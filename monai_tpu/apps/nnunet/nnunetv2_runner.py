"""nnU-Net V2 orchestration runner (reference: monai/apps/nnunet/nnunetv2_runner.py:37).

The runner reproduces the reference's full orchestration surface: dataset
conversion into the nnU-Net raw layout (implemented natively with this package's
IO — no nnunetv2 needed), experiment planning/preprocessing, per-fold training with
multi-device scheduling, validation, best-configuration search, ensemble prediction
+ postprocessing, and the all-in-one ``run``. Methods that execute the external
``nnunetv2`` package (CUDA/torch) gate on its availability with a clear
ImportError; everything else (conversion, command generation, fold scheduling,
environment layout) runs standalone.


NOTE: every verb shells out to the optional ``nnunetv2`` package, which is
not installed in this environment — the orchestration is exercised with
mocks in tests/test_nnunet_runner.py and the live integration is unproven
here (it follows the reference CLI contract, apps/nnunet/nnunetv2_runner.py).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
from typing import Any, Sequence

from ...utils.module import optional_import

__all__ = ["nnUNetV2Runner"]

_CONFIGS = ("3d_fullres", "2d", "3d_lowres", "3d_cascade_fullres")


def _require_nnunetv2():
    mod, has = optional_import("nnunetv2")
    if not has:
        raise ImportError(
            "this step executes the external 'nnunetv2' package, which is not installed "
            "in this environment. Dataset conversion / command generation / scheduling "
            "still work without it.")
    return mod


class nnUNetV2Runner:  # noqa: N801
    """(reference: nnunetv2_runner.py:37, run:926)."""

    def __init__(self, input_config: Any, trainer_class_name: str = "nnUNetTrainer",
                 work_dir: str = "work_dir", export_validation_probabilities: bool = True):
        from ...bundle.config_parser import ConfigParser

        self.input_info_path = input_config if isinstance(input_config, str) else None
        self.input_info = ConfigParser.load_config_file(input_config) \
            if isinstance(input_config, str) else dict(input_config)
        self.trainer_class_name = trainer_class_name
        self.work_dir = os.path.abspath(work_dir)
        self.export_validation_probabilities = export_validation_probabilities
        self.dataset_name_or_id = str(self.input_info.get("dataset_name_or_id", "1"))
        self.num_folds = int(self.input_info.get("num_folds", 5))
        # nnU-Net environment layout (reference :172-205)
        self.nnunet_raw = os.path.join(self.work_dir, "nnUNet_raw_data_base")
        self.nnunet_preprocessed = os.path.join(self.work_dir, "nnUNet_preprocessed")
        self.nnunet_results = os.path.join(self.work_dir, "nnUNet_trained_models")
        for p in (self.work_dir, self.nnunet_raw, self.nnunet_preprocessed, self.nnunet_results):
            os.makedirs(p, exist_ok=True)
        os.environ["nnUNet_raw"] = self.nnunet_raw
        os.environ["nnUNet_preprocessed"] = self.nnunet_preprocessed
        os.environ["nnUNet_results"] = self.nnunet_results

    # -- dataset conversion (native implementation, reference :216-283) ----------
    @property
    def dataset_folder_name(self) -> str:
        ds_id = int(self.dataset_name_or_id) if str(self.dataset_name_or_id).isdigit() else 1
        name = self.input_info.get("dataset_name", "Task")
        return f"Dataset{ds_id:03d}_{name}"

    def _load_datalist(self) -> dict:
        dl = self.input_info.get("datalist")
        if isinstance(dl, str):
            with open(dl) as f:
                dl = json.load(f)
        return dl or {}

    def convert_dataset(self) -> str:
        """Convert a MONAI/MSD-style datalist into the nnU-Net raw layout:
        imagesTr/*_0000.nii.gz, labelsTr/*.nii.gz, imagesTs + dataset.json
        (reference :216 convert_dataset). Pure file orchestration — runs natively."""
        dataroot = self.input_info.get("dataroot", "")
        datalist = self._load_datalist()
        out_root = os.path.join(self.nnunet_raw, self.dataset_folder_name)
        images_tr = os.path.join(out_root, "imagesTr")
        labels_tr = os.path.join(out_root, "labelsTr")
        images_ts = os.path.join(out_root, "imagesTs")
        for p in (images_tr, labels_tr, images_ts):
            os.makedirs(p, exist_ok=True)

        def _resolve(path: str) -> str:
            return path if os.path.isabs(path) else os.path.join(dataroot, path)

        def _case_name(i: int) -> str:
            return f"case_{i:05d}"

        n_train = 0
        for i, item in enumerate(datalist.get("training", [])):
            img = _resolve(item["image"] if isinstance(item, dict) else item)
            shutil.copyfile(img, os.path.join(images_tr, f"{_case_name(i)}_0000.nii.gz"))
            if isinstance(item, dict) and "label" in item:
                shutil.copyfile(_resolve(item["label"]),
                                os.path.join(labels_tr, f"{_case_name(i)}.nii.gz"))
            n_train += 1
        for i, item in enumerate(datalist.get("testing", [])):
            img = _resolve(item["image"] if isinstance(item, dict) else item)
            shutil.copyfile(img, os.path.join(images_ts, f"{_case_name(i)}_0000.nii.gz"))

        modality = self.input_info.get("modality", "CT")
        labels = self.input_info.get("labels", {"0": "background", "1": "foreground"})
        dataset_json = {
            "channel_names": {"0": modality if isinstance(modality, str) else modality[0]},
            "labels": {v: int(k) for k, v in labels.items()} if all(
                str(k).isdigit() for k in labels) else labels,
            "numTraining": n_train,
            "file_ending": ".nii.gz",
        }
        with open(os.path.join(out_root, "dataset.json"), "w") as f:
            json.dump(dataset_json, f, indent=2)
        return out_root

    def convert_msd_dataset(self, data_dir: str, overwrite_id: str | None = None,
                            n_proc: int = -1) -> None:
        _require_nnunetv2()
        from nnunetv2.dataset_conversion.convert_MSD_dataset import convert_msd_dataset

        convert_msd_dataset(data_dir, overwrite_id, n_proc)

    # -- planning / preprocessing (delegates to nnunetv2, reference :300-487) ----
    def extract_fingerprints(self, **kwargs) -> None:
        _require_nnunetv2()
        from nnunetv2.experiment_planning.plan_and_preprocess_api import extract_fingerprints

        extract_fingerprints([int(self.dataset_name_or_id)], **kwargs)

    def plan_experiments(self, **kwargs) -> None:
        _require_nnunetv2()
        from nnunetv2.experiment_planning.plan_and_preprocess_api import plan_experiments

        plan_experiments([int(self.dataset_name_or_id)], **kwargs)

    def preprocess(self, **kwargs) -> None:
        _require_nnunetv2()
        from nnunetv2.experiment_planning.plan_and_preprocess_api import preprocess

        preprocess([int(self.dataset_name_or_id)], **kwargs)

    def plan_and_process(self, **kwargs) -> None:
        self.extract_fingerprints()
        self.plan_experiments()
        self.preprocess()

    # -- training (reference :489-684) --------------------------------------------
    def train_single_model(self, config: Any, fold: int, device_id: int | Sequence[int] = 0,
                           **kwargs) -> None:
        """Train one (config, fold) in-process via nnunetv2's API."""
        _require_nnunetv2()
        from nnunetv2.run.run_training import run_training

        run_training(self.dataset_name_or_id, config, fold,
                     trainer_class_name=self.trainer_class_name, **kwargs)

    def train_single_model_command(self, config: Any, fold: int,
                                   device_id: int | Sequence[int] = 0,
                                   kwargs: dict | None = None) -> str:
        """Shell command for one (config, fold) run — the reference's subprocess
        unit (:531). Generated without nnunetv2 (testable/schedulable standalone)."""
        opts = " ".join(f"--{k}={v}" for k, v in (kwargs or {}).items())
        probs = " --npz" if self.export_validation_probabilities else ""
        devices = ",".join(str(d) for d in (device_id if isinstance(device_id, (list, tuple))
                                            else [device_id]))
        return (f"CUDA_VISIBLE_DEVICES={devices} nnUNetv2_train "
                f"{self.dataset_name_or_id} {config} {fold} "
                f"-tr {self.trainer_class_name}{probs} {opts}").strip()

    def train_parallel_cmd(self, configs: Sequence[str] | str = _CONFIGS,
                           device_ids: Sequence[int] = (0,),
                           kwargs: dict | None = None) -> list[list[str]]:
        """Round-robin all (config, fold) jobs over the device list; returns one
        command queue per device (reference :592)."""
        configs_ = [configs] if isinstance(configs, str) else list(configs)
        queues: list[list[str]] = [[] for _ in device_ids]
        job = 0
        for cfg in configs_:
            for fold in range(self.num_folds):
                slot = job % len(device_ids)
                queues[slot].append(self.train_single_model_command(
                    cfg, fold, device_ids[slot], kwargs))
                job += 1
        return queues

    def train_parallel(self, configs: Sequence[str] | str = _CONFIGS,
                       device_ids: Sequence[int] = (0,), **kwargs) -> None:
        """Run each device's command queue as a sequential shell pipeline, all
        devices concurrently (reference :645)."""
        _require_nnunetv2()
        queues = self.train_parallel_cmd(configs, device_ids, kwargs or None)
        procs = [subprocess.Popen(" && ".join(q), shell=True) for q in queues if q]
        for p in procs:
            p.wait()
        if any(p.returncode != 0 for p in procs):
            raise RuntimeError("one or more nnU-Net training shards failed.")

    def train(self, configs: Sequence[str] | str = _CONFIGS, **kwargs) -> None:
        for cfg in ([configs] if isinstance(configs, str) else configs):
            for fold in range(self.num_folds):
                self.train_single_model(cfg, fold, **kwargs)

    # -- validation / model selection (reference :686-762) -----------------------
    def validate_single_model(self, config: str, fold: int, **kwargs) -> None:
        self.train_single_model(config, fold, val=True, **kwargs)

    def validate(self, configs: Sequence[str] | str = _CONFIGS, **kwargs) -> None:
        for cfg in ([configs] if isinstance(configs, str) else configs):
            for fold in range(self.num_folds):
                self.validate_single_model(cfg, fold, **kwargs)

    def find_best_configuration(self, **kwargs) -> None:
        _require_nnunetv2()
        from nnunetv2.evaluation.find_best_configuration import (
            find_best_configuration as _find,
        )

        _find(int(self.dataset_name_or_id), **kwargs)

    # -- prediction / ensembling (reference :763-925) -----------------------------
    def predict(self, list_of_lists_or_source_folder: Any, output_folder: str,
                model_training_output_dir: str | None = None, use_folds=None,
                checkpoint_name: str = "checkpoint_final.pth", **kwargs) -> None:
        _require_nnunetv2()
        from nnunetv2.inference.predict_from_raw_data import nnUNetPredictor

        predictor = nnUNetPredictor()
        if model_training_output_dir:
            predictor.initialize_from_trained_model_folder(
                model_training_output_dir, use_folds=use_folds, checkpoint_name=checkpoint_name)
        predictor.predict_from_files(list_of_lists_or_source_folder, output_folder, **kwargs)

    def predict_ensemble_postprocessing(self, folds: Sequence[int] | None = None,
                                        run_ensemble: bool = True,
                                        run_postprocessing: bool = True, **kwargs) -> None:
        """Predict the test set with the best configuration(s), ensemble the
        per-config probabilities, apply the selected postprocessing
        (reference :850)."""
        _require_nnunetv2()
        from nnunetv2.ensembling.ensemble import ensemble_folders
        from nnunetv2.postprocessing.remove_connected_components import (
            apply_postprocessing_to_folder,
        )

        source = os.path.join(self.nnunet_raw, self.dataset_folder_name, "imagesTs")
        inst_dir = os.path.join(self.nnunet_results, self.dataset_folder_name)
        with open(os.path.join(inst_dir, "inference_information.json")) as f:
            info = json.load(f)
        pred_dirs = []
        for i, sel in enumerate(info.get("best_model_or_ensemble", {}).get(
                "selected_model_or_models", [])):
            out = os.path.join(self.work_dir, f"ensemble_member_{i}")
            self.predict(source, out,
                         model_training_output_dir=os.path.join(inst_dir, sel["name"]),
                         use_folds=folds or sel.get("folds"), save_probabilities=run_ensemble,
                         **kwargs)
            pred_dirs.append(out)
        final = os.path.join(self.work_dir, "ensemble_output")
        if run_ensemble and len(pred_dirs) > 1:
            ensemble_folders(pred_dirs, final)
        else:
            final = pred_dirs[0] if pred_dirs else final
        if run_postprocessing:
            pp_file = info.get("best_model_or_ensemble", {}).get("postprocessing_file")
            if pp_file and os.path.exists(pp_file):
                apply_postprocessing_to_folder(
                    final, os.path.join(self.work_dir, "final_predictions"), pp_file)

    # -- all-in-one (reference :926) ----------------------------------------------
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
        if run_predict_ensemble_postprocessing:
            self.predict_ensemble_postprocessing()
