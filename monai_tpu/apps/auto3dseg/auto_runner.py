"""AutoRunner: analyze → algo_gen → train → ensemble pipeline.

Parity target: monai/apps/auto3dseg/auto_runner.py:40 (run:803, sequential training
:711-736).  The NNI-HPO path is stubbed (zero-egress); training runs in-process.
"""
from __future__ import annotations

import json
import os
from typing import Any, cast

import numpy as np

from ...utils.enums import AlgoKeys
from .algo_gen import SegAlgo
from .analyzer import DataAnalyzer
from .ensemble_builder import AlgoEnsembleBestByFold, AlgoEnsembleBestN, EnsembleBuilder

__all__ = ["AutoRunner"]


class AutoRunner:
    """End-to-end Auto3DSeg (reference: auto_runner.py:40).

    input config: {"datalist": path-or-dict, "dataroot": dir, "modality": "CT"/"MR"}.
    """

    analyze_params: dict | None

    def __init__(self, work_dir: str = "./work_dir", input: dict | str | None = None,
                 algos: list[str] | str | None = None, analyze: bool | None = None,
                 algo_gen: bool | None = None, train: bool | None = None, hpo: bool = False,
                 hpo_backend: str = "nni", ensemble: bool = True, not_use_cache: bool = False,
                 templates_path_or_url: str | None = None, allow_skip: bool = True, **kwargs):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)
        if isinstance(input, str):
            with open(input) as f:
                input = json.load(f) if input.endswith(".json") else __import__("yaml").safe_load(f)
        self.input_cfg: dict = input or {}
        self.algos = [algos] if isinstance(algos, str) else (algos or ["unet", "segresnet"])
        self.analyze = True if analyze is None else analyze
        self.algo_gen_flag = True if algo_gen is None else algo_gen
        self.train_flag = True if train is None else train
        self.ensemble_flag = ensemble
        self.num_fold = kwargs.get("num_fold", 2)
        self.hpo = hpo
        self.hpo_backend = hpo_backend
        self.hpo_params: dict | None = None
        self.train_params: dict = {}
        self.history: list[dict] = []
        self.data_stats: dict = {}
        self.datastats_filename = os.path.join(self.work_dir, "datastats.json")
        self.ensemble_method_name = "AlgoEnsembleBestByFold"

    def set_num_fold(self, num_fold: int) -> "AutoRunner":
        self.num_fold = num_fold
        return self

    def set_training_params(self, params: dict) -> "AutoRunner":
        self.train_params = dict(params)
        return self

    def set_hpo_params(self, params: dict) -> "AutoRunner":
        """Search space for the local HPO driver ({param: [choices...]})."""
        self.hpo_params = dict(params)
        return self

    def set_ensemble_method(self, ensemble_method_name: str = "AlgoEnsembleBestByFold", **kwargs) -> "AutoRunner":
        self.ensemble_method_name = ensemble_method_name
        return self

    def _load_datalist(self) -> list[dict]:
        datalist = self.input_cfg.get("datalist")
        dataroot = self.input_cfg.get("dataroot", "")
        if isinstance(datalist, str):
            with open(datalist) as f:
                dl = json.load(f)
        else:
            dl = datalist
        items = dl.get("training", dl if isinstance(dl, list) else [])
        out = []
        for item in items:
            entry = dict(item) if isinstance(item, dict) else {"image": item}
            for k, v in entry.items():
                if isinstance(v, str) and dataroot and not os.path.isabs(v):
                    entry[k] = os.path.join(dataroot, v)
            out.append(entry)
        return out

    def run(self):
        """Pipeline: analyze → generate → train per fold → ensemble
        (reference: auto_runner.py:803)."""
        # 1. analyze
        if self.analyze:
            analyzer = DataAnalyzer(self.input_cfg.get("datalist"), self.input_cfg.get("dataroot", ""),
                                    output_path=self.datastats_filename, fmt="json")
            self.data_stats = analyzer.get_all_case_stats()
        elif os.path.exists(self.datastats_filename):
            with open(self.datastats_filename) as f:
                self.data_stats = json.load(f)

        # 2. generate on-disk algorithm bundles (BundleGen) per (template, fold)
        datalist = self._load_datalist()
        if self.algo_gen_flag:
            from .bundle_gen import BundleGen

            gen = BundleGen(algo_path=self.work_dir, algos=self.algos,
                            data_stats_filename=self.data_stats or self.datastats_filename)
            template_params = {k: v for k, v in self.train_params.items()
                               if k in ("roi_size", "max_epochs", "lr", "batch_size")}
            self.history = gen.generate(self.work_dir, num_fold=self.num_fold,
                                        datalist=datalist, **template_params)

        # 3. train each generated bundle (optionally wrapped in local HPO)
        if self.train_flag:
            for record in self.history:
                algo = record[AlgoKeys.ALGO]
                overrides = {k: v for k, v in self.train_params.items()
                             if k in ("max_epochs", "lr", "batch_size")}
                if self.hpo:
                    from .hpo_gen import GridHPOGen

                    space = self.hpo_params or {"lr": [1e-3, 1e-4]}
                    driver = GridHPOGen(algo=algo, search_space=space)
                    best_params, best_score, _ = driver.run(
                        output_folder=algo.get_output_path() or self.work_dir)
                    algo.train({**overrides, **best_params})
                else:
                    algo.train(overrides)
                record[AlgoKeys.IS_TRAINED] = True
                record[AlgoKeys.SCORE] = algo.get_score()

        # 4. ensemble
        if self.ensemble_flag and self.history:
            builder = EnsembleBuilder(self.history)
            if self.ensemble_method_name == "AlgoEnsembleBestN":
                builder.set_ensemble_method(AlgoEnsembleBestN())
            else:
                builder.set_ensemble_method(AlgoEnsembleBestByFold(n_fold=self.num_fold))
            self.ensemble = builder.get_ensemble()
            return self.ensemble
        return self.history
