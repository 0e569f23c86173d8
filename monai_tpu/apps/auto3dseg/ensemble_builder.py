"""Auto3DSeg ensembling (reference: monai/apps/auto3dseg/ensemble_builder.py —
AlgoEnsemble/AlgoEnsembleBestN/AlgoEnsembleBestByFold/EnsembleBuilder)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from copy import deepcopy
from typing import Any

import numpy as np

from ...utils.enums import AlgoKeys

__all__ = ["AlgoEnsemble", "AlgoEnsembleBestN", "AlgoEnsembleBestByFold", "EnsembleBuilder"]


class AlgoEnsemble(ABC):
    """Ensemble of trained algos (reference: ensemble_builder.py AlgoEnsemble)."""

    def __init__(self):
        self.algos: list[dict] = []
        self.mode = "mean"
        self.infer_files: list = []

    def set_algos(self, infer_algos: list[dict]) -> None:
        self.algos = deepcopy(infer_algos)

    def get_algo(self, identifier: str):
        for algo in self.algos:
            if identifier == algo[AlgoKeys.ID]:
                return algo
        return None

    def get_algo_ensemble(self) -> list:
        return self.algos

    def set_infer_files(self, dataroot: str, data_list_or_path, data_key: str = "testing") -> None:
        import json
        import os

        if isinstance(data_list_or_path, list):
            self.infer_files = data_list_or_path
            return
        with open(data_list_or_path) as f:
            datalist = json.load(f)
        files = datalist.get(data_key, [])
        out = []
        for f_item in files:
            item = dict(f_item) if isinstance(f_item, dict) else {"image": f_item}
            for k, v in item.items():
                if isinstance(v, str) and not os.path.isabs(v):
                    item[k] = os.path.join(dataroot, v)
            out.append(item)
        self.infer_files = out

    def ensemble_pred(self, preds: list, sigmoid: bool = False):
        """Average or vote over member predictions (reference: ensemble_builder.py)."""
        from ...transforms.post_array import MeanEnsemble, VoteEnsemble

        if self.mode == "mean":
            return MeanEnsemble()(preds)
        return VoteEnsemble(num_classes=None)(preds)

    def __call__(self, pred_param: dict | None = None) -> list:
        param = pred_param or {}
        files = param.pop("infer_files", self.infer_files)
        sigmoid = param.pop("sigmoid", False)
        outputs = []
        for file in files:
            preds = []
            for algo in self.collect_algos():
                a = algo[AlgoKeys.ALGO]
                preds.extend(a.predict({"files": [file["image"] if isinstance(file, dict) else file]}))
            outputs.append(self.ensemble_pred(preds, sigmoid=sigmoid))
        return outputs

    @abstractmethod
    def collect_algos(self) -> list:
        raise NotImplementedError


class AlgoEnsembleBestN(AlgoEnsemble):
    """Top-N by score (reference: ensemble_builder.py AlgoEnsembleBestN)."""

    def __init__(self, n_best: int = 5):
        super().__init__()
        self.n_best = n_best

    def sort_score(self) -> list:
        scores = [a.get(AlgoKeys.SCORE, -np.inf) for a in self.algos]
        return np.argsort(scores).tolist()

    def collect_algos(self, n_best: int = -1) -> list:
        if n_best <= 0:
            n_best = self.n_best
        ranks = self.sort_score()
        if len(ranks) < n_best:
            n_best = len(ranks)
        keep = set(ranks[-n_best:])
        return [a for i, a in enumerate(self.algos) if i in keep]


class AlgoEnsembleBestByFold(AlgoEnsemble):
    """Best model per CV fold (reference: ensemble_builder.py AlgoEnsembleBestByFold)."""

    def __init__(self, n_fold: int = 5):
        super().__init__()
        self.n_fold = n_fold

    def collect_algos(self) -> list:
        best_per_fold = []
        for f_idx in range(self.n_fold):
            best_score = -np.inf
            best_model = None
            for algo in self.algos:
                identifier = algo[AlgoKeys.ID].split("_")[-1]
                try:
                    algo_id = int(identifier)
                except ValueError:
                    continue
                if algo_id == f_idx and algo.get(AlgoKeys.SCORE, -np.inf) > best_score:
                    best_model = algo
                    best_score = algo[AlgoKeys.SCORE]
            if best_model is not None:
                best_per_fold.append(best_model)
        return best_per_fold


class EnsembleBuilder:
    """Assemble trained algos into an ensemble (reference: ensemble_builder.py EnsembleBuilder)."""

    def __init__(self, history: list[dict], data_src_cfg_name: str | None = None):
        self.infer_algos: list[dict] = []
        self.ensemble: AlgoEnsemble | None = None
        for algo_dict in history:
            name = algo_dict[AlgoKeys.ID]
            gen_algo = algo_dict[AlgoKeys.ALGO]
            best_metric = getattr(gen_algo, "best_metric", None)
            if best_metric is None:
                try:
                    best_metric = gen_algo.get_score()
                except Exception:
                    best_metric = -np.inf
            self.add_inferer(name, gen_algo, best_metric)

    def add_inferer(self, identifier: str, gen_algo, best_metric: float | None = None) -> None:
        algo = {AlgoKeys.ID: identifier, AlgoKeys.ALGO: gen_algo, AlgoKeys.SCORE: best_metric}
        self.infer_algos.append(algo)

    def set_ensemble_method(self, ensemble: AlgoEnsemble, *args, **kwargs) -> None:
        ensemble.set_algos(self.infer_algos)
        self.ensemble = ensemble

    def get_ensemble(self) -> AlgoEnsemble:
        if self.ensemble is None:
            self.set_ensemble_method(AlgoEnsembleBestN())
        return self.ensemble


AlgoEnsembleBuilder = EnsembleBuilder  # reference class name (ensemble_builder.py:317)


class EnsembleRunner:
    """Standalone driver for the ensemble-inference stage: build the ensemble from a
    training history, pick the method, run prediction over the test list
    (reference: ensemble_builder.py:397 EnsembleRunner)."""

    def __init__(self, data_src_cfg_name: str | None = None, work_dir: str = "./work_dir",
                 indices=None, ensemble_method_name: str = "AlgoEnsembleBestByFold",
                 mgpu: bool = False, **kwargs):
        self.data_src_cfg_name = data_src_cfg_name
        self.work_dir = work_dir
        self.indices = indices
        self.ensemble_method_name = ensemble_method_name
        self.kwargs = dict(kwargs)
        self.ensemble: AlgoEnsemble | None = None

    def set_ensemble_method(self, ensemble_method_name: str = "AlgoEnsembleBestByFold",
                            **kwargs) -> None:
        self.ensemble_method_name = ensemble_method_name
        self.kwargs.update(kwargs)

    def _make_method(self, num_fold: int = 1) -> AlgoEnsemble:
        if self.ensemble_method_name == "AlgoEnsembleBestN":
            return AlgoEnsembleBestN(n_best=self.kwargs.get("n_best", 2))
        if self.ensemble_method_name == "AlgoEnsembleBestByFold":
            return AlgoEnsembleBestByFold(n_fold=num_fold)
        raise ValueError(f"Unsupported ensemble method {self.ensemble_method_name}.")

    def run(self, history: list[dict] | None = None, num_fold: int = 1,
            pred_param: dict | None = None) -> list:
        """Build + execute the ensemble; returns per-case ensembled predictions."""
        if history is None:
            from .utils import import_bundle_algo_history

            history = import_bundle_algo_history(self.work_dir, only_trained=True)
        builder = EnsembleBuilder(history, self.data_src_cfg_name)
        builder.set_ensemble_method(self._make_method(num_fold))
        self.ensemble = builder.get_ensemble()
        if self.data_src_cfg_name and not self.ensemble.infer_files:
            import json

            with open(self.data_src_cfg_name) as f:
                src = json.load(f)
            self.ensemble.set_infer_files(src.get("dataroot", ""), src.get("datalist", {}))
        return self.ensemble(pred_param or {})
