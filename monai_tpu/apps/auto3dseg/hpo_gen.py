"""Hyper-parameter optimization generators (reference: monai/apps/auto3dseg/hpo_gen.py
NNIGen / OptunaGen).

The reference wraps an external HPO service (NNI / Optuna) around BundleAlgo: the
service proposes params, ``run_algo`` trains the algo with overrides and reports the
score back. NNI/Optuna are not bundled in this environment, so:

- ``NNIGen`` keeps the reference's exact protocol (get_hyperparameters /
  update_params / run_algo / generate) and uses nni when importable, raising a clear
  error otherwise;
- ``GridHPOGen`` / ``RandomHPOGen`` are built-in local search drivers with the same
  protocol, so AutoRunner's hpo=True path works hermetically.
"""
from __future__ import annotations

import itertools
import json
import os
from copy import deepcopy
from typing import Any, Sequence

import numpy as np

from ...utils.module import optional_import
from .algo_gen import Algo, AlgoGen

__all__ = ["HPOGen", "NNIGen", "GridHPOGen", "RandomHPOGen"]


class HPOGen(AlgoGen):
    """Base HPO generator (reference: hpo_gen.py HPOGen)."""

    def __init__(self, algo: Algo | None = None, params: dict | None = None):
        self.algo = algo
        self.params = params or {}
        self.obj_filename: str | None = None

    def get_hyperparameters(self) -> dict:
        """Next parameter proposal (service- or driver-specific)."""
        raise NotImplementedError

    def update_params(self, params: dict) -> None:
        self.params = dict(params)

    def set_score(self, acc) -> None:
        """Report a result back to the HPO driver."""
        raise NotImplementedError

    def run_algo(self, obj_filename: str | None = None, output_folder: str = ".",
                 template_path: str | None = None) -> float:
        """One HPO trial: apply current params, train, report + return the score."""
        algo = self.algo
        if algo is None:
            raise ValueError("no algo attached to this HPO generator.")
        algo.train(self.params)
        score = float(algo.get_score())
        try:
            self.set_score(score)
        except NotImplementedError:
            pass
        return score


class NNIGen(HPOGen):
    """NNI-backed HPO (reference: hpo_gen.py NNIGen). Requires the ``nni`` package."""

    def __init__(self, algo: Algo | None = None, params: dict | None = None):
        super().__init__(algo, params)
        self._nni, self._has_nni = optional_import("nni")

    def get_hyperparameters(self) -> dict:
        if not self._has_nni:
            raise ImportError("NNIGen requires the 'nni' package, which is not installed; "
                              "use GridHPOGen/RandomHPOGen for hermetic local search.")
        return self._nni.get_next_parameter()

    def set_score(self, acc) -> None:
        if not self._has_nni:
            raise ImportError("NNIGen requires the 'nni' package.")
        self._nni.report_final_result(acc)

    def get_obj_filename(self) -> str | None:
        return self.obj_filename


class GridHPOGen(HPOGen):
    """Exhaustive grid search over a discrete search space, run locally.

    search_space: {param: [values...]}. ``run()`` trains the algo once per grid
    point (via a fresh deepcopy so trials don't share weights) and returns the
    (best_params, best_score, trials) tuple.
    """

    def __init__(self, algo: Algo | None = None, search_space: dict[str, Sequence] | None = None):
        super().__init__(algo)
        self.search_space = {k: list(v) for k, v in (search_space or {}).items()}
        self.trials: list[dict] = []
        self._proposals = None
        self._last_score: float | None = None

    def _grid(self):
        keys = list(self.search_space)
        for combo in itertools.product(*(self.search_space[k] for k in keys)):
            yield dict(zip(keys, combo))

    def get_hyperparameters(self) -> dict:
        if self._proposals is None:
            self._proposals = iter(self._grid())
        return next(self._proposals)

    def set_score(self, acc) -> None:
        self._last_score = float(acc)

    def run(self, output_folder: str | None = None) -> tuple[dict, float, list[dict]]:
        best_params, best_score = {}, -np.inf
        for params in self._grid():
            algo = deepcopy(self.algo)
            self.params = params
            self.algo, saved = algo, self.algo
            try:
                score = self.run_algo()
            finally:
                self.algo = saved
            self.trials.append({"params": params, "score": score})
            if score > best_score:
                best_params, best_score = params, score
        if output_folder:
            os.makedirs(output_folder, exist_ok=True)
            with open(os.path.join(output_folder, "hpo_trials.json"), "w") as f:
                json.dump(self.trials, f, indent=2, default=str)
        return best_params, best_score, self.trials


class RandomHPOGen(GridHPOGen):
    """Random search: sample ``n_trials`` points from the search space (each entry is
    either a list of choices or a (low, high) tuple for uniform sampling)."""

    def __init__(self, algo: Algo | None = None, search_space: dict | None = None,
                 n_trials: int = 4, seed: int = 0):
        HPOGen.__init__(self, algo)
        self.search_space = dict(search_space or {})
        self.n_trials = n_trials
        self.rng = np.random.RandomState(seed)
        self.trials = []
        self._proposals = None
        self._last_score = None

    def _grid(self):
        for _ in range(self.n_trials):
            point = {}
            for k, v in self.search_space.items():
                if isinstance(v, tuple) and len(v) == 2 and all(
                        isinstance(x, (int, float)) for x in v):
                    point[k] = float(self.rng.uniform(v[0], v[1]))
                else:
                    point[k] = v[self.rng.randint(len(v))]
            yield point


class OptunaGen(HPOGen):
    """Optuna-backed HPO (reference: hpo_gen.py:242 OptunaGen). Requires ``optuna``;
    for hermetic local search use GridHPOGen/RandomHPOGen."""

    def __init__(self, algo: Algo | None = None, params: dict | None = None):
        super().__init__(algo, params)
        self._optuna, self._has_optuna = optional_import("optuna")
        self.trial = None

    def get_hyperparameters(self) -> dict:
        if self.trial is None:
            raise RuntimeError("OptunaGen must be called by optuna: study.optimize(OptunaGen(...))")
        return dict(self.params)

    def set_score(self, acc) -> None:
        self._score = float(acc)

    def set_trial(self, trial) -> None:
        self.trial = trial

    def __call__(self, trial, obj_filename: str | None = None, output_folder: str = ".",
                 template_path=None) -> float:
        """Objective function handed to ``optuna.Study.optimize``."""
        if not self._has_optuna:
            raise ImportError("OptunaGen requires the 'optuna' package, which is not installed.")
        self.set_trial(trial)
        return self.run_algo(obj_filename, output_folder, template_path)
