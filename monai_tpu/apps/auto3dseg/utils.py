"""Auto3DSeg helpers: algo (de)serialisation and history import/export
(reference: monai/apps/auto3dseg/utils.py)."""
from __future__ import annotations

import os
import pickle

from ...utils.enums import AlgoKeys

__all__ = ["algo_to_pickle", "algo_from_pickle", "export_bundle_algo_history",
           "import_bundle_algo_history", "get_name_from_algo_id"]

_PKL_NAME = "algo_object.pkl"


def algo_to_pickle(algo, template_path: str | None = None, **algo_meta_data) -> str:
    """Persist an algo object (+ metadata) into its output folder
    (reference: utils.py algo_to_pickle)."""
    out = algo.get_output_path()
    os.makedirs(out, exist_ok=True)
    pkl_filename = os.path.join(out, _PKL_NAME)
    data = {"algo_bytes": pickle.dumps(algo), "template_path": template_path}
    data.update(algo_meta_data)
    with open(pkl_filename, "wb") as f:
        pickle.dump(data, f)
    return pkl_filename


def algo_from_pickle(pkl_filename: str, template_path: str | None = None):
    """Load an algo + its metadata dict (reference: utils.py algo_from_pickle)."""
    with open(pkl_filename, "rb") as f:
        data = pickle.load(f)
    algo = pickle.loads(data.pop("algo_bytes"))
    return algo, data


def export_bundle_algo_history(history: list[dict]) -> None:
    """Pickle every algo in a BundleGen history into its folder
    (reference: utils.py:68)."""
    for algo_dict in history:
        algo = algo_dict[AlgoKeys.ALGO]
        score = algo_dict.get(AlgoKeys.SCORE)
        meta = {} if score is None else {AlgoKeys.SCORE: score}
        algo_to_pickle(algo, template_path=getattr(algo, "template_path", None), **meta)


def import_bundle_algo_history(output_folder: str = ".", template_path: str | None = None,
                               only_trained: bool = True) -> list:
    """Rebuild the algo-dict history from pickles under ``output_folder``
    (reference: utils.py import_bundle_algo_history)."""
    history = []
    for name in sorted(os.listdir(output_folder)):
        write_path = os.path.join(output_folder, name)
        if not os.path.isdir(write_path):
            continue
        pkl = os.path.join(write_path, _PKL_NAME)
        if not os.path.isfile(pkl):
            continue
        algo, meta = algo_from_pickle(pkl, template_path=template_path)
        best_metric = meta.get(AlgoKeys.SCORE)
        if best_metric is None:
            try:
                best_metric = algo.get_score()
            except BaseException:
                pass
        is_trained = best_metric is not None
        if is_trained or not only_trained:
            history.append({AlgoKeys.ID: name, AlgoKeys.ALGO: algo,
                            AlgoKeys.SCORE: best_metric, AlgoKeys.IS_TRAINED: is_trained})
    return history


def get_name_from_algo_id(id: str) -> str:
    """'algoname_fold' -> 'algoname' (reference: utils.py:80)."""
    return id.split("_")[0]
