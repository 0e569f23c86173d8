"""Auto3DSeg engine utilities (reference: monai/auto3dseg/utils.py:50-401)."""
from __future__ import annotations

import os
import pickle
import sys
from copy import deepcopy
from typing import Any

import numpy as np

from ..bundle.config_parser import ConfigParser
from ..bundle.utils import ID_SEP_KEY
from ..utils.backend import to_numpy

__all__ = [
    "get_foreground_image", "get_foreground_label", "get_label_ccp",
    "concat_val_to_np", "concat_multikeys_to_dict", "datafold_read",
    "verify_report_format", "algo_to_pickle", "algo_from_pickle",
    "list_to_python_fire_arg_str", "check_and_set_optional_args",
]


def get_foreground_image(image) -> np.ndarray:
    """Crop away the all-zero border of an image (reference:
    auto3dseg/utils.py:50)."""
    from ..transforms.croppad_array import CropForeground

    cropper = CropForeground(select_fn=lambda x: x > 0, allow_smaller=True)
    return cropper(image)


def get_foreground_label(image, label):
    """1-D array of image values where label > 0 (reference:
    auto3dseg/utils.py:70)."""
    img = to_numpy(getattr(image, "data", image))
    lab = to_numpy(getattr(label, "data", label))
    return img[lab > 0]


def get_label_ccp(mask_index, use_gpu: bool = True) -> tuple[list, int]:
    """Connected components of a binary mask and their bounding shapes
    (reference: auto3dseg/utils.py:86). On TPU hosts the scipy labeling runs on
    CPU; ``use_gpu`` is accepted for signature parity."""
    from scipy import ndimage as ndi

    arr = to_numpy(getattr(mask_index, "data", mask_index))
    arr = np.asarray(arr)
    # reference uses skimage background=-1 semantics: every value (including 0)
    # forms components; a binary mask has the same result as labeling arr > 0
    # plus labeling arr == 0 — stats are only consumed for the foreground, so
    # label foreground components here.
    labeled, ncomponents = ndi.label(arr > 0)
    shape_list = []
    for ncomp in range(1, ncomponents + 1):
        comp_idx = np.argwhere(labeled == ncomp)
        comp_idx_min = np.min(comp_idx, axis=0).tolist()
        comp_idx_max = np.max(comp_idx, axis=0).tolist()
        shape_list.append([comp_idx_max[i] - comp_idx_min[i] + 1
                           for i in range(len(comp_idx_max))])
    return shape_list, ncomponents


def concat_val_to_np(data_list: list, fixed_keys: list, ragged: bool | None = False,
                     allow_missing: bool | None = False, **kwargs: Any) -> np.ndarray:
    """Gather a nested value from each dict in ``data_list`` by key path and
    concatenate (reference: auto3dseg/utils.py:129)."""
    np_list: list = []
    for data in data_list:
        parser = ConfigParser(data)
        path = ID_SEP_KEY.join(str(k) for k in fixed_keys)
        val = parser.get(path)
        if val is None:
            if allow_missing:
                np_list.append(None)
            else:
                raise AttributeError(f"{fixed_keys} is not nested in the dictionary")
        elif isinstance(val, (list, tuple)):
            np_list.append(np.array(val))
        elif isinstance(val, np.ndarray):
            np_list.append(val)
        elif hasattr(val, "shape"):  # jax array / MetaImage
            np_list.append(np.asarray(to_numpy(getattr(val, "data", val))))
        elif isinstance(val, (int, float)):
            np_list.append(np.array(val))
        else:
            raise NotImplementedError(f"{val.__class__} concat is not supported.")
    if allow_missing:
        np_list = [x for x in np_list if x is not None]
    if len(np_list) == 0:
        return np.array([0])
    if ragged:
        return np.concatenate(np_list, **kwargs)
    return np.concatenate([np_list], **kwargs)


def concat_multikeys_to_dict(data_list: list, fixed_keys: list, keys: list,
                             zero_insert: bool = True, **kwargs: Any) -> dict:
    """``concat_val_to_np`` over multiple leaf keys -> dict (reference:
    auto3dseg/utils.py:186)."""
    ret_dict = {}
    for key in keys:
        addon = [0, key] if zero_insert else [key]
        ret_dict[key] = concat_val_to_np(data_list, list(fixed_keys) + addon, **kwargs)
    return ret_dict


def datafold_read(datalist, basedir: str, fold: int = 0, key: str = "training") -> tuple[list, list]:
    """Split a decathlon-style datalist into (train, val) by fold index
    (reference: auto3dseg/utils.py:213)."""
    if isinstance(datalist, str):
        json_data = ConfigParser.load_config_file(datalist)
    else:
        json_data = datalist
    dict_data = deepcopy(json_data[key])
    for d in dict_data:
        for k in d:
            if isinstance(d[k], list):
                d[k] = [os.path.join(basedir, iv) for iv in d[k]]
            elif isinstance(d[k], str):
                d[k] = os.path.join(basedir, d[k]) if len(d[k]) > 0 else d[k]
    tr, val = [], []
    for d in dict_data:
        if "fold" in d and d["fold"] == fold:
            val.append(d)
        else:
            tr.append(d)
    return tr, val


def verify_report_format(report: dict, report_format: dict) -> bool:
    """Whether ``report`` structurally matches a keys-only ``report_format``
    (reference: auto3dseg/utils.py:252)."""
    for k_fmt, v_fmt in report_format.items():
        if k_fmt not in report:
            return False
        v = report[k_fmt]
        if isinstance(v_fmt, list) and isinstance(v, list):
            if len(v_fmt) != 1:
                raise UserWarning("list length in report_format is not 1")
            if len(v_fmt) > 0 and len(v) > 0:
                return verify_report_format(v[0], v_fmt[0])
            return False
    return True


def algo_to_pickle(algo, template_path=None, **algo_meta_data: Any) -> str:
    """Pickle an Algo object into its output path (reference:
    auto3dseg/utils.py:277)."""
    data = {"algo_bytes": pickle.dumps(algo), "template_path": str(template_path)}
    pkl_filename = os.path.join(algo.get_output_path(), "algo_object.pkl")
    data.update(algo_meta_data)
    with open(pkl_filename, "wb") as f_pi:
        f_pi.write(pickle.dumps(data))
    return pkl_filename


def algo_from_pickle(pkl_filename: str, template_path=None, **kwargs: Any):
    """Unpickle an Algo object, retrying with candidate template paths on
    sys.path (reference: auto3dseg/utils.py:300). Returns (algo, meta_dict)."""
    with open(pkl_filename, "rb") as f_pi:
        data = pickle.loads(f_pi.read())
    if not isinstance(data, dict):
        raise ValueError(f"the data object is {data.__class__}. Dict is expected.")
    if "algo_bytes" not in data:
        raise ValueError(f"key [algo_bytes] not found in {data}. Unable to instantiate.")
    algo_bytes = data.pop("algo_bytes")
    algo_template_path = data.pop("template_path", None)
    candidates: list[str] = []
    for tp in (template_path, algo_template_path):
        if tp is not None and os.path.isdir(str(tp)):
            candidates.append(os.path.abspath(str(tp)))
            candidates.append(os.path.abspath(os.path.join(str(tp), "..")))
    candidates.append(os.path.abspath(os.path.join(os.path.dirname(pkl_filename), "..")))
    last_exc: Exception | None = None
    try:
        algo = pickle.loads(algo_bytes)
    except ModuleNotFoundError as e:
        last_exc = e
        algo = None
        for cand in candidates:
            if cand not in sys.path:
                sys.path.insert(0, cand)
            try:
                algo = pickle.loads(algo_bytes)
                break
            except ModuleNotFoundError as e2:
                last_exc = e2
        if algo is None:
            raise ModuleNotFoundError(
                f"Unable to instantiate the Algo from {pkl_filename}; tried template "
                f"paths {candidates}.") from last_exc
    if hasattr(algo, "template_path") and algo_template_path:
        algo.template_path = algo_template_path
    return algo, data


def list_to_python_fire_arg_str(args: list) -> str:
    """Render a list as one quoted python-fire CLI argument (reference:
    auto3dseg/utils.py:378)."""
    args_str = ",".join(str(arg) for arg in args)
    return f"'{args_str}'"


def check_and_set_optional_args(params: dict) -> str:
    """dict -> ' --k=v ...' CLI suffix (reference: auto3dseg/utils.py:392)."""
    cmd_mod_opt = ""
    for k, v in params.items():
        if isinstance(v, dict):
            raise ValueError("Nested dict is not supported.")
        if isinstance(v, list):
            v = list_to_python_fire_arg_str(v)
        cmd_mod_opt += f" --{k}={v}"
    return cmd_mod_opt
