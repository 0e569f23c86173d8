"""Sliding-window prediction over dict-output detection networks (reference:
monai/apps/detection/utils/predict_utils.py:20-140)."""
from __future__ import annotations

import numpy as np

__all__ = ["ensure_dict_value_to_list_", "check_dict_values_same_length", "predict_with_inferer"]


def _is_array(x) -> bool:
    return hasattr(x, "shape") and hasattr(x, "dtype")


def ensure_dict_value_to_list_(head_outputs: dict, keys: list | None = None) -> None:
    """In place: Dict[str, Tensor] -> Dict[str, List[Tensor]] (reference:
    predict_utils.py:20)."""
    if keys is None:
        keys = list(head_outputs.keys())
    for k in keys:
        value_k = head_outputs[k]
        if _is_array(value_k):
            head_outputs[k] = [value_k]
        elif isinstance(value_k, (list, tuple)) and _is_array(value_k[0]):
            head_outputs[k] = list(value_k)
        else:
            raise ValueError("The output of network should be Dict[str, List[Tensor]] "
                             "or Dict[str, Tensor].")


def check_dict_values_same_length(head_outputs: dict, keys: list | None = None) -> None:
    """Raise if the per-key lists differ in length (reference:
    predict_utils.py:44)."""
    if keys is None:
        keys = list(head_outputs.keys())
    lengths = [len(head_outputs[k]) for k in keys]
    if len(set(lengths)) != 1:
        raise ValueError(f"The values in the input dict should have the same length, got {lengths}.")


def _network_sequence_output(images, network, keys: list | None = None) -> list:
    """Flatten a network's dict output into one list of tensors (reference:
    predict_utils.py:93)."""
    head_outputs = network(images)
    if isinstance(head_outputs, (tuple, list)):
        return list(head_outputs)
    ensure_dict_value_to_list_(head_outputs, keys)
    if keys is None:
        keys = list(head_outputs.keys())
    check_dict_values_same_length(head_outputs, keys)
    out = []
    for k in keys:
        out += list(head_outputs[k])
    return out


def predict_with_inferer(images, network, keys: list, inferer=None) -> dict:
    """Run a dict-output network under a SlidingWindowInferer and re-group the
    stitched outputs by key (reference: predict_utils.py:92)."""
    if inferer is None:
        raise ValueError("Please set inferer as a monai_tpu.inferers.SlidingWindowInferer(...)")
    head_outputs_sequence = inferer(images, _network_sequence_output, network, keys=keys)
    num_output_levels = len(head_outputs_sequence) // len(keys)
    head_outputs = {}
    for i, k in enumerate(keys):
        head_outputs[k] = list(head_outputs_sequence[num_output_levels * i:num_output_levels * (i + 1)])
    return head_outputs
