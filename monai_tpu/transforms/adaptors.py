"""Adapters that let plain functions participate in dict-based Compose pipelines
(reference: monai/transforms/adaptors.py:131 adaptor, :215 apply_alias, :235 to_kwargs).

``adaptor(fn, outputs, inputs)`` wraps ``fn(a, b, ...) -> value(s)`` into a
callable ``dict -> dict``: arguments are pulled from the data dict by name (or
via the ``inputs`` remapping), and return values are written back under the
``outputs`` key(s).
"""
from __future__ import annotations

import inspect
from collections.abc import Callable

__all__ = ["adaptor", "apply_alias", "to_kwargs", "FunctionSignature"]


class FunctionSignature:
    """Introspects a callable's parameters (reference: adaptors.py:243)."""

    def __init__(self, function: Callable) -> None:
        self.found_args = False
        self.found_kwargs = False
        self.defaults: dict = {}
        self.non_var_parameters: set = set()
        for p in inspect.signature(function).parameters.values():
            if p.kind is inspect.Parameter.VAR_POSITIONAL:
                self.found_args = True
            elif p.kind is inspect.Parameter.VAR_KEYWORD:
                self.found_kwargs = True
            else:
                self.non_var_parameters.add(p.name)
                self.defaults[p.name] = p.default is not p.empty

    def __repr__(self):
        return (f"FunctionSignature(found_args={self.found_args}, "
                f"found_kwargs={self.found_kwargs}, params={sorted(self.non_var_parameters)})")


def _check_type(name, value, types, allow_none=False):
    if value is None and allow_none:
        return
    if not isinstance(value, types):
        opt = "None or one of " if allow_none else "one of "
        raise TypeError(f"'{name}' must be {opt}{types} but is {type(value)}")


def adaptor(function: Callable, outputs, inputs=None) -> Callable:
    """Wrap ``function`` for use inside a dict Compose (reference: adaptors.py:131)."""

    sig = FunctionSignature(function)

    def _select_inputs(ditems: dict) -> dict:
        if sig.found_kwargs:
            _check_type("inputs", inputs, (dict,), allow_none=True)
            if inputs is None:
                return dict(ditems)
            # rename selected keys, pass the rest through unchanged
            return {inputs.get(k, k): v for k, v in ditems.items()}
        _check_type("inputs", inputs, (str, list, tuple, dict), allow_none=True)
        if inputs is None:
            return {k: v for k, v in ditems.items() if k in sig.non_var_parameters}
        if isinstance(inputs, str):
            if len(sig.non_var_parameters) != 1:
                raise ValueError("string 'inputs' requires a single-parameter function.")
            return {inputs: ditems[inputs]}
        if isinstance(inputs, (list, tuple)):
            return {k: ditems[k] for k in inputs}
        return {v: ditems[k] for k, v in inputs.items()}  # dict: data-key -> param-name

    def _place_outputs(ret) -> dict:
        op = outputs
        if isinstance(ret, dict):
            _check_type("outputs", op, (dict,), allow_none=True)
            return ret if op is None else {v: ret[k] for k, v in op.items()}
        if isinstance(ret, (list, tuple)):
            _check_type("outputs", op, (str, list, tuple))
            names = [op] if isinstance(op, str) else list(op)
            if len(ret) != len(names):
                raise ValueError("'outputs' length must match the number of returned values.")
            return dict(zip(names, ret))
        _check_type("outputs", op, (str, list, tuple))
        if isinstance(op, (list, tuple)):
            if len(op) != 1:
                raise ValueError("'outputs' must name exactly one key for a single return value.")
            op = op[0]
        return {op: ret}

    def _inner(ditems: dict) -> dict:
        ret = function(**_select_inputs(ditems))
        result = dict(ditems)
        result.update(_place_outputs(ret))
        return result

    return _inner


def apply_alias(fn: Callable, name_map: dict) -> Callable:
    """Run a dict-callable under temporarily renamed keys (reference: adaptors.py:215)."""

    def _inner(data: dict) -> dict:
        renamed = dict(data)
        for src, dst in name_map.items():
            renamed[dst] = renamed.pop(src)
        out = fn(renamed)
        for src, dst in name_map.items():
            out[src] = out.pop(dst)
        return out

    return _inner


def to_kwargs(fn: Callable) -> Callable:
    """Expand the data dict to keyword arguments (reference: adaptors.py:235)."""

    def _inner(data: dict):
        return fn(**data)

    return _inner
