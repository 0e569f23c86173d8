"""Bundle workflows: config-driven train/infer lifecycle.

Parity targets: monai/bundle/workflows.py (BundleWorkflow:37, ConfigWorkflow:361,
PythonicWorkflow:243) + properties.py required-property tables.
"""
from __future__ import annotations

import os
import time
import warnings
from abc import ABC, abstractmethod
from collections.abc import Sequence
from pathlib import Path
from typing import Any

from ..utils.misc import ensure_tuple
from .config_parser import ConfigParser
from .properties import InferProperties, MetaProperties, TrainProperties

__all__ = ["BundleWorkflow", "ConfigWorkflow"]


class BundleWorkflow(ABC):
    """initialize/run/finalize lifecycle + required properties
    (reference: workflows.py:37)."""

    supported_train_type: tuple = ("train", "training")
    supported_infer_type: tuple = ("infer", "inference", "eval", "evaluation")

    def __init__(self, workflow_type: str | None = None, workflow: str | None = None,
                 properties_path: str | None = None, meta_file: str | None = None,
                 logging_file: str | None = None):
        workflow_type = workflow if workflow is not None else workflow_type
        if workflow_type is not None:
            if workflow_type.lower() in self.supported_train_type:
                self.properties = dict(TrainProperties)
                self.properties.update(MetaProperties)
                self.workflow_type = "train"
            elif workflow_type.lower() in self.supported_infer_type:
                self.properties = dict(InferProperties)
                self.properties.update(MetaProperties)
                self.workflow_type = "infer"
            else:
                raise ValueError(f"Unsupported workflow type: '{workflow_type}'.")
        else:
            self.properties = dict(MetaProperties)
            self.workflow_type = None
        self.meta_file = meta_file

    @abstractmethod
    def initialize(self, *args, **kwargs):
        raise NotImplementedError

    @abstractmethod
    def run(self, *args, **kwargs):
        raise NotImplementedError

    @abstractmethod
    def finalize(self, *args, **kwargs):
        raise NotImplementedError

    @abstractmethod
    def _get_property(self, name: str, property: dict):
        raise NotImplementedError

    def __getattr__(self, name):
        if name != "properties" and "properties" in self.__dict__ and name in self.properties:
            return self._get_property(name=name, property=self.properties[name])
        raise AttributeError(f"{self.__class__.__name__} object has no attribute {name}")

    def __setattr__(self, name, value):
        if name != "properties" and "properties" in self.__dict__ and name in self.properties:
            self._set_property(name=name, property=self.properties[name], value=value)
        else:
            super().__setattr__(name, value)

    def _set_property(self, name: str, property: dict, value: Any):
        raise NotImplementedError

    def add_property(self, name: str, required: bool, desc: str | None = None) -> None:
        if name in self.properties:
            warnings.warn(f"property '{name}' already exists, overriding it.")
        self.properties[name] = {"description": desc, "required": required}

    def check_properties(self) -> list[str] | None:
        """Return names of missing required properties (reference: workflows.py:—)."""
        if self.properties is None:
            return None
        return [n for n, p in self.properties.items()
                if p.get("required", False) and not hasattr(self, n)]


class ConfigWorkflow(BundleWorkflow):
    """Config-file-driven workflow (reference: workflows.py:361)."""

    def __init__(self, config_file: str | Sequence[str], meta_file: str | Sequence[str] | None = None,
                 logging_file: str | None = None, init_id: str = "initialize", run_id: str = "run",
                 final_id: str = "finalize", tracking: str | dict | None = None,
                 workflow_type: str | None = "train", properties_path: str | None = None,
                 **override: Any):
        super().__init__(workflow_type=workflow_type, properties_path=properties_path,
                         meta_file=meta_file)
        self.config_root_path = Path(ensure_tuple(config_file)[0]).parent
        self.parser = ConfigParser()
        self.parser.read_config(f=config_file)
        if meta_file is not None and (not isinstance(meta_file, str) or os.path.exists(meta_file)):
            self.parser.read_meta(f=meta_file)
        self.parser.update(pairs=override)
        self.init_id = init_id
        self.run_id = run_id
        self.final_id = final_id

    def initialize(self) -> Any:
        self.parser.parse(reset=True)
        return self._run_expr(id=self.init_id)

    def run(self) -> Any:
        if self.run_id not in self.parser:
            raise ValueError(f"run ID '{self.run_id}' doesn't exist in the config file.")
        return self._run_expr(id=self.run_id)

    def finalize(self) -> Any:
        return self._run_expr(id=self.final_id)

    def _run_expr(self, id: str, **kwargs) -> list:
        ret = []
        if id in self.parser:
            # the ID may be a list of expressions to run in order
            if isinstance(self.parser[id], list):
                for i in range(len(self.parser[id])):
                    ret.append(self.parser.get_parsed_content(f"{id}{self.parser.ref_resolver.sep}{i}", **kwargs))
            else:
                ret.append(self.parser.get_parsed_content(id, **kwargs))
        return ret

    def _get_prop_id(self, name: str, property: dict):
        prop_id = property.get("id", name)
        if prop_id not in self.parser:
            if not property.get("required", False):
                return None
            raise KeyError(f"Property '{name}' with config ID '{prop_id}' not in the config.")
        return prop_id

    def _get_property(self, name: str, property: dict):
        if not self.parser.ref_resolver.is_resolved():
            raise RuntimeError("Please execute 'initialize' before getting any parsed content.")
        prop_id = self._get_prop_id(name, property)
        return self.parser.get_parsed_content(id=prop_id) if prop_id is not None else None

    def _set_property(self, name: str, property: dict, value: Any) -> None:
        prop_id = property.get("id", name)
        self.parser[prop_id] = value
        self.parser.ref_resolver.reset()

    def check_properties(self) -> list[str] | None:
        ret = [n for n, p in (self.properties or {}).items()
               if p.get("required", False) and self._get_prop_id(n, {**p, "required": False}) is None]
        return ret


class PythonicWorkflow(BundleWorkflow):
    """Bundle workflow defined in python code: properties are resolved from (1) values
    set by the user, (2) cached computations of ``_get_<name>`` getter methods, (3) the
    parsed config/meta files (reference: bundle/workflows.py:243)."""

    supported_train_type = ("train", "training")
    supported_infer_type = ("infer", "inference", "eval", "evaluation")

    def __init__(self, workflow_type: str | None = None, workflow: str | None = None,
                 properties_path=None, config_file=None, meta_file=None,
                 logging_file=None, **override):
        workflow_type = workflow or workflow_type
        super().__init__(workflow_type=workflow_type, properties_path=properties_path)
        self._props_vals: dict = {}
        self._set_props_vals: dict = {}
        from .config_parser import ConfigParser

        self.parser = ConfigParser()
        if config_file is not None:
            self.parser.read_config(f=config_file)
        if meta_file is not None:
            self.parser.read_meta(f=meta_file)
        self.parser.update(pairs=override)
        self._is_initialized: bool = False

    def initialize(self, *args, **kwargs):
        self._props_vals = {}
        self._is_initialized = True

    def _get_property(self, name: str, property: dict):
        if not self._is_initialized:
            raise RuntimeError("initialize the workflow before getting any properties.")
        if name in self._set_props_vals:
            return self._set_props_vals[name]
        if name in self._props_vals:
            return self._props_vals[name]
        getter = getattr(self, f"get_{name}", None)
        if callable(getter):
            value = getter()
            self._props_vals[name] = value
            return value
        try:
            return self.parser.get_parsed_content(name)
        except Exception as e:
            if property.get("required", False):
                raise KeyError(f"required property {name} is not resolvable") from e
            return None

    def _set_property(self, name: str, property: dict, value):
        self._set_props_vals[name] = value

    def run(self, *args, **kwargs):
        raise NotImplementedError("subclass a PythonicWorkflow and implement run().")

    def finalize(self, *args, **kwargs):
        pass
