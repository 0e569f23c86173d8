"""Config items: dict nodes that instantiate Python objects / evaluate expressions.

Parity targets: monai/bundle/config_item.py (ConfigItem:117, ConfigComponent:164,
ConfigExpression:295) — `_target_`/`_args_`/`_disabled_`/`_requires_`/`_mode_` component
dicts, `$expr` Python expressions.
"""
from __future__ import annotations

import ast
import sys
import warnings
from abc import ABC, abstractmethod
from collections.abc import Mapping, Sequence
from importlib import import_module
from typing import Any

from ..utils.enums import CompInitMode
from ..utils.misc import ensure_tuple, first
from ..utils.module import instantiate, optional_import

__all__ = ["ComponentLocator", "ConfigItem", "ConfigComponent", "ConfigExpression", "Instantiable"]


class Instantiable(ABC):
    """Base for instantiable config components (reference: config_item.py:33)."""

    @abstractmethod
    def is_disabled(self, *args, **kwargs) -> bool:
        raise NotImplementedError

    @abstractmethod
    def instantiate(self, *args, **kwargs):
        raise NotImplementedError


class ComponentLocator:
    """Map class/function names to module paths within monai_tpu
    (reference: config_item.py:56)."""

    MOD_START = "monai_tpu"

    def __init__(self, excludes: Sequence[str] | str | None = None):
        self.excludes = [] if excludes is None else ensure_tuple(excludes)
        self._components_table: dict[str, list[str]] | None = None

    def _find_classes_or_functions(self) -> dict[str, list[str]]:
        import importlib
        import inspect
        import pkgutil

        table: dict[str, list[str]] = {}
        pkg = importlib.import_module(self.MOD_START)
        for _importer, modname, _is_pkg in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
            if any(ex in modname for ex in self.excludes):
                continue
            try:
                mod = importlib.import_module(modname)
            except Exception:
                continue
            for name, obj in inspect.getmembers(mod):
                if (inspect.isclass(obj) or inspect.isfunction(obj)) and getattr(obj, "__module__", "") == modname:
                    table.setdefault(name, [])
                    if modname not in table[name]:
                        table[name].append(modname)
        return table

    def get_component_module_name(self, name: str) -> list[str] | str | None:
        if not isinstance(name, str):
            raise ValueError(f"`name` must be a valid string, but got: {name}.")
        if self._components_table is None:
            self._components_table = self._find_classes_or_functions()
        mods = self._components_table.get(name)
        if isinstance(mods, list) and len(mods) == 1:
            return mods[0]
        return mods


class ConfigItem:
    """A config node (reference: config_item.py:117)."""

    def __init__(self, config: Any, id: str = ""):
        self.config = config
        self.id = id

    def get_id(self) -> str:
        return self.id

    def update_config(self, config: Any) -> None:
        self.config = config

    def get_config(self):
        return self.config

    def __repr__(self) -> str:
        return f"{type(self).__name__}: \n{repr(self.config)}"


class ConfigComponent(ConfigItem, Instantiable):
    """`_target_` dict → Python object (reference: config_item.py:164)."""

    non_arg_keys = {"_target_", "_disabled_", "_requires_", "_desc_", "_mode_"}

    def __init__(self, config: Any, id: str = "", locator: ComponentLocator | None = None,
                 excludes: Sequence[str] | str | None = None):
        super().__init__(config=config, id=id)
        self.locator = ComponentLocator(excludes=excludes) if locator is None else locator

    @staticmethod
    def is_instantiable(config: Any) -> bool:
        return isinstance(config, Mapping) and "_target_" in config

    def resolve_module_name(self):
        config = dict(self.get_config())
        target = config.get("_target_")
        if not isinstance(target, str):
            return target
        module = self.locator.get_component_module_name(target)
        if module is None:
            return target  # full dotted path expected
        if isinstance(module, list):
            warnings.warn(
                f"there are more than 1 component have name `{target}`: {module}, use the first one `{module[0]}`."
                f" if want to use others, please set its full module path in `_target_` directly.")
            module = module[0]
        return f"{module}.{target}"

    def resolve_args(self) -> dict:
        return {k: v for k, v in self.get_config().items() if k not in self.non_arg_keys}

    def is_disabled(self) -> bool:
        _is_disabled = self.get_config().get("_disabled_", False)
        return _is_disabled.lower().strip() == "true" if isinstance(_is_disabled, str) else bool(_is_disabled)

    def instantiate(self, **kwargs):
        if not self.is_instantiable(self.get_config()) or self.is_disabled():
            return None
        modname = self.resolve_module_name()
        mode = self.get_config().get("_mode_", CompInitMode.DEFAULT)
        args = self.resolve_args()
        args.update(kwargs)
        return instantiate(modname, mode, **args)


class ConfigExpression(ConfigItem):
    """`$expression` evaluation (reference: config_item.py:295)."""

    prefix = "$"
    run_eval = True

    def __init__(self, config: Any, id: str = "", globals: dict | None = None):
        super().__init__(config=config, id=id)
        self.globals = globals if globals is not None else {}

    def _parse_import_string(self, import_string: str):
        node = first(ast.iter_child_nodes(ast.parse(import_string)))
        if not isinstance(node, (ast.Import, ast.ImportFrom)):
            return None
        if len(node.names) < 1:
            return None
        if len(node.names) > 1:
            warnings.warn(f"ignoring multiple import alias '{import_string}'.")
        name, asname = f"{node.names[0].name}", node.names[0].asname
        asname = name if asname is None else f"{asname}"
        if isinstance(node, ast.ImportFrom):
            self.globals[asname], _ = optional_import(f"{node.module}", name=f"{name}")
            return self.globals[asname]
        if isinstance(node, ast.Import):
            self.globals[asname], _ = optional_import(f"{name}")
            return self.globals[asname]
        return None

    def evaluate(self, globals: dict | None = None, locals: dict | None = None):
        value = self.get_config()
        if not ConfigExpression.is_expression(value):
            return None
        optional_module = self._parse_import_string(value[len(self.prefix):])
        if optional_module is not None:
            return optional_module
        if not self.run_eval:
            return f"{value[len(self.prefix):]}"
        globals_ = dict(self.globals)
        if globals is not None:
            for k, v in globals.items():
                if k in globals_:
                    warnings.warn(f"the new global variable `{k}` conflicts with `self.globals`, override it.")
                globals_[k] = v
        return eval(value[len(self.prefix):], globals_, locals)

    @classmethod
    def is_expression(cls, config: Any) -> bool:
        return isinstance(config, str) and config.startswith(cls.prefix)

    @classmethod
    def is_import_statement(cls, config: Any) -> bool:
        if not cls.is_expression(config):
            return False
        if "import" not in config:
            return False
        try:
            return isinstance(first(ast.iter_child_nodes(ast.parse(f"{config[len(cls.prefix):]}"))),
                              (ast.Import, ast.ImportFrom))
        except SyntaxError:
            return False
