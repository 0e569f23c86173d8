"""Config items: dict nodes that instantiate Python objects / evaluate expressions.

Parity targets (DSL semantics only): monai/bundle/config_item.py (ConfigItem:117,
ConfigComponent:164, ConfigExpression:295) — `_target_`/`_args_`/`_disabled_`/
`_requires_`/`_mode_` component dicts, `$expr` Python expressions.

Own implementation: the component locator builds its symbol table in one
comprehension-driven sweep; import-expressions are parsed by a standalone
``_as_import_node`` helper shared by detection and evaluation.
"""
from __future__ import annotations

import ast
import warnings
from abc import ABC, abstractmethod
from collections.abc import Mapping, Sequence
from typing import Any

from ..utils.enums import CompInitMode
from ..utils.misc import ensure_tuple
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
    """Map class/function names to the monai_tpu modules that define them, so a bare
    `_target_: "UNet"` resolves to its full dotted path (reference: config_item.py:56)."""

    MOD_START = "monai_tpu"

    def __init__(self, excludes: Sequence[str] | str | None = None):
        self.excludes = [] if excludes is None else ensure_tuple(excludes)
        self._table: dict[str, list[str]] | None = None

    def _scan(self) -> dict[str, list[str]]:
        import importlib
        import inspect
        import pkgutil

        root = importlib.import_module(self.MOD_START)
        table: dict[str, list[str]] = {}
        for info in pkgutil.walk_packages(root.__path__, prefix=root.__name__ + "."):
            modname = info.name
            if any(ex in modname for ex in self.excludes):
                continue
            try:
                module = importlib.import_module(modname)
            except Exception:
                continue
            symbols = (name for name, obj in inspect.getmembers(module)
                       if (inspect.isclass(obj) or inspect.isfunction(obj))
                       and getattr(obj, "__module__", "") == modname)
            for name in symbols:
                homes = table.setdefault(name, [])
                if modname not in homes:
                    homes.append(modname)
        return table

    def get_component_module_name(self, name: str) -> list[str] | str | None:
        if not isinstance(name, str):
            raise ValueError(f"`name` must be a valid string, but got: {name}.")
        if self._table is None:
            self._table = self._scan()
        homes = self._table.get(name)
        if homes is not None and len(homes) == 1:
            return homes[0]
        return homes


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
        self.locator = locator if locator is not None else ComponentLocator(excludes=excludes)

    @staticmethod
    def is_instantiable(config: Any) -> bool:
        return isinstance(config, Mapping) and "_target_" in config

    def resolve_module_name(self):
        """Expand a bare class/function name into its full dotted path; dotted paths
        and non-string targets pass through unchanged."""
        target = self.get_config().get("_target_")
        if not isinstance(target, str):
            return target
        homes = self.locator.get_component_module_name(target)
        if homes is None:
            return target  # already a full dotted path (or unknown: instantiate errors)
        if isinstance(homes, list):
            warnings.warn(
                f"there are more than 1 component have name `{target}`: {homes}, use the first one `{homes[0]}`."
                f" if want to use others, please set its full module path in `_target_` directly.")
            homes = homes[0]
        return f"{homes}.{target}"

    def resolve_args(self) -> dict:
        return {k: v for k, v in self.get_config().items() if k not in self.non_arg_keys}

    def is_disabled(self) -> bool:
        flag = self.get_config().get("_disabled_", False)
        if isinstance(flag, str):
            return flag.strip().lower() == "true"
        return bool(flag)

    def instantiate(self, **kwargs):
        if not self.is_instantiable(self.get_config()) or self.is_disabled():
            return None
        call_args = self.resolve_args() | kwargs
        mode = self.get_config().get("_mode_", CompInitMode.DEFAULT)
        return instantiate(self.resolve_module_name(), mode, **call_args)


def _as_import_node(code: str) -> ast.Import | ast.ImportFrom | None:
    """Parse ``code``; return its first statement if it is an import, else None."""
    try:
        body = ast.parse(code).body
    except SyntaxError:
        return None
    if body and isinstance(body[0], (ast.Import, ast.ImportFrom)):
        return body[0]
    return None


class ConfigExpression(ConfigItem):
    """`$expression` evaluation (reference: config_item.py:295)."""

    prefix = "$"
    run_eval = True

    def __init__(self, config: Any, id: str = "", globals: dict | None = None):
        super().__init__(config=config, id=id)
        self.globals = globals if globals is not None else {}

    def _import_into_globals(self, code: str):
        """If ``code`` is `import x [as y]` / `from m import x [as y]`, perform the
        import, bind it into self.globals, and return the module/attr; else None."""
        node = _as_import_node(code)
        if node is None or not node.names:
            return None
        if len(node.names) > 1:
            warnings.warn(f"ignoring multiple import alias '{code}'.")
        alias = node.names[0]
        bound_name = alias.asname or alias.name
        if isinstance(node, ast.ImportFrom):
            value, _ = optional_import(f"{node.module}", name=alias.name)
        else:
            value, _ = optional_import(alias.name)
        self.globals[bound_name] = value
        return value

    def evaluate(self, globals: dict | None = None, locals: dict | None = None):
        value = self.get_config()
        if not self.is_expression(value):
            return None
        code = value[len(self.prefix):]
        imported = self._import_into_globals(code)
        if imported is not None:
            return imported
        if not self.run_eval:
            return code
        scope = dict(self.globals)
        for k, v in (globals or {}).items():
            if k in scope:
                warnings.warn(f"the new global variable `{k}` conflicts with `self.globals`, override it.")
            scope[k] = v
        return eval(code, scope, locals)

    @classmethod
    def is_expression(cls, config: Any) -> bool:
        return isinstance(config, str) and config.startswith(cls.prefix)

    @classmethod
    def is_import_statement(cls, config: Any) -> bool:
        if not cls.is_expression(config) or "import" not in config:
            return False
        return _as_import_node(config[len(cls.prefix):]) is not None
