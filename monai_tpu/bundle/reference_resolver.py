"""Dependency-ordered lazy resolution of config references.

Parity target (DSL semantics only): monai/bundle/reference_resolver.py:26 — `@id`
references resolved recursively with cycle detection; `$` expressions see resolved
refs through a local-variables dict; nested `_target_` components resolve bottom-up.

Own implementation: dependency discovery is a single tree walk (`_dependencies`),
substitution a second walk (`_substitute`), and resolution a recursive driver with
an explicit `in_progress` set for cycle detection. Import-statement expressions
(`$import x`) are hoisted once per resolver, not re-scanned per item.
"""
from __future__ import annotations

import re
import warnings
from collections.abc import Sequence
from typing import Any

from .config_item import ConfigComponent, ConfigExpression, ConfigItem

__all__ = ["ReferenceResolver"]


class ReferenceResolver:
    """Resolve `@`-references between ConfigItems (reference: reference_resolver.py:26)."""

    _vars = "__local_refs"
    sep = "::"
    ref = "@"
    id_matcher = re.compile(rf"{ref}(?:\w*)(?:{sep}\w*)*")
    allow_missing_reference = False

    def __init__(self, items: Sequence[ConfigItem] | None = None):
        self.items: dict[str, ConfigItem] = {} if items is None else {i.get_id(): i for i in items}
        self.resolved_content: dict[str, Any] = {}
        self._imports_done = False

    def reset(self):
        self.items = {}
        self.resolved_content = {}
        self._imports_done = False

    def is_resolved(self) -> bool:
        return bool(self.resolved_content)

    def add_item(self, item: ConfigItem) -> None:
        self.items.setdefault(item.get_id(), item)

    def get_item(self, id: str, resolve: bool = False, **kwargs):
        id = self.normalize_id(id)
        if resolve and id not in self.resolved_content:
            self._resolve(id, set(), **kwargs)
        return self.items.get(id)

    def get_resolved_content(self, id: str, **kwargs):
        return self._resolve(self.normalize_id(id), set(), **kwargs)

    # -- id utilities -----------------------------------------------------------
    @classmethod
    def normalize_id(cls, id: str | int) -> str:
        return str(id).replace("#", cls.sep)  # accept both `#` and `::` separators

    @classmethod
    def split_id(cls, id: str | int, last: bool = False) -> list[str]:
        norm = cls.normalize_id(id)
        if not last:
            return norm.split(cls.sep)
        head, _, tail = norm.rpartition(cls.sep)
        return [head, tail]

    @classmethod
    def iter_subconfigs(cls, id: str, config: Any):
        pairs = config.items() if isinstance(config, dict) else enumerate(config)
        for k, v in pairs:
            yield k, (f"{id}{cls.sep}{k}" if id else f"{k}"), v

    # -- reference discovery ------------------------------------------------------
    @classmethod
    def _refs_in_string(cls, value: str) -> list[str]:
        """ids referenced by a string: every `@id` inside a `$` expression, or the
        whole string when it is exactly one `@id`."""
        value = cls.normalize_id(value)
        hits = cls.id_matcher.findall(value)
        if ConfigExpression.is_expression(value):
            return [h[len(cls.ref):] for h in hits]
        return [h[len(cls.ref):] for h in hits if h == value]

    @classmethod
    def _dependencies(cls, config: Any, id: str) -> dict[str, int]:
        """Every id this config depends on: `@` references plus nested
        instantiable/expression sub-items (which must resolve bottom-up)."""
        found: dict[str, int] = {}

        def walk(node: Any, node_id: str) -> None:
            if isinstance(node, str):
                for r in cls._refs_in_string(node):
                    found[r] = found.get(r, 0) + 1
                return
            if not isinstance(node, (list, dict)):
                return
            for _, sub_id, child in cls.iter_subconfigs(node_id, node):
                if (ConfigComponent.is_instantiable(child) or ConfigExpression.is_expression(child)) \
                        and sub_id not in found:
                    found[sub_id] = 1
                walk(child, sub_id)

        walk(config, id)
        return found

    # compat aliases matching the reference classmethod names
    @classmethod
    def match_refs_pattern(cls, value: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for r in cls._refs_in_string(value):
            out[r] = out.get(r, 0) + 1
        return out

    @classmethod
    def find_refs_in_config(cls, config: Any, id: str, refs: dict[str, int] | None = None) -> dict[str, int]:
        merged = dict(refs or {})
        for k, v in cls._dependencies(config, id).items():
            merged[k] = merged.get(k, 0) + v
        return merged

    # -- substitution -------------------------------------------------------------
    @classmethod
    def update_refs_pattern(cls, value: str, refs: dict) -> Any:
        """Substitute resolved references into one string value."""
        value = cls.normalize_id(value)
        if ConfigExpression.is_expression(value):
            # textual rewrite inside expressions: longest ids first so `@a::b`
            # is not clobbered by `@a`
            for hit in sorted(set(cls.id_matcher.findall(value)), key=len, reverse=True):
                rid = hit[len(cls.ref):]
                if rid in refs:
                    value = value.replace(hit, f"{cls._vars}['{rid}']")
            return value
        if value.startswith(cls.ref) and cls.id_matcher.fullmatch(value):
            rid = value[len(cls.ref):]
            if rid in refs:
                return refs[rid]
            msg = f"can not find expected ID '{rid}' in the references."
            if cls.allow_missing_reference:
                warnings.warn(msg)
            else:
                raise KeyError(msg)
        return value

    @classmethod
    def update_config_with_refs(cls, config: Any, id: str, refs: dict | None = None):
        """Substitute resolved references throughout a config tree."""
        refs_: dict = refs or {}

        def rebuild(node: Any, node_id: str) -> Any:
            if isinstance(node, str):
                return cls.update_refs_pattern(node, refs_)
            if not isinstance(node, (list, dict)):
                return node
            out = {} if isinstance(node, dict) else []
            for key, sub_id, child in cls.iter_subconfigs(node_id, node):
                if ConfigComponent.is_instantiable(child) or ConfigExpression.is_expression(child):
                    new_child = refs_[sub_id]
                    if ConfigComponent.is_instantiable(child) and new_child is None:
                        continue  # disabled component: drop it
                else:
                    new_child = rebuild(child, sub_id)
                if isinstance(out, dict):
                    out[key] = new_child
                else:
                    out.append(new_child)
            return out

        return rebuild(config, id)

    # -- resolution driver ----------------------------------------------------------
    def _hoist_imports(self, **kwargs) -> None:
        """Evaluate `$import ...` expressions once so later expressions see them."""
        if self._imports_done:
            return
        self._imports_done = True
        for iid, item in self.items.items():
            if iid in self.resolved_content or not isinstance(item, ConfigExpression):
                continue
            if item.is_import_statement(item.get_config()):
                self.resolved_content[iid] = item.evaluate() if kwargs.get("eval_expr", True) else item

    def _resolve(self, id: str, in_progress: set[str], **kwargs):
        if id in self.resolved_content:
            return self.resolved_content[id]
        item = self.items.get(id)
        if item is None:
            msg = f"id='{id}' is not found in the config resolver."
            if self.allow_missing_reference:
                warnings.warn(msg)
                return None
            raise KeyError(msg)

        in_progress.add(id)
        self._hoist_imports(**kwargs)
        config = item.get_config()
        for dep in self._dependencies(config, id):
            if dep in in_progress:
                raise ValueError(f"detected circular references '{dep}' for id='{id}' in the config content.")
            if dep in self.resolved_content:
                continue
            if dep not in self.items:
                msg = f"the referring item `@{dep}` is not defined in the config content."
                if self.allow_missing_reference:
                    warnings.warn(msg)
                    continue
                raise ValueError(msg)
            self._resolve(dep, in_progress, **kwargs)
        in_progress.discard(id)

        new_config = self.update_config_with_refs(config, id, self.resolved_content)
        item.update_config(config=new_config)
        if isinstance(item, ConfigComponent):
            value = item.instantiate() if kwargs.get("instantiate", True) else item
        elif isinstance(item, ConfigExpression):
            value = (item.evaluate(globals={self._vars: self.resolved_content})
                     if kwargs.get("eval_expr", True) else item)
        else:
            value = new_config
        self.resolved_content[id] = value
        return value
