"""ConfigParser: json/yaml config loading, `@`/`$`/`%`/`_target_` DSL, lazy resolution.

Parity target: monai/bundle/config_parser.py:38.
"""
from __future__ import annotations

import json
import re
from collections.abc import Sequence
from copy import deepcopy
from pathlib import Path
from typing import Any

from ..utils.misc import ensure_tuple
from .config_item import ComponentLocator, ConfigComponent, ConfigExpression, ConfigItem
from .reference_resolver import ReferenceResolver

__all__ = ["ConfigParser"]

_SEP = ReferenceResolver.sep
_REF = ReferenceResolver.ref


def _step_into(node: Any, key: str) -> Any:
    """One step of an id-path walk: dict lookup by key, list lookup by int."""
    if isinstance(node, dict):
        return node[key]
    if isinstance(node, list):
        try:
            return node[int(key)]
        except ValueError as e:
            raise KeyError(f"list index expected at `{key}`") from e
    raise ValueError(f"cannot descend into {type(node).__name__} at `{key}`: {node!r}")


class ConfigParser:
    """Config tree + DSL resolution (reference: config_parser.py:38).

    Syntax: ``@id`` reference, ``$expr`` Python expression, ``%id`` macro (textual copy),
    ``_target_``/``_args_``/``_disabled_``/``_mode_`` component instantiation, ``::`` or
    ``#`` path separators.
    """

    suffixes = ("json", "yaml", "yml")
    suffix_match = rf".*\.({'|'.join(suffixes)})"
    path_match = rf"({suffix_match}$)"
    relpath_match = rf"(?:{_SEP})?({suffix_match}(?:{_SEP}.*)?)$"
    meta_key = "_meta_"
    relative_id_prefix = re.compile(rf"(?:{_REF}|%)(?:{_SEP})+")

    _DEFAULT_GLOBALS = {"json": "json", "re": "re", "np": "numpy", "numpy": "numpy",
                        "jnp": "jax.numpy", "jax": "jax", "nnx": "flax.nnx", "optax": "optax",
                        "monai_tpu": "monai_tpu", "monai": "monai_tpu"}

    def __init__(self, config: Any = None, excludes: Sequence[str] | str | None = None,
                 globals: dict[str, Any] | bool | None = None):
        self.config: Any = None
        self.globals: dict[str, Any] = {}
        if globals is not False:
            merged = dict(self._DEFAULT_GLOBALS, **globals) if isinstance(globals, dict) \
                else dict(self._DEFAULT_GLOBALS)
            from ..utils.module import optional_import

            for name, target in merged.items():
                self.globals[name] = optional_import(target)[0] if isinstance(target, str) \
                    else target
        self.locator = ComponentLocator(excludes=excludes)
        self.ref_resolver = ReferenceResolver()
        self.set(config=config if config is not None else {self.meta_key: {}})

    def __repr__(self) -> str:
        return f"{self.config}"

    def __getattr__(self, id):
        if id in {"config", "globals", "locator", "ref_resolver"}:
            raise AttributeError(id)
        return self.get_parsed_content(id)

    def __getitem__(self, id: str | int):
        node = self.config
        if id == "":
            return node
        for key in ReferenceResolver.split_id(id):
            node = _step_into(node, key)
        return node

    def __setitem__(self, id: str | int, config: Any) -> None:
        if id == "":
            self.config = config
        else:
            *parents, leaf = ReferenceResolver.split_id(id)
            target = self[_SEP.join(parents)]
            if isinstance(target, list):
                target[int(leaf)] = config
            else:
                target[leaf] = config
        self.ref_resolver.reset()

    def get(self, id: str = "", default: Any = None):
        try:
            return self[id]
        except (KeyError, IndexError, ValueError):
            return default

    def set(self, config: Any, id: str = "", recursive: bool = True) -> None:
        """Write ``config`` at ``id``; with ``recursive`` any missing intermediate
        dict levels along the id path are created first."""
        if recursive:
            if self.config is None:
                self.config = {}
            node = self.config
            for step in ReferenceResolver.split_id(id)[:-1]:
                node = node.setdefault(step, {}) if isinstance(node, dict) \
                    else node[int(step)]
        self[id] = config

    def update(self, pairs: dict) -> None:
        for key, value in pairs.items():
            self[key] = value

    def __contains__(self, id: str | int) -> bool:
        sentinel = object()
        return self.get(id, sentinel) is not sentinel

    def parse(self, reset: bool = True) -> None:
        """Recursively resolve macros then build ConfigItems (reference: config_parser.py:—)."""
        if reset:
            self.ref_resolver.reset()
        self.resolve_macro_and_relative_ids()
        self._do_parse(config=self.get())

    def get_parsed_content(self, id: str = "", **kwargs):
        """Get the resolved/instantiated value at ``id``; (re)parses when nothing is
        resolved yet, or when the caller opts out of lazy reuse."""
        needs_parse = not self.ref_resolver.is_resolved() or not kwargs.get("lazy", True)
        if needs_parse:
            self.parse(reset=True)
        return self.ref_resolver.get_resolved_content(id=id, **kwargs)

    def read_meta(self, f, **kwargs) -> None:
        self.set(self.load_config_files(f, **kwargs), self.meta_key)

    def read_config(self, f, **kwargs) -> None:
        merged = {self.meta_key: self.get(self.meta_key, {}), **self.load_config_files(f, **kwargs)}
        self.set(config=merged)

    def _do_resolve(self, config: Any, id: str = ""):
        if isinstance(config, (dict, list)):
            for k, sub_id, v in self.ref_resolver.iter_subconfigs(id, config):
                config[k] = self._do_resolve(v, sub_id)
        if isinstance(config, str):
            config = self.resolve_relative_ids(id, config)
            if config.startswith("%"):
                macro_path, macro_id = self.split_path_id(config[1:])
                source = ConfigParser(ConfigParser.load_config_file(macro_path)) \
                    if macro_path else self
                return deepcopy(source[macro_id])
        return config

    def resolve_macro_and_relative_ids(self):
        self.set(self._do_resolve(config=deepcopy(self.get())))

    def _do_parse(self, config: Any, id: str = "") -> None:
        """Depth-first: register children, then classify this node into the
        narrowest ConfigItem kind (component > expression > plain)."""
        if isinstance(config, (dict, list)):
            for _, sub_id, v in self.ref_resolver.iter_subconfigs(id, config):
                self._do_parse(config=v, id=sub_id)
        if ConfigComponent.is_instantiable(config):
            item: ConfigItem = ConfigComponent(config=config, id=id, locator=self.locator)
        elif ConfigExpression.is_expression(config):
            item = ConfigExpression(config=config, id=id, globals=self.globals)
        else:
            item = ConfigItem(config=config, id=id)
        self.ref_resolver.add_item(item)

    @classmethod
    def load_config_file(cls, filepath, **kwargs):
        """Load one config file, dispatching the loader on the filename suffix
        (.json via the stdlib, .yml/.yaml via pyyaml safe loading)."""
        if not filepath:
            return {}
        path = str(Path(filepath))
        if not re.compile(cls.path_match, re.IGNORECASE).findall(path):
            raise ValueError(f'unknown file input: "{filepath}"')
        lowered = path.lower()

        def _yaml_load(fh, **kw):
            import yaml

            return yaml.safe_load(fh, **kw)

        loader = json.load if lowered.endswith(cls.suffixes[0]) else (
            _yaml_load if lowered.endswith(cls.suffixes[1:]) else None)
        if loader is None:
            raise ValueError(f"only support JSON or YAML config file so far, got name {path}.")
        with open(path) as f:
            return loader(f, **kwargs)

    @classmethod
    def load_config_files(cls, files, **kwargs) -> dict:
        """Load and merge one or more config files / dicts."""
        if isinstance(files, dict):
            return files
        merged = ConfigParser(config={})
        for entry in ensure_tuple(files):
            pairs = entry if isinstance(entry, dict) else cls.load_config_file(entry, **kwargs)
            merged.update(pairs)
        return merged.get()  # type: ignore

    @classmethod
    def export_config_file(cls, config: dict, filepath: str, fmt: str = "json", **kwargs) -> None:
        writer = fmt.lower()
        with open(str(Path(filepath)), "w") as f:
            if writer == "json":
                json.dump(config, f, **kwargs)
            elif writer in ("yaml", "yml"):
                import yaml

                yaml.safe_dump(config, f, **kwargs)
            else:
                raise ValueError(f"only support JSON or YAML config file so far, got {writer}.")

    @classmethod
    def split_path_id(cls, src: str) -> tuple[str, str]:
        """Split a 'path::id' string into (file path, id-within-file)."""
        src = ReferenceResolver.normalize_id(src)
        hits = re.compile(rf"({cls.suffix_match}(?={_SEP}))").findall(src)
        if not hits:
            return "", src
        fname = hits[0][0]
        tail = src.rsplit(fname, 1)[1]
        return fname, tail[len(_SEP):] if tail.startswith(_SEP) else ""

    @classmethod
    def resolve_relative_ids(cls, id: str, value: str) -> str:
        """Rewrite `@::N...` / `%::N...` relative references in ``value`` into
        absolute ids, anchored at ``id``'s ancestors (one `::` per level up)."""
        anchor = id.split(_SEP)
        # longest prefixes first so `@::::x` is rewritten before `@::x`
        for prefix in sorted(set(cls.relative_id_prefix.findall(value)), reverse=True):
            sym = _REF if _REF in prefix else "%"
            up = prefix[len(sym):].count(_SEP)
            if up > len(anchor):
                raise ValueError(f"the relative id in `{value}` is out of the range of config content.")
            absolute = "" if up == len(anchor) else _SEP.join(anchor[:-up]) + _SEP
            value = value.replace(prefix, sym + absolute)
        return value
