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


class ConfigParser:
    """Config tree + DSL resolution (reference: config_parser.py:38).

    Syntax: ``@id`` reference, ``$expr`` Python expression, ``%id`` macro (textual copy),
    ``_target_``/``_args_``/``_disabled_``/``_mode_`` component instantiation, ``::`` or
    ``#`` path separators.
    """

    suffixes = ("json", "yaml", "yml")
    suffix_match = rf".*\.({'|'.join(suffixes)})"
    path_match = rf"({suffix_match}$)"
    relpath_match = rf"(?:{ReferenceResolver.sep})?({suffix_match}(?:{ReferenceResolver.sep}.*)?)$"
    meta_key = "_meta_"

    def __init__(self, config: Any = None, excludes: Sequence[str] | str | None = None,
                 globals: dict[str, Any] | bool | None = None):
        self.config: Any = None
        self.globals: dict[str, Any] = {}
        _globals = {"json": "json", "re": "re", "np": "numpy", "numpy": "numpy", "jnp": "jax.numpy",
                    "jax": "jax", "nnx": "flax.nnx", "optax": "optax",
                    "monai_tpu": "monai_tpu", "monai": "monai_tpu"}
        if isinstance(globals, dict):
            _globals.update(globals)
        if _globals is not None and globals is not False:
            for k, v in _globals.items():
                if isinstance(v, str):
                    from ..utils.module import optional_import

                    self.globals[k], _ = optional_import(v)
                else:
                    self.globals[k] = v
        self.locator = ComponentLocator(excludes=excludes)
        self.ref_resolver = ReferenceResolver()
        if config is None:
            config = {self.meta_key: {}}
        self.set(config=config)

    def __repr__(self) -> str:
        return f"{self.config}"

    def __getattr__(self, id):
        if id in {"config", "globals", "locator", "ref_resolver"}:
            raise AttributeError(id)
        return self.get_parsed_content(id)

    def __getitem__(self, id: str | int):
        if id == "":
            return self.config
        config = self.config
        for k in ReferenceResolver.split_id(id):
            if not isinstance(config, (dict, list)):
                raise ValueError(f"config must be dict or list for key `{k}`, but got {type(config)}: {config}.")
            try:
                config = config[k if isinstance(config, dict) else int(k)]
            except ValueError as e:
                raise KeyError(f"query key: {k}") from e
        return config

    def __setitem__(self, id: str | int, config: Any) -> None:
        if id == "":
            self.config = config
            self.ref_resolver.reset()
            return
        keys = ReferenceResolver.split_id(id)
        last_id = ReferenceResolver.sep.join(keys[:-1])
        conf_ = self[last_id]
        indexing = keys[-1] if isinstance(conf_, dict) else int(keys[-1])
        conf_[indexing] = config
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
            node = self.get()
            if node is None:
                node = {}
                self.config = node
            for step in ReferenceResolver.split_id(id)[:-1]:
                if isinstance(node, dict):
                    node = node.setdefault(step, {})
                else:
                    node = node[int(step)]
        self[id] = config

    def update(self, pairs: dict) -> None:
        for k, v in pairs.items():
            self[k] = v

    def __contains__(self, id: str | int) -> bool:
        try:
            _ = self[id]
            return True
        except (KeyError, IndexError, ValueError):
            return False

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
        content = {self.meta_key: self.get(self.meta_key, {})}
        content.update(self.load_config_files(f, **kwargs))
        self.set(config=content)

    def _do_resolve(self, config: Any, id: str = ""):
        if isinstance(config, (dict, list)):
            for k, sub_id, v in self.ref_resolver.iter_subconfigs(id, config):
                config[k] = self._do_resolve(v, sub_id)
        if isinstance(config, str):
            config = self.resolve_relative_ids(id, config)
            if config.startswith("%"):
                arr = self.split_path_id(config[1:])
                if arr[0]:
                    sub = ConfigParser.load_config_file(arr[0])
                    sub_parser = ConfigParser(sub)
                    return deepcopy(sub_parser[arr[1]])
                return deepcopy(self[arr[1]])
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
        parser = ConfigParser(config={})
        if isinstance(files, (dict, list)) and not isinstance(files, str):
            if isinstance(files, dict):
                return files
        for f in ensure_tuple(files):
            if isinstance(f, dict):
                for k, v in f.items():
                    parser[k] = v
            else:
                content = cls.load_config_file(f, **kwargs)
                for k, v in content.items():
                    parser[k] = v
        return parser.get()  # type: ignore

    @classmethod
    def export_config_file(cls, config: dict, filepath: str, fmt: str = "json", **kwargs) -> None:
        _filepath: str = str(Path(filepath))
        writer = fmt.lower()
        with open(_filepath, "w") as f:
            if writer == "json":
                json.dump(config, f, **kwargs)
                return
            if writer == "yaml" or writer == "yml":
                import yaml

                yaml.safe_dump(config, f, **kwargs)
                return
            raise ValueError(f"only support JSON or YAML config file so far, got {writer}.")

    @classmethod
    def split_path_id(cls, src: str) -> tuple[str, str]:
        """Split a 'path::id' string (reference: config_parser.py:—)."""
        src = ReferenceResolver.normalize_id(src)
        result = re.compile(rf"({cls.suffix_match}(?={ReferenceResolver.sep}))").findall(src)
        if not result:
            return "", src
        path_name = result[0][0]
        _, ids = src.rsplit(path_name, 1)
        return path_name, ids[len(ReferenceResolver.sep):] if ids.startswith(ReferenceResolver.sep) else ""

    @classmethod
    def resolve_relative_ids(cls, id: str, value: str) -> str:
        """Resolve `@::N` / `%::N` relative references (reference: config_parser.py:—)."""
        prefixes = sorted(set().union(cls.relative_id_prefix.findall(value)), reverse=True)
        current_id = id.split(ReferenceResolver.sep)
        for p in prefixes:
            sym = ReferenceResolver.ref if ReferenceResolver.ref in p else "%"
            length = p[len(sym):].count(ReferenceResolver.sep)
            if length > len(current_id):
                raise ValueError(f"the relative id in `{value}` is out of the range of config content.")
            if length == len(current_id):
                new = ""  # root
            else:
                new = ReferenceResolver.sep.join(current_id[:-length]) + ReferenceResolver.sep
            value = value.replace(p, sym + new)
        return value

    relative_id_prefix = re.compile(rf"(?:{ReferenceResolver.ref}|%)(?:{ReferenceResolver.sep})+")
