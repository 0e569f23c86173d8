"""ComponentStore (reference API: monai/utils/component_store.py).

Own implementation: components are kept as ``_Entry`` dataclasses in an insertion-
ordered dict; attribute access and docstring rendering are derived from that map.
"""
from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass
from keyword import iskeyword
from textwrap import dedent
from typing import Any

__all__ = ["ComponentStore"]


@dataclass(frozen=True)
class _Entry:
    value: Any
    description: str

    def doc(self, name: str) -> str:
        docstring = getattr(self.value, "__doc__", None)
        if docstring:
            return f"\n* {name}:\n{dedent(docstring).strip()}\n"
        return f"\n* {name}: {self.description}"


class ComponentStore:
    """Named registry of components with attached descriptions.

    Components are registered with :meth:`add` (or the :meth:`add_def` decorator)
    and retrieved by attribute, item access, or iteration.
    """

    def __init__(self, name: str, description: str):
        self._entries: dict[str, _Entry] = {}
        self.name = name
        self.description = description
        self.__doc__ = f"Component Store '{name}': {description}\n{self.__doc__ or ''}".strip()

    def add(self, name: str, desc: str, value: Any) -> Any:
        """Register ``value`` under ``name`` (must be a valid identifier); returns it."""
        if not (name.isidentifier() and not iskeyword(name)):
            raise ValueError("Name of component must be valid Python identifier")
        self._entries[name] = _Entry(value=value, description=desc)
        return value

    def add_def(self, name: str, desc: str) -> Callable:
        """Decorator form of :meth:`add` for function components."""
        def register(fn: Callable) -> Callable:
            return self.add(name, desc, fn)

        return register

    @property
    def components(self) -> dict[str, _Entry]:
        return self._entries

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __len__(self) -> int:
        return len(self._entries)

    def __iter__(self) -> Iterator:
        yield from ((k, e.value) for k, e in self._entries.items())

    def __str__(self) -> str:
        body = "".join(e.doc(k) for k, e in self._entries.items())
        return f"Component Store '{self.name}': {self.description}\nAvailable components:{body}"

    def __getattr__(self, name: str) -> Any:
        entries = self.__dict__.get("_entries")
        if entries and name in entries:
            return entries[name].value
        return self.__getattribute__(name)

    def __getitem__(self, name: str) -> Any:
        try:
            return self._entries[name].value
        except KeyError:
            raise ValueError(f"Component '{name}' is not registered") from None


def is_variable(name) -> bool:
    """True if ``name`` is a valid, non-keyword Python identifier (reference:
    component_store.py is_variable)."""
    from keyword import iskeyword

    return name.isidentifier() and not iskeyword(name)
