"""ComponentStore (reference: monai/utils/component_store.py)."""
from __future__ import annotations

from collections.abc import Callable, Iterable
from keyword import iskeyword
from textwrap import dedent
from typing import Any, NamedTuple

__all__ = ["ComponentStore"]


def is_variable(name: str) -> bool:
    return name.isidentifier() and not iskeyword(name)


class ComponentStore:
    """Named registry of components with docstrings (reference: component_store.py)."""

    class _Component(NamedTuple):
        description: str
        value: Any

    def __init__(self, name: str, description: str):
        self.components: dict[str, ComponentStore._Component] = {}
        self.name = name
        self.description = description
        self.__doc__ = f"Component Store '{name}': {description}\n{self.__doc__ or ''}".strip()

    def add(self, name: str, desc: str, value: Any) -> Any:
        if not is_variable(name):
            raise ValueError("Name of component must be valid Python identifier")
        self.components[name] = self._Component(desc, value)
        return value

    def add_def(self, name: str, desc: str) -> Callable:
        def deco(func):
            return self.add(name, desc, func)

        return deco

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(self.components)

    def __contains__(self, name: str) -> bool:
        return name in self.components

    def __len__(self) -> int:
        return len(self.components)

    def __iter__(self) -> Iterable:
        for k, v in self.components.items():
            yield k, v.value

    def __str__(self):
        result = f"Component Store '{self.name}': {self.description}\nAvailable components:"
        for k, v in self.components.items():
            result += f"\n* {k}:"
            if hasattr(v.value, "__doc__") and v.value.__doc__:
                doc = dedent(v.value.__doc__).strip()
                result += f"\n{doc}\n"
            else:
                result += f" {v.description}"
        return result

    def __getattr__(self, name: str) -> Any:
        if name in self.__dict__.get("components", {}):
            return self.components[name].value
        return self.__getattribute__(name)

    def __getitem__(self, name: str) -> Any:
        if name in self.components:
            return self.components[name].value
        raise ValueError(f"Component '{name}' is not registered")
