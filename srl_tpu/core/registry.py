"""Pluggable registries.

Mirrors the reference's three cross-cutting registries:
``registered_env`` (environments/registry.py:41-53), ``registered_rl``
(rl_baselines/registry.py:17-30) and ``registered_srl``
(state_representation/registry.py:5-30), as one generic typed mapping.
"""
from __future__ import annotations

from typing import Callable, Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, T] = {}

    def register(self, name: str, entry: T = None):
        if entry is not None:
            self._entries[name] = entry
            return entry

        def deco(obj):
            self._entries[name] = obj
            return obj

        return deco

    def __getitem__(self, name: str) -> T:
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} '{name}'. Registered: {sorted(self._entries)}"
            )
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(self._entries)

    def items(self):
        return self._entries.items()

    def keys(self):
        return self._entries.keys()
