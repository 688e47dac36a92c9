"""Small host-side containers.

≙ common_utils/data_structure.py: `Cache` LRU (:4-39 — here
data.datasets.LRUVolumeCache), `MaxStack` (:42-61), `Dictate` (:64-99).
"""

from __future__ import annotations

from typing import Any, List, Optional


class MaxStack:
    """Bounded stack keeping the most recent `maxlen` items."""

    def __init__(self, maxlen: int = 10):
        self.maxlen = maxlen
        self._items: List[Any] = []

    def push(self, item: Any) -> None:
        self._items.append(item)
        if len(self._items) > self.maxlen:
            self._items.pop(0)

    def pop(self) -> Optional[Any]:
        return self._items.pop() if self._items else None

    def peek(self) -> Optional[Any]:
        return self._items[-1] if self._items else None

    def __len__(self) -> int:
        return len(self._items)


class Dictate:
    """Attribute-style view over a nested dict (read-mostly config sugar)."""

    def __init__(self, d: dict):
        self._d = dict(d)

    def __getattr__(self, name: str):
        try:
            v = self._d[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return Dictate(v) if isinstance(v, dict) else v

    def __getitem__(self, key):
        return self._d[key]

    def get(self, key, default=None):
        return self._d.get(key, default)

    def to_dict(self) -> dict:
        return dict(self._d)
