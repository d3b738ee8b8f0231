"""Bounded LRU mapping for host-side kernel-plan caches.

The plan caches (densified Pallas band blocks, shear-apply tables, stencil
closures) are keyed by operator-content hashes; a long-lived server
resampling many geometries must not grow them — and the multi-MB f32
blocks they hold — without bound (VERDICT r2 §7).  dict in CPython
preserves insertion order, so move-to-end on hit + evict-oldest on insert
gives LRU with no extra structure.
"""

from __future__ import annotations

from typing import Any, Hashable, Optional


class LruDict:
    """Minimal LRU mapping: get/put/len/contains, evicts least-recent."""

    def __init__(self, capacity: int):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = capacity
        self._d: dict = {}

    def get(self, key: Hashable, default: Any = None) -> Optional[Any]:
        if key not in self._d:
            return default
        val = self._d.pop(key)   # re-insert: most-recent position
        self._d[key] = val
        return val

    def put(self, key: Hashable, value: Any) -> None:
        if key in self._d:
            self._d.pop(key)
        elif len(self._d) >= self.capacity:
            self._d.pop(next(iter(self._d)))  # least-recent
        self._d[key] = value

    def values(self):
        """Snapshot of cached values, oldest first (does not promote)."""
        return list(self._d.values())

    def items(self):
        """Snapshot of (key, value) pairs, oldest first (no promotion)."""
        return list(self._d.items())

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._d

    def clear(self) -> None:
        self._d.clear()
