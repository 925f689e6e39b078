"""S2PointIndex (s2point_index.h:33-220): a mutable multiset of
(point, data) entries keyed and sorted by leaf S2CellId, with a
seekable iterator — the single-node face of the engine's
cell-sorted-parquet point storage (ops/knn consumes the distributed
twin).  Keys are unsigned leaf ids; ties keep insertion-stable
(cell, point-bytes, data) ordering so iteration is deterministic."""

from __future__ import annotations

import bisect

import numpy as np

from . import cellid as ck


def _leaf(point) -> int:
    p = np.asarray(point, dtype=np.float64)
    return int(ck.as_u64(ck.from_xyz(p[0:1], p[1:2], p[2:3]))[0])


class PointIndex:
    def __init__(self):
        # sorted list of (leaf_cell, point_bytes, data); points kept
        # as bytes so entries are totally ordered and hashable
        self._entries: list[tuple[int, bytes, object]] = []

    @staticmethod
    def _key(point, data) -> tuple[int, bytes, object]:
        p = np.asarray(point, dtype=np.float64)
        return (_leaf(p), p.tobytes(), data)

    def add(self, point, data) -> None:
        bisect.insort(self._entries, self._key(point, data))

    def remove(self, point, data) -> bool:
        """Removes ONE copy of (point, data); False if absent."""
        k = self._key(point, data)
        i = bisect.bisect_left(self._entries, k)
        if i < len(self._entries) and self._entries[i] == k:
            del self._entries[i]
            return True
        return False

    def num_points(self) -> int:
        return len(self._entries)


class PointIterator:
    """begin/next/prev/seek/finish over the cell-sorted entries
    (s2point_index.h:120-205)."""

    def __init__(self, index: PointIndex):
        self._e = index._entries
        self._i = 0

    def begin(self) -> None:
        self._i = 0

    def finish(self) -> None:
        self._i = len(self._e)

    def done(self) -> bool:
        return self._i >= len(self._e)

    def next(self) -> None:
        self._i += 1

    def prev(self) -> bool:
        if self._i == 0:
            return False
        self._i -= 1
        return True

    def seek(self, target_leaf: int) -> None:
        """First entry with id >= target (done() if none)."""
        self._i = bisect.bisect_left(self._e, (int(target_leaf),))

    def id(self) -> int:
        return self._e[self._i][0]

    def point(self) -> np.ndarray:
        return np.frombuffer(self._e[self._i][1], dtype=np.float64)

    def data(self):
        return self._e[self._i][2]
