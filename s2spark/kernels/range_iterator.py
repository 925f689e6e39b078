"""S2CellRangeIterator over a sorted cell-id array.

Reference parity: s2cell_range_iterator.h:28-267 and the
S2CellRelation enum (s2cell_iterator.h:27-31).  The iterator walks a
SORTED sequence of cell ids (the single-node face of the engine's
cell-sorted storage contract — lineage.py sorts parquet by cell id for
exactly this reason) caching each cell's [range_min, range_max] leaf
span, which makes merge-style sweeps (SeekTo / SeekBeyond / Relation)
and containment probes (Locate) O(log n) binary searches.

The distributed form of the same idea is ops/joins.py's
containment_range_join (range-overlap equi-join on prefix keys); this
kernel is the driver-side / per-partition iterator the reference APIs
expose.
"""
from __future__ import annotations

import numpy as np

from . import cellid

# S2CellId::Sentinel() — larger than any valid cell id
SENTINEL = 0xFFFF_FFFF_FFFF_FFFF

# S2CellRelation (s2cell_iterator.h:27-31)
INDEXED = 0      # target is contained by an index cell
SUBDIVIDED = 1   # target is subdivided into one or more index cells
DISJOINT = 2     # target does not intersect any index cells


def _rmin(cid: int) -> int:
    return int(cellid.range_min(np.array([cid], dtype=np.uint64))[0])


def _rmax(cid: int) -> int:
    return int(cellid.range_max(np.array([cid], dtype=np.uint64))[0])


class CellRangeIterator:
    """Iterator over sorted cell ids with cached leaf ranges."""

    __slots__ = ("ids", "pos", "_rmin", "_rmax")

    def __init__(self, ids):
        a = np.asarray(ids, dtype=np.uint64).ravel()
        if len(a) > 1 and not bool(np.all(a[:-1] <= a[1:])):
            a = np.sort(a)
        self.ids = a
        self.begin()

    # --- S2CellIterator API ------------------------------------------
    def begin(self) -> None:
        self.pos = 0
        self._refresh()

    def next(self) -> None:
        if self.pos < len(self.ids):
            self.pos += 1
        self._refresh()

    def prev(self) -> bool:
        if self.pos == 0:
            return False
        self.pos -= 1
        self._refresh()
        return True

    def seek(self, target: int) -> None:
        """First cell with id >= target."""
        self.pos = int(np.searchsorted(self.ids, np.uint64(target),
                                       side="left"))
        self._refresh()

    def finish(self) -> None:
        self.pos = len(self.ids)
        self._refresh()

    def done(self) -> bool:
        return self.pos >= len(self.ids)

    def id(self) -> int:
        return SENTINEL if self.done() else int(self.ids[self.pos])

    def range_min(self) -> int:
        return self._rmin

    def range_max(self) -> int:
        return self._rmax

    def _refresh(self) -> None:
        if self.done():
            # Sentinel is a leaf-like id: its range is itself
            self._rmin = SENTINEL
            self._rmax = SENTINEL
        else:
            cid = int(self.ids[self.pos])
            self._rmin = _rmin(cid)
            self._rmax = _rmax(cid)

    # --- range methods (s2cell_range_iterator.h:62-93) ----------------
    def relation(self, other: "CellRangeIterator") -> int:
        """-1 entirely precedes, +1 entirely follows, 0 overlaps."""
        if self.range_max() < other.range_min():
            return -1
        if self.range_min() > other.range_max():
            return +1
        return 0

    def locate_point(self, leaf: int) -> bool:
        """Position at the cell containing the given LEAF id, if any
        (the S2CellIterator Locate(S2Point) contract with the point
        already mapped to its leaf cell)."""
        self.seek(leaf)
        if not self.done() and self.range_min() <= leaf <= self.range_max():
            return True
        if self.prev() and self.range_max() >= leaf:
            return True
        # restore the seek position (reference leaves it unspecified;
        # we keep the first cell >= leaf for deterministic sweeps)
        self.seek(leaf)
        return False

    def locate(self, target: int) -> int:
        """Relation of the target CELL id to the indexed cells
        (s2cell_range_iterator.h:172-198): INDEXED / SUBDIVIDED /
        DISJOINT.  Leaves the iterator at the deciding cell."""
        tmin, tmax = _rmin(target), _rmax(target)
        self.seek(tmin)
        if not self.done():
            if self.id() >= target and self.range_min() <= target:
                return INDEXED
            if self.id() <= tmax:
                return SUBDIVIDED
        if self.prev() and self.range_max() >= target:
            return INDEXED
        return DISJOINT

    def locate_iter(self, target: "CellRangeIterator") -> int:
        """Locate using another range iterator's current cell."""
        self.seek(target.range_min())
        if not self.done():
            if (self.id() >= target.id()
                    and self.range_min() <= target.id()):
                return INDEXED
            if self.id() <= target.range_max():
                return SUBDIVIDED
        if self.prev() and self.range_max() >= target.id():
            return INDEXED
        return DISJOINT

    def seek_to(self, target: "CellRangeIterator") -> None:
        """First cell that overlaps or follows target
        (range_max() >= target.range_min())."""
        self.seek(target.range_min())
        if self.done() or self.range_min() > target.range_max():
            if self.prev() and self.range_max() < target.id():
                self.next()
        self._refresh()

    def seek_beyond(self, target: "CellRangeIterator") -> None:
        """First cell that entirely follows target
        (range_min() > target.range_max())."""
        nxt = target.range_max() + 1
        if nxt > SENTINEL:
            self.finish()
            return
        self.seek(nxt)
        if not self.done() and self.range_min() <= target.range_max():
            self.next()
