"""S2CellIndex (s2cell_index.h:34-660, s2cell_index.cc:33-153): a
static index over (cell_id, label) pairs — possibly overlapping, with
duplicates — decomposed into non-overlapping leaf-cell ranges, each
pointing into a preorder "cell tree" of the pairs that intersect it.

Single-node face of the engine's distributed cell-interval machinery
(ops/joins.cell_union_overlap_join / containment_range_join run the
same range-decomposition idea as Spark interval joins); this class is
the reference-parity API: RangeIterator / NonEmptyRangeIterator /
ContentsIterator (with the preorder node-cutoff duplicate
suppression), CellIterator, VisitIntersectingCells and
GetIntersectingLabels with the binary-search target skip.

Cell ids are PYTHON unsigned ints here (sorted-comparable); use
cellid.as_u64 / as_i64 at the NumPy boundary.
"""

from __future__ import annotations

import bisect

import numpy as np

from . import cellid as ck

# S2CellId::Begin(kMaxLevel) / End(kMaxLevel) as unsigned ints
BEGIN_LEAF = 1
END_LEAF = (6 << 61) + 1
_SENTINEL = (1 << 64) - 1  # S2CellId::Sentinel: sorts after all ids


def _u(cell) -> int:
    return int(np.uint64(np.asarray(cell).astype(np.uint64)))


def _rmin(cell: int) -> int:
    return int(ck.as_u64(ck.range_min(np.array([cell], dtype=np.uint64)))[0])


def _rmax(cell: int) -> int:
    return int(ck.as_u64(ck.range_max(np.array([cell], dtype=np.uint64)))[0])


class CellIndex:
    """Build with add()/add_union() then build(); query via the
    iterator classes below."""

    def __init__(self):
        # before build: list of (cell, label); after: preorder tree of
        # (cell, label, parent) plus range nodes (start, contents)
        self.cell_tree: list[tuple[int, int, int]] = []
        self.range_nodes: list[tuple[int, int]] = []
        self._pending: list[tuple[int, int]] = []

    # --- construction -------------------------------------------------
    def add(self, cell, label: int) -> None:
        if label < 0:
            raise ValueError("labels must be non-negative")
        self._pending.append((_u(cell), int(label)))

    def add_union(self, cells, label: int) -> None:
        for c in np.asarray(cells).ravel():
            self.add(c, label)

    def clear(self) -> None:
        self.__init__()

    def num_cells(self) -> int:
        return len(self.cell_tree)

    def build(self) -> None:
        """s2cell_index.cc:73-137: two deltas per pair (push at
        range_min, pop at range_max+1) sorted by (start, cell DESC,
        label) — larger cells push first, pops precede pushes — then
        one stack walk emits the preorder cell tree + range nodes."""
        deltas: list[tuple[int, int, int]] = []
        for cell, label in self._pending:
            deltas.append((_rmin(cell), _SENTINEL - cell, label))
            deltas.append((_rmax(cell) + 1, _SENTINEL - _SENTINEL, -1))
        # begin/end markers (cell key: None=0 -> _SENTINEL - 0 is the
        # SMALLEST reverse key, so markers sort after pops and pushes)
        deltas.append((BEGIN_LEAF, _SENTINEL, -1))
        deltas.append((END_LEAF, _SENTINEL, -1))
        deltas.sort()
        self.cell_tree = []
        self.range_nodes = []
        contents = -1
        i, n = 0, len(deltas)
        while i < n:
            start = deltas[i][0]
            while i < n and deltas[i][0] == start:
                _, rkey, label = deltas[i]
                if label >= 0:
                    self.cell_tree.append((_SENTINEL - rkey, label,
                                           contents))
                    contents = len(self.cell_tree) - 1
                elif rkey == 0:  # pop (Sentinel)
                    contents = self.cell_tree[contents][2]
                i += 1
            self.range_nodes.append((start, contents))

    # --- built-in queries ---------------------------------------------
    def visit_intersecting_cells(self, target, visitor) -> bool:
        """s2cell_index.h:619-648: `target` is a NORMALIZED cell union
        (sorted, non-overlapping); visitor(cell_id, label) -> bool
        (False stops the visit).  Uses the reference's binary-search
        skip over target cells inside one processed range."""
        target = [_u(c) for c in np.asarray(target).ravel()]
        if not target:
            return True
        ti = 0
        rng = RangeIterator(self)
        contents = ContentsIterator(self)
        rng.begin()
        while True:
            t_min, t_max = _rmin(target[ti]), _rmax(target[ti])
            if rng.limit_id() <= t_min:
                rng.seek(t_min)
            while rng.start_id() <= t_max:
                contents.start_union(rng)
                while not contents.done():
                    if not visitor(contents.cell_id(),
                                   contents.label()):
                        return False
                    contents.next()
                rng.next()
            ti += 1
            if ti < len(target) and _rmax(target[ti]) < rng.start_id():
                # skip target cells inside the range just processed
                lo = bisect.bisect_left(target, rng.start_id(), ti + 1)
                if _rmax(target[lo - 1]) >= rng.start_id():
                    lo -= 1
                ti = lo
            if ti >= len(target):
                return True

    def get_intersecting_labels(self, target) -> set:
        labels: set = set()

        def keep(_cell, label):
            labels.add(label)
            return True

        self.visit_intersecting_cells(target, keep)
        return labels


class CellIterator:
    """Visits every (cell_id, label) pair once (s2cell_index.h:214)."""

    def __init__(self, index: CellIndex):
        self._tree = index.cell_tree
        self._i = 0

    def done(self) -> bool:
        return self._i >= len(self._tree)

    def next(self) -> None:
        self._i += 1

    def cell_id(self) -> int:
        return self._tree[self._i][0]

    def label(self) -> int:
        return self._tree[self._i][1]


class RangeIterator:
    """Non-overlapping leaf-cell ranges covering the whole sphere
    (s2cell_index.h:238-320): start_id/limit_id/is_empty +
    begin/next/prev/seek/finish."""

    def __init__(self, index: CellIndex):
        self._nodes = index.range_nodes
        self._i = 0

    def begin(self) -> None:
        self._i = 0

    def finish(self) -> None:
        self._i = len(self._nodes) - 1

    def done(self) -> bool:
        return self._i >= len(self._nodes) - 1

    def start_id(self) -> int:
        return self._nodes[self._i][0]

    def limit_id(self) -> int:
        if self._i + 1 >= len(self._nodes):
            return _SENTINEL  # positioned at the END marker
        return self._nodes[self._i + 1][0]

    def is_empty(self) -> bool:
        return self._nodes[self._i][1] == -1

    def next(self) -> None:
        self._i += 1

    def prev(self) -> bool:
        if self._i == 0:
            return False
        self._i -= 1
        return True

    def seek(self, target_leaf: int) -> None:
        """Position at the range containing the leaf cell
        (upper_bound - 1, s2cell_index.cc:33-37)."""
        starts = [n[0] for n in self._nodes]
        self._i = bisect.bisect_right(starts, int(target_leaf)) - 1

    def contents(self) -> int:
        return self._nodes[self._i][1]


class NonEmptyRangeIterator(RangeIterator):
    """RangeIterator that skips ranges with no intersecting cells
    (s2cell_index.h:322-343)."""

    def begin(self) -> None:
        super().begin()
        while not self.done() and self.is_empty():
            super().next()

    def next(self) -> None:
        super().next()
        while not self.done() and self.is_empty():
            super().next()

    def prev(self) -> bool:
        while super().prev():
            if not self.is_empty():
                return True
        # moved to the first range; restore forward to first non-empty
        if self.is_empty() and not self.done():
            self.next()
        return False

    def seek(self, target_leaf: int) -> None:
        super().seek(target_leaf)
        while not self.done() and self.is_empty():
            RangeIterator.next(self)


class ContentsIterator:
    """(cell_id, label) pairs intersecting one leaf-cell range, with
    the preorder node-cutoff duplicate suppression across successive
    start_union() calls in FORWARD range order
    (s2cell_index.cc:39-66, s2cell_index.h:593-602)."""

    def __init__(self, index: CellIndex):
        self._tree = index.cell_tree
        self._node = -1  # -1 == done
        self._prev_start_id = 0
        self._node_cutoff = -1
        self._next_node_cutoff = -1

    def done(self) -> bool:
        return self._node < 0

    def cell_id(self) -> int:
        return self._tree[self._node][0]

    def label(self) -> int:
        return self._tree[self._node][1]

    def start_union(self, rng: RangeIterator) -> None:
        if rng.start_id() < self._prev_start_id:
            self._node_cutoff = -1  # moved backwards: no suppression
        self._prev_start_id = rng.start_id()
        contents = rng.contents()
        if contents <= self._node_cutoff:
            self._node = -1
        else:
            self._node = contents
        self._next_node_cutoff = contents

    def next(self) -> None:
        parent = self._tree[self._node][2]
        if parent <= self._node_cutoff:
            # this node and its ancestors were already reported
            self._node_cutoff = self._next_node_cutoff
            self._node = -1
        else:
            self._node = parent
