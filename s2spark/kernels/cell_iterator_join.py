"""S2CellIteratorJoin — inner join over two sorted cell iterators
(s2cell_iterator_join.h:39-445).

Exact join: a classic merge sweep over the two CellRangeIterators
using Relation/SeekTo (each overlapping (a, b) pair visited once; the
smaller cell advances, equal-size overlap means identical cells and
both advance).

Tolerant join (tolerance > 0): the reference's divide-and-conquer —
seed with FromMinMax coverings of each side, prune (cell_a, cell_b)
pairs farther apart than the tolerance, subdivide any cell estimated
to cover >= kCoverLimit index cells, and at the leaves emit the index
cell pairs within tolerance (each A index cell reported under the
probe cell containing its range_min, so pairs are visited exactly
once).

The distributed analogues are ops/joins.cell_equi_join /
containment_range_join (exact — prefix-key equi-joins) and
ops/joins.disc_join (tolerant — ring-expanded candidates); this
kernel is the single-node iterator face the reference exposes, and
the algorithm its TolerantJoin documents."""

from __future__ import annotations

import numpy as np

from . import cellid, cellunion
from .range_iterator import DISJOINT, INDEXED, CellRangeIterator
from .region import Cell

__all__ = ["CellIteratorJoin"]

MAX_CROSS_PRODUCT = 25            # s2cell_iterator_join.h:151
COVER_LIMIT = MAX_CROSS_PRODUCT // 2


def _lsb(cid: int) -> int:
    return cid & -cid


class CellIteratorJoin:
    """Join over two sorted uint64 cell-id arrays.  `visitor(pa, pb)`
    receives the POSITIONS of the paired cells in the input arrays
    (the iterator-pair of the reference) and returns False to cancel;
    join() returns False iff cancelled.  `tolerance_rad` buffers
    cells by a spherical distance (the tolerant regime)."""

    def __init__(self, ids_a, ids_b, tolerance_rad: float = 0.0):
        if tolerance_rad < 0:
            raise ValueError("tolerance must be non-negative")
        self.ids_a = np.asarray(ids_a, dtype=np.uint64).ravel()
        self.ids_b = np.asarray(ids_b, dtype=np.uint64).ravel()
        self.iter_a = CellRangeIterator(self.ids_a)
        self.iter_b = CellRangeIterator(self.ids_b)
        self.tolerance_rad = float(tolerance_rad)

    def join(self, visitor) -> bool:
        if self.tolerance_rad == 0.0:
            return self._exact_join(visitor)
        return self._tolerant_join(visitor)

    def pairs(self) -> list[tuple[int, int]]:
        """All joined (id_a, id_b) pairs, in visit order."""
        out: list[tuple[int, int]] = []

        def keep(pa, pb):
            out.append((int(self.ids_a[pa]), int(self.ids_b[pb])))
            return True

        self.join(keep)
        return out

    # -- exact merge sweep (s2cell_iterator_join.h:226-269) -----------

    def _exact_join(self, visitor) -> bool:
        a, b = self.iter_a, self.iter_b
        a.begin()
        b.begin()
        while not a.done() and not b.done():
            order = a.relation(b)
            if order == -1:
                a.seek_to(b)
            elif order == 1:
                b.seek_to(a)
            else:
                if not visitor(a.pos, b.pos):
                    return False
                lsb_a = _lsb(a.id())
                lsb_b = _lsb(b.id())
                if lsb_a < lsb_b:
                    a.next()
                elif lsb_a > lsb_b:
                    b.next()
                else:
                    a.next()
                    b.next()
        return True

    # -- tolerant divide-and-conquer (.h:286-416) ---------------------

    def _tolerant_join(self, visitor) -> bool:
        tol = self.tolerance_rad

        def covering(ids):
            if len(ids) == 0:
                return []
            lo = int(cellid.range_min(ids[:1])[0])
            hi = int(cellid.range_max(ids[-1:])[0])
            return [Cell(int(c))
                    for c in cellunion.from_min_max(lo, hi)]

        cells_a = covering(self.ids_a)
        cells_b = covering(self.ids_b)
        if not cells_a or not cells_b:
            return True
        return self._process_nearby(cells_a, cells_b, visitor)

    def _estimate_covered(self, it: CellRangeIterator,
                          cid: int) -> int:
        rel = it.locate(cid)
        if rel == DISJOINT:
            return 0
        if rel == INDEXED:
            return 1
        # SUBDIVIDED: count index cells inside, saturating
        n = 0
        rmax = int(cellid.range_max(
            np.array([cid], dtype=np.uint64))[0])
        while not it.done() and it.id() <= rmax:
            n += 1
            if n > COVER_LIMIT:
                return COVER_LIMIT
            it.next()
        return n

    def _scan_cell_range(self, it: CellRangeIterator, cid: int,
                         visitor) -> bool:
        it.locate(cid)
        rmin = int(cellid.range_min(
            np.array([cid], dtype=np.uint64))[0])
        rmax = int(cellid.range_max(
            np.array([cid], dtype=np.uint64))[0])
        while not it.done():
            # intersects(cid): leaf ranges overlap
            if it.range_min() > rmax or it.range_max() < rmin:
                break
            if not visitor(it):
                return False
            it.next()
        return True

    def _process_nearby(self, cells_a, cells_b, visitor) -> bool:
        for cell_a in cells_a:
            nearby = [cb for cb in cells_b
                      if cell_a.get_distance_cell(cb)
                      <= self.tolerance_rad]
            if nearby:
                if not self._process_cell_pairs(cell_a, nearby,
                                                visitor):
                    return False
        return True

    def _process_cell_pairs(self, cell_a: Cell, cells_b,
                            visitor) -> bool:
        num_a = self._estimate_covered(self.iter_a, cell_a.id)
        if num_a == 0:
            return True
        sub_a = [cell_a]
        if num_a >= COVER_LIMIT:
            sub_a = [Cell(int(c)) for c in cellid.child(
                np.full(4, cell_a.id, dtype=np.uint64),
                np.arange(4))]

        subdivided = False
        kept_b = []
        for cell_b in cells_b:
            num_b = self._estimate_covered(self.iter_b, cell_b.id)
            if num_b == 0:
                continue
            if num_b < COVER_LIMIT:
                kept_b.append(cell_b)
            else:
                kept_b.extend(Cell(int(c)) for c in cellid.child(
                    np.full(4, cell_b.id, dtype=np.uint64),
                    np.arange(4)))
                subdivided = True
        if num_a >= COVER_LIMIT or subdivided:
            return self._process_nearby(sub_a, kept_b, visitor)
        if not kept_b:
            return True

        # leaves: pair A index cells (owned by range_min) with the B
        # index cells of each B probe cell within tolerance
        matched: list[Cell] = []
        for cell_b in kept_b:
            self._scan_cell_range(
                self.iter_b, cell_b.id,
                lambda it: (matched.append(Cell(it.id())), True)[1])

        rmin_a = int(cellid.range_min(
            np.array([cell_a.id], dtype=np.uint64))[0])
        rmax_a = int(cellid.range_max(
            np.array([cell_a.id], dtype=np.uint64))[0])

        def scan_a(it_a):
            # only report index cells whose range_min is inside cell_a
            if not (rmin_a <= it_a.range_min() <= rmax_a):
                return True
            sub_cell_a = Cell(it_a.id())
            pos_a = it_a.pos
            idx = [0]

            def scan_b(it_b):
                near = (sub_cell_a.get_distance_cell(
                    matched[idx[0]]) <= self.tolerance_rad)
                idx[0] += 1
                if near and not visitor(pos_a, it_b.pos):
                    return False
                return True

            for cell_b in kept_b:
                if not self._scan_cell_range(self.iter_b, cell_b.id,
                                             scan_b):
                    return False
            return True

        return self._scan_cell_range(self.iter_a, cell_a.id, scan_a)
