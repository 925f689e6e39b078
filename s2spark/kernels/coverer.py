"""S2RegionCoverer: greedy best-first covering of a region by cells.

Algorithm mirrors the reference (s2region_coverer.cc:90-380): start from a
fast <=4/6-cell covering of the region's bounding cap, repeatedly pop the
"worst" candidate (priority packs level, child count, terminal count) and
subdivide, then Normalize + Denormalize to honor min_level/level_mod.
Deterministic for identical inputs (the reference tests assert this:
s2region_coverer_test.cc:144-147).

Regions are duck-typed: they need `may_intersect_cell(Cell)`,
`contains_cell(Cell)`, and `get_cell_union_bound()` — satisfied by
region.Cap, region.LatLngRect, CellUnionRegion below, and loops.Loop.
"""

from __future__ import annotations

import heapq
import itertools

import numpy as np

from . import cellid, cellunion
from .region import Cell


class CellUnionRegion:
    """S2CellUnion as a coverable region (s2cell_union.cc:330-346)."""

    def __init__(self, ids):
        self.ids = cellunion.normalize(ids)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return bool(cellunion.intersects_cell(
            self.ids, np.array([cell.id], dtype=np.uint64))[0])

    def contains_cell(self, cell: Cell) -> bool:
        return bool(cellunion.contains_cell(
            self.ids, np.array([cell.id], dtype=np.uint64))[0])

    def get_cell_union_bound(self) -> list:
        return [int(v) for v in self.ids]


class RegionUnion:
    """S2RegionUnion (s2region_union.h, s2region_union.cc:81-100):
    the union of N sub-regions.  Contains(cell) is true iff SOME
    sub-region contains the cell (conservative false negatives are
    allowed by the S2Region contract); MayIntersect(cell) iff some
    sub-region may intersect.  Bound: the normalized union of the
    sub-regions' cell-union bounds — a valid superset of the union
    and tighter than the reference's cap-of-united-rects."""

    def __init__(self, regions: list):
        self.regions = list(regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return any(r.may_intersect_cell(cell) for r in self.regions)

    def contains_cell(self, cell: Cell) -> bool:
        return any(r.contains_cell(cell) for r in self.regions)

    def contains_point(self, p) -> bool:
        return any(r.contains_point(p) for r in self.regions)

    def get_cell_union_bound(self) -> list:
        ids: list[int] = []
        for r in self.regions:
            ids.extend(int(v) for v in r.get_cell_union_bound())
        if not ids:
            return []
        return [int(v) for v in
                cellunion.normalize(np.array(ids, dtype=np.uint64))]


class RegionIntersection:
    """S2RegionIntersection (s2region_intersection.cc:77-95): the
    intersection of N sub-regions.  Contains(cell)/MayIntersect(cell)
    iff EVERY sub-region does (MayIntersect may over-report, which the
    contract allows).  Bound: the cell-union intersection of the
    sub-regions' bounds — valid since ∩R_i ⊆ ∩B_i."""

    def __init__(self, regions: list):
        self.regions = list(regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return all(r.may_intersect_cell(cell) for r in self.regions)

    def contains_cell(self, cell: Cell) -> bool:
        return all(r.contains_cell(cell) for r in self.regions)

    def contains_point(self, p) -> bool:
        return all(r.contains_point(p) for r in self.regions)

    def get_cell_union_bound(self) -> list:
        if not self.regions:
            return []
        acc = cellunion.normalize(np.array(
            [int(v) for v in self.regions[0].get_cell_union_bound()],
            dtype=np.uint64))
        for r in self.regions[1:]:
            b = cellunion.normalize(np.array(
                [int(v) for v in r.get_cell_union_bound()],
                dtype=np.uint64))
            acc = cellunion.intersection(acc, b)
        return [int(v) for v in acc]


class _Candidate:
    __slots__ = ("cell", "is_terminal", "children")

    def __init__(self, cell: Cell, is_terminal: bool):
        self.cell = cell
        self.is_terminal = is_terminal
        self.children = []


class RegionCoverer:
    def __init__(self, max_cells: int = 8, min_level: int = 0,
                 max_level: int = cellid.MAX_LEVEL, level_mod: int = 1):
        self.max_cells = max_cells
        self.min_level = max(0, min(cellid.MAX_LEVEL, min_level))
        self.max_level = max(0, min(cellid.MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))

    # -- public API ---------------------------------------------------------
    def get_covering(self, region) -> np.ndarray:
        return self._covering_internal(region, interior=False)

    def get_interior_covering(self, region) -> np.ndarray:
        return self._covering_internal(region, interior=True)

    def get_fast_covering(self, region) -> np.ndarray:
        """Region's cell-union bound, canonicalized (s2region_coverer.cc:333-337)."""
        ids = np.array(region.get_cell_union_bound(), dtype=np.uint64)
        return self.canonicalize_covering(ids)

    # -- internals ----------------------------------------------------------
    def _true_max_level(self) -> int:
        if self.level_mod == 1:
            return self.max_level
        return self.max_level - (self.max_level - self.min_level) % self.level_mod

    def _adjust_level(self, level: int) -> int:
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def _adjust_cell_levels(self, ids: np.ndarray) -> np.ndarray:
        if self.level_mod == 1:
            return ids
        out: list[int] = []
        for raw in ids:
            arr = np.array([raw], dtype=np.uint64)
            lev = int(cellid.level(arr)[0])
            new_level = self._adjust_level(lev)
            cid = int(cellid.parent(arr, new_level)[0]) if new_level != lev \
                else int(raw)
            carr = np.array([cid], dtype=np.uint64)
            if out and cellid.contains(np.array([out[-1]], dtype=np.uint64),
                                       carr)[0]:
                continue
            while out and cellid.contains(carr,
                                          np.array([out[-1]],
                                                   dtype=np.uint64))[0]:
                out.pop()
            out.append(cid)
        return np.array(out, dtype=np.uint64)

    def _new_candidate(self, region, cell: Cell, interior: bool):
        """NewCandidate (s2region_coverer.cc:90-111)."""
        if not region.may_intersect_cell(cell):
            return None
        is_terminal = False
        if cell.level >= self.min_level:
            if interior:
                if region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + self.level_mod > self.max_level:
                    return None
            else:
                if (cell.level + self.level_mod > self.max_level
                        or region.contains_cell(cell)):
                    is_terminal = True
        return _Candidate(cell, is_terminal)

    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def _expand_children(self, region, candidate, cell: Cell,
                         num_levels: int, interior: bool) -> int:
        """ExpandChildren (s2region_coverer.cc:122-142)."""
        num_levels -= 1
        num_terminals = 0
        child_ids = cellid.child(
            np.repeat(np.array([cell.id], dtype=np.uint64), 4),
            np.arange(4))
        for cid in child_ids:
            child_cell = Cell(int(cid))
            if num_levels > 0:
                if region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(
                        region, candidate, child_cell, num_levels, interior)
                continue
            child = self._new_candidate(region, child_cell, interior)
            if child is not None:
                candidate.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, candidate, region, interior: bool,
                       result: list, pq: list, counter) -> None:
        """AddCandidate (s2region_coverer.cc:144-187)."""
        if candidate is None:
            return
        if candidate.is_terminal:
            result.append(candidate.cell.id)
            return
        num_levels = 1 if candidate.cell.level < self.min_level \
            else self.level_mod
        num_terminals = self._expand_children(region, candidate,
                                              candidate.cell, num_levels,
                                              interior)
        shift = self._max_children_shift()
        if not candidate.children:
            return
        if (not interior and num_terminals == (1 << shift)
                and candidate.cell.level >= self.min_level):
            candidate.is_terminal = True
            self._add_candidate(candidate, region, interior, result, pq,
                                counter)
            return
        priority = -((((candidate.cell.level << shift)
                       + len(candidate.children)) << shift) + num_terminals)
        heapq.heappush(pq, (priority, next(counter), candidate))

    def _initial_candidates(self, region, interior: bool, result, pq,
                            counter) -> None:
        """GetInitialCandidates (s2region_coverer.cc:212-224)."""
        tmp = RegionCoverer(max_cells=min(4, self.max_cells),
                            max_level=self.max_level)
        cells = tmp.get_fast_covering(region)
        cells = self._adjust_cell_levels(cells)
        for cid in cells:
            self._add_candidate(
                self._new_candidate(region, Cell(int(cid)), interior),
                region, interior, result, pq, counter)

    def _covering_internal(self, region, interior: bool) -> np.ndarray:
        """GetCoveringInternal (s2region_coverer.cc:226-305)."""
        result: list[int] = []
        pq: list = []
        counter = itertools.count()  # FIFO tie-break like the reference pq
        self._initial_candidates(region, interior, result, pq, counter)
        while pq and (not interior or len(result) < self.max_cells):
            _, _, candidate = heapq.heappop(pq)
            if (interior or candidate.cell.level < self.min_level
                    or len(candidate.children) == 1
                    or len(result) + len(pq) + len(candidate.children)
                    <= self.max_cells):
                for child in candidate.children:
                    if interior and len(result) >= self.max_cells:
                        pass
                    else:
                        self._add_candidate(child, region, interior, result,
                                            pq, counter)
            else:
                candidate.is_terminal = True
                self._add_candidate(candidate, region, interior, result, pq,
                                    counter)
        out = cellunion.normalize(np.array(result, dtype=np.uint64))
        if self.min_level > 0 or self.level_mod > 1:
            out = cellunion.denormalize(out, self.min_level, self.level_mod)
        return out

    # -- canonicalization (s2region_coverer.cc:382-451) ----------------------
    def is_canonical(self, ids) -> bool:
        a = cellid.as_u64(np.atleast_1d(np.asarray(ids)))
        min_level, max_level = self.min_level, self._true_max_level()
        level_mod = self.level_mod
        too_many = a.size > self.max_cells
        same_parent_count = 1
        prev = None
        for raw in a:
            arr = np.array([raw], dtype=np.uint64)
            if not cellid.is_valid(arr)[0]:
                return False
            lev = int(cellid.level(arr)[0])
            if lev < min_level or lev > max_level:
                return False
            if level_mod > 1 and (lev - min_level) % level_mod != 0:
                return False
            if prev is not None:
                parr = np.array([prev], dtype=np.uint64)
                if int(cellid.range_max(parr)[0]) >= \
                        int(cellid.range_min(arr)[0]):
                    return False
                if too_many and int(cellid.common_ancestor_level(
                        arr, parr)[0]) >= min_level:
                    return False
                plevel = lev - level_mod
                prev_lev = int(cellid.level(parr)[0])
                if (plevel < min_level or lev != prev_lev
                        or int(cellid.parent(arr, plevel)[0])
                        != int(cellid.parent(parr, plevel)[0])):
                    same_parent_count = 1
                else:
                    same_parent_count += 1
                    if same_parent_count == (1 << (2 * level_mod)):
                        return False
            prev = int(raw)
        return True

    def canonicalize_covering(self, ids) -> np.ndarray:
        a = cellid.as_u64(np.atleast_1d(np.asarray(ids))).copy()
        # replace too-small / wrong-level cells with ancestors
        if self.max_level < cellid.MAX_LEVEL or self.level_mod > 1:
            levels = cellid.level(a)
            new_levels = np.minimum(levels, self.max_level)
            for k in range(a.size):
                nl = self._adjust_level(int(new_levels[k]))
                if nl != int(levels[k]):
                    a[k] = cellid.parent(a[k:k + 1], nl)[0]
        a = cellunion.normalize(a)
        if self.min_level > 0 or self.level_mod > 1:
            a = cellunion.denormalize(a, self.min_level, self.level_mod)
        excess = a.size - self.max_cells
        if excess <= 0 or self.is_canonical(a):
            return a
        if excess * a.size > 10000:
            return self.get_covering(CellUnionRegion(a))
        # repeatedly merge the adjacent pair with the deepest common ancestor
        cells = [int(v) for v in a]
        while len(cells) > self.max_cells:
            best_index, best_level = -1, -1
            for k in range(len(cells) - 1):
                lev = int(cellid.common_ancestor_level(
                    np.array([cells[k]], dtype=np.uint64),
                    np.array([cells[k + 1]], dtype=np.uint64))[0])
                lev = self._adjust_level(lev)
                if lev > best_level:
                    best_level, best_index = lev, k
            if best_level < self.min_level:
                break
            anc = np.array([cells[best_index]], dtype=np.uint64)
            anc = cellid.parent(anc, best_level)
            cells = self._replace_with_ancestor(cells, anc)
            while best_level > self.min_level:
                best_level -= self.level_mod
                anc = cellid.parent(anc, best_level)
                if not self._contains_all_children(cells, anc):
                    break
                cells = self._replace_with_ancestor(cells, anc)
        return np.array(cells, dtype=np.uint64)

    @staticmethod
    def _replace_with_ancestor(cells: list, anc: np.ndarray) -> list:
        rmin = int(cellid.range_min(anc)[0])
        rmax = int(cellid.range_max(anc)[0])
        out = [cid for cid in cells if cid < rmin or cid > rmax]
        # insert ancestor in sorted position
        import bisect
        bisect.insort(out, int(anc[0]))
        return out

    @staticmethod
    def _contains_all_children(cells: list, anc: np.ndarray) -> bool:
        import bisect
        rmin = int(cellid.range_min(anc)[0])
        pos = bisect.bisect_left(cells, rmin)
        lev = int(cellid.level(anc)[0]) + 1
        child = cellid.child_begin(anc)
        for k in range(4):
            if pos + k >= len(cells) or cells[pos + k] != int(child[0]):
                return False
            child = cellid.next_cell(child)
        return True
