"""S2RegionSharder — shard assignment by covering overlap
(s2region_sharder.h:33-83, s2region_sharder.cc:33-140).

Shards are cell unions registered in an S2CellIndex; a region maps to
the shard whose covering overlaps it the most (leaf-coverage weight,
Σ lsb of the intersection cells), or to every intersecting shard.
The algorithm follows the reference exactly: the region's LOOSE
cell-union bound drives a VisitIntersectingCells sweep; if more than
one shard survives, each shard's hit set is normalized, intersected
with the region covering, and pruned by the region's exact
MayIntersect before weighing.

The engine's distributed form of this idea is lineage.bucket_col /
ops/joins.salted assignment (hashed cell prefix, weight-balanced);
this kernel is the single-node reference-parity face used to assign
WHOLE REGIONS (e.g. polygon partitions) to pre-declared shard
coverings.
"""

from __future__ import annotations

import numpy as np

from . import cellid, cellunion
from .cell_index import CellIndex
from .region import Cell

__all__ = ["RegionSharder"]


class _CellUnionRegion:
    """Minimal S2Region reading of a normalized cell union (the form
    the reference tests exercise): MayIntersect by range overlap,
    bound = the union itself."""

    def __init__(self, cells):
        self.cells = cellunion.normalize(np.asarray(
            cells, dtype=np.uint64).ravel())

    def get_cell_union_bound(self) -> list[int]:
        return [int(c) for c in self.cells]

    def may_intersect_cell(self, cell) -> bool:
        cid = int(getattr(cell, "id", cell))
        return bool(cellunion.intersects_cell(self.cells, cid)[0])


class RegionSharder:
    """See module docstring.  `region` arguments may be any object
    with get_cell_union_bound() + may_intersect_cell(cell) (coverer
    protocol — Cap, shape_index.IndexedShapeRegion, ...), or a raw
    cell-id array (wrapped as a cell-union region)."""

    def __init__(self, shards=None, index: CellIndex | None = None):
        if index is not None:
            self.index = index
        else:
            self.index = CellIndex()
            for i, cells in enumerate(shards or []):
                self.index.add_union(
                    np.asarray(cells, dtype=np.uint64).ravel(), i)
            self.index.build()

    @staticmethod
    def _as_region(region):
        if hasattr(region, "get_cell_union_bound"):
            return region
        return _CellUnionRegion(region)

    def _intersections_by_shard(self, region) -> dict[int, np.ndarray]:
        """GetIntersectionsByShard (s2region_sharder.cc:50-113)."""
        region = self._as_region(region)
        bound = cellunion.normalize(np.asarray(
            region.get_cell_union_bound(), dtype=np.uint64))
        shards: dict[int, list[int]] = {}

        def visit(cell, label):
            shards.setdefault(label, []).append(int(cell))
            return True

        self.index.visit_intersecting_cells(bound, visit)
        if len(shards) <= 1:
            return {k: cellunion.normalize(np.asarray(v, np.uint64))
                    for k, v in shards.items()}
        out: dict[int, np.ndarray] = {}
        for label, cells in shards.items():
            covering = cellunion.normalize(
                np.asarray(cells, dtype=np.uint64))
            inter = cellunion.intersection(covering, bound)
            keep = [int(c) for c in inter
                    if region.may_intersect_cell(Cell(int(c)))]
            if keep:
                out[label] = np.asarray(keep, dtype=np.uint64)
        return out

    def get_most_intersecting_shard(self, region,
                                    default_shard: int) -> int:
        """Shard with the max leaf-coverage overlap (Σ lsb,
        s2region_sharder.cc:115-136); default when none intersect."""
        best_shard, best_sum = default_shard, 0
        for label, cells in sorted(
                self._intersections_by_shard(region).items()):
            s = int(sum(int(c) & -int(c) for c in cells))
            if s > best_sum:
                best_shard, best_sum = label, s
        return best_shard

    def get_intersecting_shards(self, region) -> list[int]:
        return sorted(self._intersections_by_shard(region).keys())
