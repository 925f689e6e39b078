"""S2RegionSharder battery — s2region_sharder_test.cc fixtures
(GetMostIntersectingShard / GetIntersectingShards over both the
owned-index and external-index constructions) verbatim."""

import numpy as np
import pytest

from s2spark.kernels import cellid
from s2spark.kernels.cell_index import CellIndex
from s2spark.kernels.region_sharder import RegionSharder


def fpl(face, pos, level):
    """Cell at `level` reached by descending the base-4 child digits
    of `pos` (equivalent to the reference fixtures' FromFacePosLevel
    ids up to sibling choice — the containment/overlap relations the
    tests assert are identical)."""
    cid = cellid.from_face(np.array([face]))
    c = int(cid[0])
    # descend to `level` along child positions encoding `pos`
    for lv in range(1, level + 1):
        child_pos = (pos >> (2 * (level - lv))) & 3
        c = int(cellid.child(np.array([c], dtype=np.uint64),
                             child_pos)[0])
    return c


COVERINGS = [
    [fpl(0, 0, 10)],
    [fpl(1, 1, 9), fpl(3, 0, 8)],
    [fpl(5, 0, 10)],
]


def _index():
    idx = CellIndex()
    for i, cells in enumerate(COVERINGS):
        idx.add_union(np.asarray(cells, dtype=np.uint64), i)
    idx.build()
    return idx


@pytest.mark.parametrize("make", [
    lambda: RegionSharder(COVERINGS),
    lambda: RegionSharder(index=_index()),
], ids=["owned", "external"])
class TestRegionSharder:
    def test_get_most_intersecting_shard(self, make):
        sharder = make()
        # overlap with only one shard
        assert sharder.get_most_intersecting_shard(
            [fpl(0, 0, 11)], 42) == 0
        # multiple shards -> the one with more overlap wins
        assert sharder.get_most_intersecting_shard(
            [fpl(0, 0, 10), fpl(3, 0, 9), fpl(3, 1, 9)], 42) == 1
        # no overlap -> default
        assert sharder.get_most_intersecting_shard(
            [fpl(4, 0, 10)], 42) == 42

    def test_get_intersecting_shards(self, make):
        sharder = make()
        assert sharder.get_intersecting_shards(
            [fpl(0, 0, 11)]) == [0]
        assert sharder.get_intersecting_shards(
            [fpl(0, 0, 10), fpl(3, 0, 9), fpl(3, 1, 9)]) == [0, 1]
        assert sharder.get_intersecting_shards([fpl(4, 0, 10)]) == []


def test_region_protocol_objects():
    """Coverer-protocol regions (Cap) shard like their coverings."""
    from s2spark.kernels.region import Cap
    sharder = RegionSharder(COVERINGS)
    # a cap centered inside shard 0's cell
    x, y, z = cellid.to_point(np.array([fpl(0, 0, 10)],
                                       dtype=np.uint64))
    cap = Cap.from_point(np.array([x[0], y[0], z[0]]))
    assert sharder.get_most_intersecting_shard(cap, 42) == 0
    assert sharder.get_intersecting_shards(cap) == [0]
