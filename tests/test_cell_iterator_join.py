"""S2CellIteratorJoin battery — s2cell_iterator_join_test.cc:
ExactJoinWorks / FalseJoinReturnsImmediately / ExactJoinSeekingWorks
with the Central Park token fixtures verbatim, NearJoinWorks's
exact+tolerant truth tables, TolerantJoinIsLeftDriven, and the
AllPairsSeen brute-force equivalence over a fractal shape index."""

import numpy as np
import pytest

from s2spark.kernels import cellid
from s2spark.kernels.cell_iterator_join import CellIteratorJoin
from s2spark.kernels.region import Cell

CENTRAL_PARK_A = ["89c2589", "89c258a1", "89c258a3", "89c258bc",
                  "89c258c1", "89c258ec", "89c258f4"]
CENTRAL_PARK_B = ["89c2589", "89c258a03", "89c258a1c", "89c258a3",
                  "89c258bd", "89c258be1"]


def ids(tokens):
    return np.sort(cellid.from_token(tokens))


def tok(t):
    return int(cellid.from_token([t])[0])


class TestExactJoin:
    def test_exact_join_works(self):
        join = CellIteratorJoin(ids(CENTRAL_PARK_A),
                                ids(CENTRAL_PARK_B))
        rows = join.pairs()
        truth = [(tok("89c2589"), tok("89c2589")),
                 (tok("89c258a1"), tok("89c258a03")),
                 (tok("89c258a1"), tok("89c258a1c")),
                 (tok("89c258a3"), tok("89c258a3")),
                 (tok("89c258bc"), tok("89c258bd")),
                 (tok("89c258bc"), tok("89c258be1"))]
        assert rows == truth
        # every pair nests: the A cell contains the B cell
        for a, b in rows:
            arr = np.array([a], dtype=np.uint64)
            assert (int(cellid.range_min(arr)[0]) <= b
                    <= int(cellid.range_max(arr)[0]))

    def test_false_join_returns_immediately(self):
        join = CellIteratorJoin(ids(CENTRAL_PARK_A),
                                ids(CENTRAL_PARK_B))
        rows = []

        def once(pa, pb):
            rows.append((pa, pb))
            return False

        assert join.join(once) is False
        assert len(rows) == 1

    def test_tolerant_false_join_returns_immediately(self):
        join = CellIteratorJoin(ids(CENTRAL_PARK_A),
                                ids(CENTRAL_PARK_B),
                                tolerance_rad=np.radians(0.001))
        rows = []

        def once(pa, pb):
            rows.append((pa, pb))
            return False

        assert join.join(once) is False
        assert len(rows) == 1

    def test_exact_join_seeking_works(self):
        # 2d5e3 overlaps nothing in B: the merge must seek past it
        a = ids(["2d5dd7", "2d5ddc", "2d5e3", "2d5e801", "2d5e803"])
        b = ids(["2d5d", "2d5e84"])
        rows = CellIteratorJoin(a, b).pairs()
        truth = [(tok("2d5dd7"), tok("2d5d")),
                 (tok("2d5ddc"), tok("2d5d")),
                 (tok("2d5e801"), tok("2d5e84")),
                 (tok("2d5e803"), tok("2d5e84"))]
        assert rows == truth


class TestTolerantJoin:
    def test_near_join_works(self):
        join = CellIteratorJoin(ids(CENTRAL_PARK_A),
                                ids(CENTRAL_PARK_B),
                                tolerance_rad=np.radians(1.0))
        rows = set(join.pairs())
        exact_truth = [("89c2589", "89c2589"),
                       ("89c258a1", "89c258a03"),
                       ("89c258a1", "89c258a1c"),
                       ("89c258a3", "89c258a3"),
                       ("89c258bc", "89c258bd"),
                       ("89c258bc", "89c258be1")]
        tolerant_truth = [
            ("89c258a1", "89c258bd"), ("89c258a1", "89c258be1"),
            ("89c258a3", "89c258a03"), ("89c258a3", "89c258be1"),
            ("89c258bc", "89c258a03"), ("89c258bc", "89c258a1c"),
            ("89c258c1", "89c258a03"), ("89c258c1", "89c258a1c"),
            ("89c258c1", "89c258a3"), ("89c258c1", "89c258bd"),
            ("89c258c1", "89c258be1"),
            ("89c258ec", "89c258a03"), ("89c258ec", "89c258a1c"),
            ("89c258ec", "89c258a3"), ("89c258ec", "89c258bd"),
            ("89c258ec", "89c258be1"),
            ("89c258f4", "89c258a03"), ("89c258f4", "89c258a1c"),
            ("89c258f4", "89c258a3"), ("89c258f4", "89c258bd"),
            ("89c258f4", "89c258be1")]
        for ta, tb in exact_truth + tolerant_truth:
            assert (tok(ta), tok(tb)) in rows, (ta, tb)
        # every reported pair is within tolerance
        for a, b in rows:
            assert Cell(a).get_distance_cell(Cell(b)) \
                <= np.radians(1.0)

    @staticmethod
    def _fractal_index_cells(max_level, seed=7):
        from s2spark.kernels.fractal import Fractal
        from s2spark.kernels.shape_index import MutableShapeIndex
        from s2spark.kernels.shapeutil import lax_loop_shape
        # center on a face boundary (lat 0, lng -45)
        lam = np.radians(-45.0)
        center = np.array([np.cos(lam), np.sin(lam), 0.0])
        loop = Fractal(seed, max_level).make_loop(
            center, np.radians(10.0))
        index = MutableShapeIndex([lax_loop_shape(loop.vertices)])
        return index.cell_ids()

    def test_left_driven(self):
        # all rows for a given A cell arrive contiguously
        cells = self._fractal_index_cells(2)
        join = CellIteratorJoin(cells, cells,
                                tolerance_rad=np.radians(2.0))
        seen: set = set()
        curr = [None]

        def visit(pa, pb):
            a = int(cells[pa])
            if a != curr[0]:
                assert a not in seen, "A cell revisited"
                seen.add(a)
                curr[0] = a
            return True

        assert join.join(visit)

    def test_all_pairs_seen(self):
        cells = self._fractal_index_cells(3)
        tol = np.radians(2.0)
        cl = [Cell(int(c)) for c in cells]
        brute = {(int(a.id), int(b.id))
                 for a in cl for b in cl
                 if a.get_distance_cell(b) <= tol}
        join_pairs = set(CellIteratorJoin(cells, cells,
                                          tolerance_rad=tol).pairs())
        assert join_pairs == brute
