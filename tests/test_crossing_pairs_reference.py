"""GetCrossingEdgePairs battery — the reference's
s2shapeutil_visit_crossing_edge_pairs_test.cc EdgeGrid fixtures
(112 ALL / 108 INTERIOR crossings) with the brute-force comparator,
run over the MutableShapeIndex candidate enumeration."""

import numpy as np

from s2spark.kernels import predicates
from s2spark.kernels.shape_index import (MutableShapeIndex,
                                         get_crossing_edge_pairs)
from s2spark.kernels.shapeutil import (edge_iterator,
                                       edge_vector_shape)


def ll(lat, lng):
    phi, lam = np.radians(lat), np.radians(lng)
    return np.array([np.cos(phi) * np.cos(lam),
                     np.cos(phi) * np.sin(lam), np.sin(phi)])


def brute_pairs(shapes, min_sign):
    """GetCrossingEdgePairsBruteForce (test .cc:99-117)."""
    edges = [(sid, eid, v0, v1)
             for sid, eid, v0, v1 in edge_iterator(shapes)]
    out = []
    for i in range(len(edges)):
        for j in range(i + 1, len(edges)):
            sa, ea, a0, a1 = edges[i]
            sb, eb, b0, b1 = edges[j]
            s = int(predicates.crossing_sign(
                a0[None], a1[None], b0[None], b1[None])[0])
            if s >= min_sign:
                out.append(((sa, ea), (sb, eb)))
    return sorted(out)


def _grid_shape(grid_size=10, eps=1e-10):
    """The 11x11 lat/lng edge grid (test .cc:196-220)."""
    edges = []
    for i in range(grid_size + 1):
        e = 0.0 if i in (0, grid_size) else eps
        edges.append((ll(-e, i), ll(grid_size + e, i)))
        edges.append((ll(i, -e), ll(i, grid_size + e)))
    return edge_vector_shape(edges)


def _check(shapes, crossing_type, expected_count):
    index = MutableShapeIndex(shapes)
    got = sorted(get_crossing_edge_pairs(index, crossing_type))
    want = brute_pairs(shapes, 0 if crossing_type == "all" else 1)
    assert got == want
    assert len(got) == expected_count


def test_no_intersections_empty_index():
    _check([], "all", 0)
    _check([], "interior", 0)


def test_edge_grid_one_index():
    # 9x9 interior + 27 touching = 108 interior, +4 corners = 112 all
    shape = _grid_shape()
    _check([shape], "all", 112)
    _check([shape], "interior", 108)


def test_edge_grid_two_shapes():
    # vertical lines in shape A, horizontal in shape B — the
    # cross-shape pairs carry the same counts (within-shape edges of
    # one orientation never cross each other)
    grid_size, eps = 10, 1e-10
    va, vb = [], []
    for i in range(grid_size + 1):
        e = 0.0 if i in (0, grid_size) else eps
        va.append((ll(-e, i), ll(grid_size + e, i)))
        vb.append((ll(i, -e), ll(i, grid_size + e)))
    shapes = [edge_vector_shape(va), edge_vector_shape(vb)]
    index = MutableShapeIndex(shapes)
    for ctype, count in (("all", 112), ("interior", 108)):
        got = sorted(get_crossing_edge_pairs(index, ctype))
        want = brute_pairs(shapes, 0 if ctype == "all" else 1)
        assert got == want
        assert len(got) == count
        # every crossing pair straddles the two shapes
        assert all(a[0] != b[0] for a, b in got)


class TestFindSelfIntersection:
    """FindSelfIntersection Basic (test .cc:293-302): each fixture
    checked over ALL cyclic permutations of every loop's vertices
    (TestHasCrossingPermutations)."""

    @staticmethod
    def _loops(s):
        from s2spark.kernels.validation import parse_index
        [shape] = parse_index("##" + s.replace(", ", ","))
        return [c for c in shape.chains]

    def _check(self, s, has_crossing):
        from itertools import product

        from s2spark.kernels.shape_index import find_self_intersection
        from s2spark.kernels.validation import VShape
        loops = self._loops(s)
        rotations = [range(len(lp)) for lp in loops]
        for rots in product(*rotations):
            chains = [np.roll(lp, -r, axis=0)
                      for lp, r in zip(loops, rots)]
            err = find_self_intersection(VShape(2, chains))
            assert (err is not None) == has_crossing, (s, rots, err)

    def test_basic(self):
        self._check("0:0, 0:1, 0:2, 1:2, 1:1, 1:0", False)
        # duplicate vertex
        self._check("0:0, 0:1, 0:2, 1:2, 0:1, 1:0", True)
        # edge crossing
        self._check("0:0, 0:1, 1:0, 1:1", True)
        # duplicate edge between loops
        self._check("0:0, 1:1, 0:1; 0:0, 1:1, 1:0", True)
        # reversed edge between loops
        self._check("0:0, 1:1, 0:1; 1:1, 0:0, 1:0", True)
        # vertex crossing
        self._check("0:0, 0:2, 2:2, 2:0; 1:1, 0:2, 3:1, 2:0", True)
