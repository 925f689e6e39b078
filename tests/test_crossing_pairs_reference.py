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
