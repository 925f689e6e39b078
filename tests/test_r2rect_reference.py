"""Reference battery for R2Rect / S2R2Rect.

Pins the fixtures of r2rect_test.cc and s2r2rect_test.cc (constructor,
interval-op, projection, expansion, bound and cell-relationship cases)
against kernels/r2rect.py.
"""
import math

import numpy as np
import pytest

from s2spark.kernels import cellid, coords, predicates
from s2spark.kernels.r2rect import R2Rect, S2R2Rect, _get_face
from s2spark.kernels.region import Cap, Cell, R1Interval


def _rect(lox, loy, hix, hiy):
    return S2R2Rect.from_points((lox, loy), (hix, hiy))


def _cell_fpl(face, pos, level):
    return Cell(int(cellid.from_face_pos_level(face, pos, level)[()]))


def _interval_ops(x, y, expected, expected_union, expected_intersection):
    """TestIntervalOps (s2r2rect_test.cc:49-74)."""
    assert x.contains(y) == (expected[0] == "T")
    assert x.interior_contains(y) == (expected[1] == "T")
    assert x.intersects(y) == (expected[2] == "T")
    assert x.interior_intersects(y) == (expected[3] == "T")

    assert (x.union(y) == x) == x.contains(y)
    assert (not x.intersection(y).is_empty()) == x.intersects(y)

    assert x.union(y) == expected_union
    assert x.intersection(y) == expected_intersection

    if y.get_size() == (0.0, 0.0):
        assert x.add_point(y.lo()) == expected_union


def test_empty_rectangles():
    empty = S2R2Rect.empty()
    assert empty.is_valid()
    assert empty.is_empty()
    assert empty == empty


def test_constructors_and_accessors():
    d1 = _rect(0.1, 0, 0.25, 1)
    assert d1.x.lo == 0.1 and d1.x.hi == 0.25
    assert d1.y.lo == 0.0 and d1.y.hi == 1.0
    assert d1[0] == R1Interval(0.1, 0.25)
    assert d1[1] == R1Interval(0, 1)
    assert d1.get_vertex_ij(0, 0) == d1.lo()
    assert d1.get_vertex_ij(1, 1) == d1.hi()
    assert d1 == d1
    assert d1 != S2R2Rect.empty()


def test_from_cell():
    assert S2R2Rect.from_cell(_cell_fpl(0, 0, 1)) == \
        _rect(0, 0, 0.5, 0.5)
    assert S2R2Rect.from_cellid(
        int(cellid.from_face_pos_level(0, 0, 0)[()])) == _rect(0, 0, 1, 1)


def test_from_center_size():
    assert S2R2Rect.from_center_size((0.3, 0.5), (0.2, 0.4)).approx_equals(
        _rect(0.2, 0.3, 0.4, 0.7))
    assert S2R2Rect.from_center_size((1, 0.1), (0, 2)).approx_equals(
        _rect(1, -0.9, 1, 1.1))


def test_from_point():
    d1 = _rect(0.1, 0, 0.25, 1)
    assert S2R2Rect.from_point(d1.lo()) == \
        S2R2Rect.from_points(d1.lo(), d1.lo())
    assert S2R2Rect.from_point_pair((0.15, 0.9), (0.35, 0.3)) == \
        _rect(0.15, 0.3, 0.35, 0.9)
    assert S2R2Rect.from_point_pair((0.83, 0), (0.12, 0.5)) == \
        _rect(0.12, 0, 0.83, 0.5)


def test_simple_predicates():
    sw1 = (0.0, 0.25)
    ne1 = (0.5, 0.75)
    r1 = S2R2Rect.from_points(sw1, ne1)

    assert r1.get_center() == (0.25, 0.5)
    assert r1.get_vertex(0) == (0.0, 0.25)
    assert r1.get_vertex(1) == (0.5, 0.25)
    assert r1.get_vertex(2) == (0.5, 0.75)
    assert r1.get_vertex(3) == (0.0, 0.75)
    assert r1.contains_point((0.2, 0.4))
    assert not r1.contains_point((0.2, 0.8))
    assert not r1.contains_point((-0.1, 0.4))
    assert not r1.contains_point((0.6, 0.1))
    assert r1.contains_point(sw1)
    assert r1.contains_point(ne1)
    assert not r1.interior_contains_point(sw1)
    assert not r1.interior_contains_point(ne1)

    # GetVertex CCW order (robust sign of consecutive vertices > 0)
    for k in range(4):
        a = S2R2Rect.to_s2point(r1.get_vertex(k - 1))
        b = S2R2Rect.to_s2point(r1.get_vertex(k))
        c = S2R2Rect.to_s2point(r1.get_vertex(k + 1))
        s = predicates.sign(*(np.array([x]) for x in (*a, *b, *c)))
        assert int(s[0]) > 0, k


def test_interval_operations():
    empty = S2R2Rect.empty()
    r1 = _rect(0, 0.25, 0.5, 0.75)
    r1_mid = _rect(0.25, 0.5, 0.25, 0.5)
    r_sw1 = S2R2Rect.from_point(r1.lo())
    r_ne1 = S2R2Rect.from_point(r1.hi())

    _interval_ops(r1, r1_mid, "TTTT", r1, r1_mid)
    _interval_ops(r1, r_sw1, "TFTF", r1, r_sw1)
    _interval_ops(r1, r_ne1, "TFTF", r1, r_ne1)

    assert r1 == _rect(0, 0.25, 0.5, 0.75)
    _interval_ops(r1, _rect(0.45, 0.1, 0.75, 0.3), "FFTT",
                  _rect(0, 0.1, 0.75, 0.75), _rect(0.45, 0.25, 0.5, 0.3))
    _interval_ops(r1, _rect(0.5, 0.1, 0.7, 0.3), "FFTF",
                  _rect(0, 0.1, 0.7, 0.75), _rect(0.5, 0.25, 0.5, 0.3))
    _interval_ops(r1, _rect(0.45, 0.1, 0.7, 0.25), "FFTF",
                  _rect(0, 0.1, 0.7, 0.75), _rect(0.45, 0.25, 0.5, 0.25))

    _interval_ops(_rect(0.1, 0.2, 0.1, 0.3), _rect(0.15, 0.7, 0.2, 0.8),
                  "FFFF", _rect(0.1, 0.2, 0.2, 0.8), empty)

    # Overlap in x but not y, and vice versa.
    _interval_ops(_rect(0.1, 0.2, 0.4, 0.5), _rect(0, 0, 0.2, 0.1),
                  "FFFF", _rect(0, 0, 0.4, 0.5), empty)
    _interval_ops(_rect(0, 0, 0.1, 0.3), _rect(0.2, 0.1, 0.3, 0.4),
                  "FFFF", _rect(0, 0, 0.3, 0.4), empty)


def test_add_point():
    r1 = _rect(0, 0.25, 0.5, 0.75)
    r2 = S2R2Rect.empty()
    r2 = r2.add_point((0, 0.25))
    r2 = r2.add_point((0.5, 0.25))
    r2 = r2.add_point((0, 0.75))
    r2 = r2.add_point((0.1, 0.4))
    assert r1 == r2


def test_project():
    r1 = S2R2Rect(R1Interval(0, 0.5), R1Interval(0.25, 0.75))
    assert r1.project((-0.01, 0.24)) == (0, 0.25)
    assert r1.project((-5.0, 0.48)) == (0, 0.48)
    assert r1.project((-5.0, 2.48)) == (0, 0.75)
    assert r1.project((0.19, 2.48)) == (0.19, 0.75)
    assert r1.project((6.19, 2.48)) == (0.5, 0.75)
    assert r1.project((6.19, 0.53)) == (0.5, 0.53)
    assert r1.project((6.19, -2.53)) == (0.5, 0.25)
    assert r1.project((0.33, -2.53)) == (0.33, 0.25)
    assert r1.project((0.33, 0.37)) == (0.33, 0.37)


def test_expanded():
    assert S2R2Rect.empty().expanded((0.1, 0.3)).is_empty()
    assert S2R2Rect.empty().expanded((-0.1, -0.3)).is_empty()
    assert _rect(0.2, 0.4, 0.3, 0.7).expanded((0.1, 0.3)).approx_equals(
        _rect(0.1, 0.1, 0.4, 1.0))
    assert _rect(0.2, 0.4, 0.3, 0.7).expanded((-0.1, 0.3)).is_empty()
    assert _rect(0.2, 0.4, 0.3, 0.7).expanded((0.1, -0.2)).is_empty()
    assert _rect(0.2, 0.4, 0.3, 0.7).expanded((0.1, -0.1)).approx_equals(
        _rect(0.1, 0.5, 0.4, 0.6))
    assert _rect(0.2, 0.4, 0.3, 0.7).expanded(0.1).approx_equals(
        _rect(0.1, 0.3, 0.4, 0.8))


def test_bounds():
    empty = S2R2Rect.empty()
    assert empty.get_cap_bound().is_empty()
    assert empty.get_rect_bound().is_empty()

    # Center of face 0 -> the (1,0,0) point cap / point latlng rect.
    point = _rect(0.5, 0.5, 0.5, 0.5)
    cap = point.get_cap_bound()
    assert cap.center == (1.0, 0.0, 0.0) and cap.radius2 == 0.0
    rb = point.get_rect_bound()
    assert rb.lat.lo == rb.lat.hi == 0.0
    assert rb.lng.lo == rb.lng.hi == 0.0

    # Deterministic stand-in for s2random::CellId: a fixed spread of
    # face-0..5 cells at several levels (the reference property is
    # vertex-in-bound / far-point-out-of-bound for any cell rect).
    rng = np.random.default_rng(20260820)
    faces = rng.integers(0, 6, size=10)
    levels = rng.integers(0, 20, size=10)
    pos = rng.integers(0, 1 << 60, size=10).astype(np.uint64)
    for f, lev, p in zip(faces, levels, pos):
        cid = int(cellid.from_face_pos_level(int(f), int(p), int(lev))[()])
        rect = S2R2Rect.from_cellid(cid)
        if not rect.x.intersects(R1Interval(0, 1)):
            continue
        cap = rect.get_cap_bound()
        llrect = rect.get_rect_bound()
        for k in range(4):
            v = np.asarray(S2R2Rect.to_s2point(rect.get_vertex(k)))
            c = np.asarray(cap.center)
            v2 = c + 3.0 * (v - c)
            v2 = tuple(v2 / math.sqrt(float(v2 @ v2)))
            assert cap.contains_point(tuple(v))
            assert not cap.contains_point(v2)
            assert llrect.contains_point(tuple(v))
            assert not llrect.contains_point(v2)


def _cell_ops(r, cell, level):
    """TestCellOps (s2r2rect_test.cc:76-97): 0 = disjoint,
    2 = intersects, 3 = a vertex of one is inside the other,
    4 = contains."""
    vertex_contained = False
    for i in range(4):
        p = cell.get_vertex_raw(i)
        if p[0] > 0:  # FaceXYZtoUV(0, p) defined only on the +x side
            u, v = p[1] / p[0], p[2] / p[0]
            if r.contains_point((float(coords.uv_to_st(u)),
                                 float(coords.uv_to_st(v)))):
                vertex_contained = True
        if not r.is_empty() and cell.contains_point(
                S2R2Rect.to_s2point(r.get_vertex(i))):
            vertex_contained = True
    assert r.may_intersect_cell(cell) == (level >= 2)
    assert vertex_contained == (level >= 3)
    assert r.contains_cell(cell) == (level >= 4)


def test_cell_operations():
    empty = S2R2Rect.empty()
    _cell_ops(empty, Cell(int(cellid.from_face(3)[()])), 0)

    r4 = _rect(0, 0, 0.5, 0.5)
    _cell_ops(r4, _cell_fpl(0, 0, 0), 3)
    _cell_ops(r4, _cell_fpl(0, 0, 1), 4)
    _cell_ops(r4, _cell_fpl(1, 0, 1), 0)

    r5 = _rect(0, 0.45, 0.5, 0.55)
    _cell_ops(r5, _cell_fpl(0, 0, 0), 3)
    _cell_ops(r5, _cell_fpl(0, 0, 1), 3)
    _cell_ops(r5, _cell_fpl(1, 0, 1), 0)

    _cell_ops(_rect(0.51, 0.51, 0.51, 0.51),
              Cell(int(cellid.from_face(0)[()])), 3)

    _cell_ops(_rect(0.01, 1.001, 0.02, 1.002),
              Cell(int(cellid.from_face(0)[()])), 0)

    _cell_ops(_rect(0.99, -0.01, 1.01, 0.01),
              _cell_fpl(0, (~np.uint64(0)) >> np.uint64(cellid.FACE_BITS), 5),
              3)


def test_get_face():
    assert _get_face((1, 0.1, -0.1)) == 0
    assert _get_face((-1, 0.1, -0.1)) == 3
    assert _get_face((0.1, 2, -0.1)) == 1
    assert _get_face((0.1, -2, -0.1)) == 4
    assert _get_face((0.1, 0.2, 3)) == 2
    assert _get_face((0.1, 0.2, -3)) == 5


def test_coverer_integration():
    """An S2R2Rect satisfies the coverer protocol: covering cells are
    on face 0 and cover the rect's cap."""
    from s2spark.kernels.coverer import RegionCoverer
    r = _rect(0.3, 0.3, 0.45, 0.6)
    cov = RegionCoverer(max_cells=12).get_covering(r)
    assert 0 < len(cov) <= 12
    for c in cov:
        assert Cell(int(c)).face == 0
    # every covering cell may-intersect the rect
    for c in cov:
        assert r.may_intersect_cell(Cell(int(c)))
