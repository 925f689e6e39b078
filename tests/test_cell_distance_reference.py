"""S2Cell distance API vs the reference's brute-force verifiers.

Mirrors s2cell_test.cc GetDistanceToPoint / GetDistanceToEdge /
GetMaxDistanceToEdge / GetMaxDistanceToCell(Antipodal) (s2cell_test.cc:
523-716): each battery re-derives the expected value with the same
brute-force formulation the reference uses (UpdateMin/MaxDistance over
the four boundary edges, expanded Contains for the zero checks) and
compares the engine's decision-tree implementation against it.  The
random sampling uses our own deterministic generator, not the
reference's seeds — the contract is the tolerance envelope, not the
sample set.
"""
import math

import numpy as np
import pytest

from s2spark.kernels import cellid
from s2spark.kernels.edges import point_segment_chord2
from s2spark.kernels.predicates import crossing_sign
from s2spark.kernels.region import (
    Cell, _edge_angle_distance, _neg, _seg_max_angle, chord2,
    chord2_to_angle)


def _rng():
    return np.random.default_rng(20260820)


def _rand_point(rng) -> tuple:
    v = rng.normal(size=3)
    v /= np.linalg.norm(v)
    return tuple(float(x) for x in v)


def _rand_cell(rng, level=None) -> Cell:
    if level is None:
        level = 30 if rng.random() < 0.5 else int(rng.integers(0, 30))
    p = _rand_point(rng)
    leaf = int(cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))[0])
    cid = int(cellid.parent(np.array([leaf], dtype=np.uint64), level)[0])
    return Cell(cid)


def _sample_in_cap(rng, center, radius_rad) -> tuple:
    """Uniform point in a spherical cap around center (own formulation)."""
    # orthonormal frame around center
    c = np.asarray(center, dtype=np.float64)
    a = np.array([1.0, 0.0, 0.0]) if abs(c[0]) < 0.9 else \
        np.array([0.0, 1.0, 0.0])
    x = np.cross(c, a)
    x /= np.linalg.norm(x)
    y = np.cross(c, x)
    h = 1 - math.cos(min(radius_rad, math.pi))
    cos_t = 1 - rng.random() * h
    sin_t = math.sqrt(max(0.0, 1 - cos_t * cos_t))
    phi = rng.random() * 2 * math.pi
    p = cos_t * c + sin_t * (math.cos(phi) * x + math.sin(phi) * y)
    p /= np.linalg.norm(p)
    return tuple(float(t) for t in p)


def _interpolate(a, b, t: float) -> tuple:
    """S2::Interpolate along the great circle through a, b (supports
    extrapolation t > 1)."""
    aa = np.asarray(a, dtype=np.float64)
    bb = np.asarray(b, dtype=np.float64)
    theta = math.atan2(np.linalg.norm(np.cross(aa, bb)), float(aa @ bb))
    if theta == 0.0:
        return tuple(float(x) for x in aa)
    # tangent direction at a toward b
    tan = bb - float(aa @ bb) * aa
    tan /= np.linalg.norm(tan)
    ang = t * theta
    p = math.cos(ang) * aa + math.sin(ang) * tan
    p /= np.linalg.norm(p)
    return tuple(float(x) for x in p)


def _verts(cell: Cell):
    return [cell.get_vertex(k) for k in range(4)]


def _seg_min_angle(x, a, b) -> float:
    return _edge_angle_distance(x, a, b)


# --- brute-force verifiers (s2cell_test.cc:523-560, 605-646) -------------

def _brute_boundary(cell: Cell, p) -> float:
    v = _verts(cell)
    return min(_seg_min_angle(p, v[i], v[(i + 1) % 4]) for i in range(4))


def _brute_max_point(cell: Cell, p) -> float:
    if cell.contains_point(_neg(p)):
        return math.pi
    v = _verts(cell)
    return max(_seg_max_angle(p, v[i], v[(i + 1) % 4]) for i in range(4))


def _brute_min_edge(cell: Cell, a, b) -> float:
    if cell.contains_point(a) or cell.contains_point(b):
        return 0.0
    v = _verts(cell)
    best = math.inf
    for i in range(4):
        v0, v1 = v[i], v[(i + 1) % 4]
        cs = int(crossing_sign(np.asarray([a]), np.asarray([b]),
                               np.asarray([v0]), np.asarray([v1]))[0])
        if cs >= 0:
            return 0.0
        best = min(best, _seg_min_angle(a, v0, v1),
                   _seg_min_angle(b, v0, v1), _seg_min_angle(v0, a, b))
    return best


def _brute_max_edge(cell: Cell, a, b) -> float:
    na, nb = _neg(a), _neg(b)
    if cell.contains_point(na) or cell.contains_point(nb):
        return math.pi
    v = _verts(cell)
    best = 0.0
    for i in range(4):
        v0, v1 = v[i], v[(i + 1) % 4]
        cs = int(crossing_sign(np.asarray([na]), np.asarray([nb]),
                               np.asarray([v0]), np.asarray([v1]))[0])
        if cs >= 0:
            return math.pi
        best = max(best, _seg_max_angle(a, v0, v1),
                   _seg_max_angle(b, v0, v1), _seg_max_angle(v0, a, b))
    return best


# --- batteries -----------------------------------------------------------

def test_get_distance_to_point():
    rng = _rng()
    for _ in range(400):
        cell = _rand_cell(rng)
        p = _rand_point(rng)
        expected_boundary = _brute_boundary(cell, p)
        expected_interior = (0.0 if cell.contains_point(p)
                             else expected_boundary)
        expected_max = _brute_max_point(cell, p)
        assert cell.get_boundary_distance(p) == \
            pytest.approx(expected_boundary, abs=1e-12)
        assert cell.get_distance(p) == \
            pytest.approx(expected_interior, abs=1e-12)
        assert cell.get_max_distance(p) == \
            pytest.approx(expected_max, abs=1e-12)
        # tight envelope away from the pi/2 and pi error peaks
        if expected_boundary <= math.pi / 3:
            assert cell.get_boundary_distance(p) == \
                pytest.approx(expected_boundary, abs=1e-15)
            assert cell.get_distance(p) == \
                pytest.approx(expected_interior, abs=1e-15)
        if expected_max <= math.pi / 3:
            assert cell.get_max_distance(p) == \
                pytest.approx(expected_max, abs=1e-15)


def _choose_edge_near_cell(rng, cell: Cell):
    """ChooseEdgeNearCell (s2cell_test.cc:583-603): endpoints biased to
    the cell's neighborhood, occasional antipodal flips."""
    center = cell.get_center()
    # cap radius ~ half the rect diagonal, conservative
    radius = max(1e-6, _brute_boundary(cell, _neg(center)))
    cap_radius = math.pi - radius  # circumradius-ish envelope
    if rng.random() < 0.2:
        a = _rand_point(rng)
    else:
        a = _sample_in_cap(rng, center, min(1.5 * cap_radius, math.pi))
    max_len = min(10.0 ** rng.uniform(-2, 2) * cap_radius, math.pi / 2)
    b = _sample_in_cap(rng, a, max_len)
    if rng.random() < 0.05:
        a, b = _neg(a), _neg(b)
    return a, b


def test_get_distance_to_edge():
    rng = _rng()
    for _ in range(400):
        cell = _rand_cell(rng)
        a, b = _choose_edge_near_cell(rng, cell)
        expected_min = _brute_min_edge(cell, a, b)
        expected_max = _brute_max_edge(cell, a, b)
        actual_min = cell.get_distance_edge(a, b)
        actual_max = cell.get_max_distance_edge(a, b)
        if expected_min > math.pi / 2:
            assert actual_min == pytest.approx(expected_min, abs=3e-8)
        elif expected_min <= math.pi / 3:
            assert actual_min == pytest.approx(expected_min, abs=1e-15)
        else:
            assert actual_min == pytest.approx(expected_min, abs=1e-12)
        assert actual_max == pytest.approx(expected_max, abs=1e-12)
        if expected_max <= math.pi / 3:
            assert actual_max == pytest.approx(expected_max, abs=1e-15)


def test_get_max_distance_to_edge_antipodal_crossing():
    """s2cell_test.cc:686-698: an edge whose antipode crosses the cell."""
    cell = Cell(int(cellid.from_face_pos_level(0, 0, 20)))
    center = cell.get_center()
    a = _neg(_interpolate(center, cell.get_vertex(0), 2.0))
    b = _neg(_interpolate(center, cell.get_vertex(2), 2.0))
    assert _brute_max_edge(cell, a, b) == pytest.approx(math.pi, abs=1e-15)
    assert cell.get_max_distance_edge(a, b) == \
        pytest.approx(math.pi, abs=1e-15)


def test_get_max_distance_to_cell_antipodal():
    """s2cell_test.cc:700-707."""
    p = (1.0, 0.0, 0.0)
    leaf = int(cellid.from_xyz(np.array([1.0]), np.array([0.0]),
                               np.array([0.0]))[0])
    anti = int(cellid.from_xyz(np.array([-1.0]), np.array([0.0]),
                               np.array([0.0]))[0])
    assert Cell(leaf).get_max_distance_cell(Cell(anti)) == math.pi
    del p


def test_get_max_distance_to_cell_consistency():
    """s2cell_test.cc:701-716: GetMaxDistance(cell) ~ pi -
    GetDistance(antipodal cell)."""
    rng = _rng()
    for _ in range(200):
        cell = _rand_cell(rng)
        test_cell = _rand_cell(rng)
        c = test_cell.get_center()
        anti_leaf = int(cellid.from_xyz(
            np.array([-c[0]]), np.array([-c[1]]), np.array([-c[2]]))[0])
        anti = Cell(int(cellid.parent(
            np.array([anti_leaf], dtype=np.uint64), test_cell.level)[0]))
        d_from_min = math.pi - cell.get_distance_cell(anti)
        d_from_max = cell.get_max_distance_cell(test_cell)
        assert d_from_max == pytest.approx(d_from_min, abs=1e-8)


def test_get_distance_to_cell_basic():
    rng = _rng()
    # containment and shared-boundary cases are exactly zero
    for _ in range(50):
        cell = _rand_cell(rng, level=int(rng.integers(1, 20)))
        child = Cell(int(cellid.child(
            np.array([cell.id], dtype=np.uint64),
            int(rng.integers(0, 4)))[0]))
        assert cell.get_distance_cell(child) == 0.0
        assert child.get_distance_cell(cell) == 0.0
    # disjoint cells: verify against an independent 32-pair enumeration
    for _ in range(100):
        a = _rand_cell(rng, level=int(rng.integers(2, 25)))
        b = _rand_cell(rng, level=int(rng.integers(2, 25)))
        ids_a = np.array([a.id], dtype=np.uint64)
        ids_b = np.array([b.id], dtype=np.uint64)
        if bool(cellid.intersects(ids_a, ids_b)[0]):
            assert a.get_distance_cell(b) == 0.0
            continue
        if a.face == b.face and a._uv_intersects(b):
            assert a.get_distance_cell(b) == 0.0
            continue
        va, vb = _verts(a), _verts(b)
        best = math.inf
        for i in range(4):
            for j in range(4):
                best = min(best,
                           _seg_min_angle(va[i], vb[j], vb[(j + 1) % 4]),
                           _seg_min_angle(vb[i], va[j], va[(j + 1) % 4]))
        assert a.get_distance_cell(b) == pytest.approx(best, abs=1e-15)


def test_point_segment_chord2_consistency():
    """The chord^2 kernel agrees with the angle formulation used by the
    brute verifiers (sanity tie between the two distance stacks)."""
    rng = _rng()
    for _ in range(200):
        x, a, b = _rand_point(rng), _rand_point(rng), _rand_point(rng)
        c2 = float(point_segment_chord2(
            np.asarray([x]), np.asarray([a]), np.asarray([b]))[0])
        assert chord2_to_angle(c2) == \
            pytest.approx(_seg_min_angle(x, a, b), abs=1e-14)
        assert chord2(x, a) >= 0.0
