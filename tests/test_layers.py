"""Point-layer boolean operations (kernels/layers.py) against the
reference's own fixtures (s2boolean_operation_test.cc:228-404):
PointPoint, Point{Open,SemiOpen,Closed}Polyline (+ the
polyline_loops_have_boundaries=False variant), PointPolygonInterior,
and Point{Open,SemiOpen,Closed}PolygonVertex."""

import numpy as np
import pytest

from s2spark.kernels import layers as ly
from s2spark.kernels.loops import Loop, parse_vertices as pv


def _pts(text):
    if not text.strip():
        return np.empty((0, 3))
    return np.concatenate([pv(t.strip()) for t in text.split("|")])


def _keys(arr):
    return sorted(tuple(p) for p in np.asarray(arr))


def _expect(got, want_text):
    assert _keys(got) == _keys(_pts(want_text))


OPS = ("union", "intersection", "difference", "symmetric_difference")


def test_point_point():
    a = _pts("0:0 | 1:0")
    b = _pts("0:0 | 2:0")
    # point layer of each op: A's survivors (+ B's for union/Δ)
    _expect(np.concatenate([
        ly.point_boolean(a, b, "union", "points"),
        ly.point_boolean(b, a, "union", "points")]), "1:0 | 2:0")
    _expect(np.concatenate([
        ly.point_boolean(a, b, "intersection", "points"),
        ly.point_boolean(b, a, "intersection", "points")]),
        "0:0 | 0:0")
    _expect(ly.point_boolean(a, b, "difference", "points"), "1:0")
    _expect(np.concatenate([
        ly.point_boolean(a, b, "symmetric_difference", "points"),
        ly.point_boolean(b, a, "symmetric_difference", "points")]),
        "1:0 | 2:0")


PLINES = ["0:0, 1:0, 2:0", "3:0, 3:0", "4:0, 5:0, 4:0"]
POINTS = "0:0 | 1:0 | 2:0 | 3:0 | 4:0 | 5:0"


@pytest.mark.parametrize("model,boundaries,inter,rest", [
    # PointOpenPolyline (loops_have_boundaries=True)
    ("open", True, "1:0 | 5:0", "0:0 | 2:0 | 3:0 | 4:0"),
    # PointOpenPolylineLoopBoundariesFalse
    ("open", False, "1:0 | 4:0 | 5:0", "0:0 | 2:0 | 3:0"),
    # PointSemiOpenPolyline (both boundary settings)
    ("semi_open", True, "0:0 | 1:0 | 4:0 | 5:0", "2:0 | 3:0"),
    ("semi_open", False, "0:0 | 1:0 | 4:0 | 5:0", "2:0 | 3:0"),
    # PointClosedPolyline
    ("closed", True, POINTS, ""),
    ("closed", False, POINTS, ""),
])
def test_point_polyline_models(model, boundaries, inter, rest):
    pts = _pts(POINTS)
    plines = [pv(t) for t in PLINES]
    _expect(ly.point_boolean(pts, plines, "intersection", "polyline",
                             polyline_model=model,
                             loops_have_boundaries=boundaries), inter)
    for op in ("union", "difference", "symmetric_difference"):
        _expect(ly.point_boolean(pts, plines, op, "polyline",
                                 polyline_model=model,
                                 loops_have_boundaries=boundaries),
                rest)


def test_point_polygon_interior():
    a = _pts("1:1 | 4:4")
    b = [Loop(pv("0:0, 0:3, 3:0"))]
    for model in ("open", "semi_open", "closed"):
        _expect(ly.point_boolean(a, b, "intersection", "polygon",
                                 polygon_model=model), "1:1")
        for op in ("union", "difference", "symmetric_difference"):
            _expect(ly.point_boolean(a, b, op, "polygon",
                                     polygon_model=model), "4:4")


def test_point_polygon_vertex_models():
    """The two probe vertices are chosen so SEMI_OPEN contains exactly
    one (the reference asserts polygon.Contains(0:1) and
    !polygon.Contains(1:0))."""
    a = _pts("0:1 | 1:0")
    b = [Loop(pv("0:0, 0:1, 1:0"))]
    semi = ly.polygon_contains_points_model(b, a, "semi_open")
    assert list(semi) == [True, False]
    # OPEN: vertices not contained
    _expect(ly.point_boolean(a, b, "intersection", "polygon",
                             polygon_model="open"), "")
    _expect(ly.point_boolean(a, b, "union", "polygon",
                             polygon_model="open"), "0:1 | 1:0")
    # SEMI_OPEN: exactly one contained
    _expect(ly.point_boolean(a, b, "intersection", "polygon",
                             polygon_model="semi_open"), "0:1")
    _expect(ly.point_boolean(a, b, "difference", "polygon",
                             polygon_model="semi_open"), "1:0")
    # CLOSED: both contained
    _expect(ly.point_boolean(a, b, "intersection", "polygon",
                             polygon_model="closed"), "0:1 | 1:0")
    _expect(ly.point_boolean(a, b, "union", "polygon",
                             polygon_model="closed"), "")


def test_point_on_edge_interior_contained_all_models():
    """Points strictly interior to a polyline edge are contained in
    every model; polygon boundary-edge interior points follow the
    polygon model."""
    import math

    from s2spark.kernels.region import latlng_to_point
    # equator polyline 0:0 -> 0:2; probe at 0:1 (exactly on the edge:
    # the equator is a great circle)
    pline = pv("0:0, 0:2")
    mid = np.asarray(latlng_to_point(0.0, math.radians(1.0)))
    for model in ly.POLYLINE_MODELS:
        assert ly.polyline_contains_point(pline, mid, model)
    # polygon with an equator edge: interior edge point follows model
    poly = [Loop(pv("0:0, 0:2, 2:2, 2:0"))]
    got = {m: bool(ly.polygon_contains_points_model(
        poly, mid[None], m)[0]) for m in ("open", "semi_open",
                                          "closed")}
    assert got["open"] is False
    assert got["closed"] is True


# -- polyline x polyline boolean ops
# (s2boolean_operation_test.cc:406-785) --

def _pl_lines(text):
    return [pv(t.strip()) for t in text.split("|")] if text.strip() \
        else []


def _pl_fmt(out):
    import math

    from s2spark.kernels.region import _latitude, _longitude
    return sorted(
        ", ".join(f"{round(math.degrees(_latitude(p)), 6):g}:"
                  f"{round(math.degrees(_longitude(p)), 6):g}"
                  for p in c) for c in out)


def _pl_check(a, b, op, want, model="semi_open", boundaries=True):
    got = _pl_fmt(ly.polyline_polyline_boolean(
        _pl_lines(a), _pl_lines(b), op, model, boundaries))
    assert got == _pl_fmt(_pl_lines(want)), (op, model, got)


PLV_A = "0:0, 0:1, 0:2 | 0:3, 0:4, 0:3"
PLV_B = ("0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 "
         "| 1:3, 0:3, 1:3 | 0:4, 1:4, 0:4")
PLV_ALL = PLV_A + " | " + PLV_B


def test_polyline_vertex_open():
    _pl_check(PLV_A, PLV_B, "union", PLV_ALL, "open")
    _pl_check(PLV_A, PLV_B, "intersection",
              "0:1, 0:1 | 0:1, 0:1", "open")
    _pl_check(PLV_A, PLV_B, "difference", PLV_A, "open")
    _pl_check(PLV_A, PLV_B, "symmetric_difference", PLV_ALL, "open")


def test_polyline_vertex_open_loop_boundaries_false():
    _pl_check(PLV_A, PLV_B, "intersection",
              "0:1, 0:1 | 0:1, 0:1 | 0:3, 0:3 | 0:3, 0:3 "
              "| 0:4, 0:4 | 0:4, 0:4", "open", False)


@pytest.mark.parametrize("boundaries", [True, False])
def test_polyline_vertex_semi_open(boundaries):
    _pl_check(PLV_A, PLV_B, "intersection",
              "0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
              "| 0:3, 0:3 | 0:3, 0:3 | 0:4, 0:4 | 0:4, 0:4",
              "semi_open", boundaries)


def test_polyline_vertex_closed():
    _pl_check(PLV_A, PLV_B, "intersection",
              "0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
              "| 0:2, 0:2 | 0:2, 0:2 | 0:3, 0:3 | 0:3, 0:3 | 0:3, 0:3 "
              "| 0:4, 0:4 | 0:4, 0:4 | 0:4, 0:4", "closed")
    _pl_check(PLV_A, PLV_B, "intersection",
              "0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
              "| 0:2, 0:2 | 0:2, 0:2 | 0:3, 0:3 | 0:3, 0:3 "
              "| 0:4, 0:4 | 0:4, 0:4", "closed", False)


PLO_A = "0:0, 1:0, 2:0, 2:5 | 3:0, 3:0 | 6:0, 5:0, 4:0"
PLO_B = "0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0"


def test_polyline_edge_overlap():
    """Same/reverse/degenerate coincident edges: model-independent,
    both sides' portions emitted, duplicates kept."""
    _pl_check(PLO_A, PLO_B, "union", PLO_A + " | " + PLO_B, "open")
    _pl_check(PLO_A, PLO_B, "intersection",
              "0:0, 1:0, 2:0 | 0:0, 1:0, 2:0 | 3:0, 3:0 | 3:0, 3:0 "
              "| 5:0, 4:0 | 4:0, 5:0", "open")
    _pl_check(PLO_A, PLO_B, "difference", "2:0, 2:5 | 6:0, 5:0",
              "open")
    _pl_check(PLO_A, PLO_B, "symmetric_difference",
              "2:0, 2:5 | 6:0, 5:0", "open")


PLL_A = "0:0, 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2, 2:2"
PLL_B = "0:0, 0:0 | 0:0, 0:1 | 2:2, 2:2 | 2:2, 3:2"


@pytest.mark.parametrize("model,inter,sym", [
    ("open", "0:0, 0:1 | 0:0, 0:1 | 2:2, 3:2 | 3:2, 2:2",
     "0:1, 1:0, 0:0 | 0:0, 0:0 | 2:2, 2:3, 3:2 | 2:2, 2:2"),
    ("semi_open",
     "0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 | 2:2, 2:2 | 2:2, 2:2 "
     "| 2:2, 3:2 | 3:2, 2:2",
     "0:1, 1:0, 0:0 | 2:2, 2:3, 3:2"),
    ("closed",
     "0:0, 0:0 | 0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 | 2:2, 2:2 "
     "| 2:2, 2:2 | 2:2, 3:2 | 3:2, 2:2",
     "0:1, 1:0, 0:0 | 2:2, 2:3, 3:2"),
])
def test_polyline_loop_multiple(model, inter, sym):
    """Loops sharing degenerate AND real edges with another layer —
    the intricate per-occurrence multiplicity rules."""
    _pl_check(PLL_A, PLL_B, "union", PLL_A + " | " + PLL_B, model)
    _pl_check(PLL_A, PLL_B, "intersection", inter, model)
    _pl_check(PLL_A, PLL_B, "difference",
              "0:1, 1:0, 0:0 | 2:2, 2:3, 3:2", model)
    _pl_check(PLL_A, PLL_B, "symmetric_difference", sym, model)


def test_polyline_edge_crossing():
    """Transverse crossing: both polylines split at the shared
    bit-identical intersection point; the intersection is two
    degenerate polylines there."""
    a, b = _pl_lines("0:0, 2:2"), _pl_lines("2:0, 0:2")
    inter = ly.polyline_polyline_boolean(a, b, "intersection")
    assert len(inter) == 2
    assert all(len(c) == 2 and np.array_equal(c[0], c[1])
               for c in inter)
    assert np.array_equal(inter[0][0], inter[1][0])
    union = ly.polyline_polyline_boolean(a, b, "union")
    assert sorted(len(c) for c in union) == [3, 3]
    diff = ly.polyline_polyline_boolean(a, b, "difference")
    assert len(diff) == 1 and len(diff[0]) == 3


# -- polyline x polygon WITH degenerate vertex outputs
# (PolylineEdge*PolygonEdgeOverlap + PolylineVertex*PolygonVertex,
# s2boolean_operation_test.cc:561-836) --

def _pp_check(a, b_loops, op, want, pg="semi_open"):
    got = _pl_fmt(ly.polyline_polygon_boolean(
        _pl_lines(a), b_loops, op, polygon_model=pg))
    assert got == _pl_fmt(_pl_lines(want)), (op, pg, got)


PPE_A = "1:1, 1:3, 3:3 | 3:3, 1:3"


def test_polyline_polygon_edge_overlap_with_degeneracies():
    b = [Loop(pv("1:1, 1:3, 3:3, 3:1"))]
    # SEMI_OPEN: the reference's exact outputs including the
    # zero-length polylines at uncontained vertices
    semi_rest = "1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3"
    _pp_check(PPE_A, b, "union", semi_rest)
    _pp_check(PPE_A, b, "intersection", "1:3, 1:3 | 1:1, 1:3, 3:3")
    _pp_check(PPE_A, b, "difference", semi_rest)
    _pp_check(PPE_A, b, "symmetric_difference", semi_rest)
    # OPEN / CLOSED (edge-level, no degeneracies arise)
    _pp_check(PPE_A, b, "union", PPE_A, "open")
    _pp_check(PPE_A, b, "intersection", "", "open")
    _pp_check(PPE_A, b, "intersection", PPE_A, "closed")
    _pp_check(PPE_A, b, "difference", "", "closed")


PPV_POLY = ("0:0, 0:1, 0:2, 0:3, 0:4, 0:5, "
            "5:5, 5:4, 5:3, 5:2, 5:1, 5:0")
PPV_A = ("1:1, 0:1 | 0:2, 1:2 | -1:3, 0:3 | 0:4, -1:4 "
         "| 6:1, 5:1 | 5:2, 6:2 | 4:3, 5:3 | 5:4, 4:4")


@pytest.mark.parametrize("pg,inter,rest", [
    ("open",
     "1:1, 0:1 | 0:2, 1:2 | 4:3, 5:3 | 5:4, 4:4",
     "0:1, 0:1 | 0:2, 0:2 | -1:3, 0:3 | 0:4, -1:4 "
     "| 6:1, 5:1 | 5:2, 6:2 | 5:3, 5:3 | 5:4, 5:4"),
    ("semi_open",
     "1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4 "
     "| 4:3, 5:3 | 5:4, 4:4",
     "-1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2 "
     "| 5:3, 5:3 | 5:4, 5:4"),
    ("closed",
     "1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4 "
     "| 5:1, 5:1 | 5:2, 5:2 | 4:3, 5:3 | 5:4, 4:4",
     "-1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2"),
])
def test_polyline_vertex_polygon_vertex_models(pg, inter, rest):
    """Polylines starting/ending on polygon vertices whose semi-open
    membership differs (lat-0 vertices closed, lat-5 open), incident
    edges inside or outside — the full PolylineVertex*PolygonVertex
    batteries including degenerate outputs."""
    b = [Loop(pv(PPV_POLY))]
    _pp_check(PPV_A, b, "intersection", inter, pg)
    for op in ("union", "difference", "symmetric_difference"):
        _pp_check(PPV_A, b, op, rest, pg)


# -- boolean predicates (Equals / ContainsEmptyAndFull /
#    IntersectsEmptyAndFull, s2boolean_operation_test.cc:2272-2304) --

def test_boolean_predicates_empty_and_full():
    from s2spark.kernels import builder as bld
    GC = ly.GeometryCollection
    empty = GC()
    full = GC(region=bld.FULL)
    pt = GC(points=pv("0:0"))
    line = GC(lines=[pv("0:0, 1:1")])
    tri = GC(region=[Loop(pv("0:0, 0:1, 1:0"))])
    # Equals
    assert ly.boolean_equals(empty, GC())
    assert ly.boolean_equals(full, GC(region=bld.FULL))
    for g in (pt, line, tri):
        assert not ly.boolean_equals(g, empty)
        assert not ly.boolean_equals(g, full)
    assert not ly.boolean_equals(empty, full)
    # Contains on empty/full
    assert ly.boolean_contains(empty, empty)
    assert not ly.boolean_contains(empty, full)
    assert ly.boolean_contains(full, empty)
    assert ly.boolean_contains(full, full)
    # Intersects on empty/full
    assert not ly.boolean_intersects(empty, empty)
    assert not ly.boolean_intersects(empty, full)
    assert not ly.boolean_intersects(full, empty)
    assert ly.boolean_intersects(full, full)


def test_boolean_predicates_mixed_dimensions():
    GC = ly.GeometryCollection
    tri = GC(region=[Loop(pv("0:0, 0:1, 1:0"))])
    big = GC(region=[Loop(pv("-1:-1, -1:2, 2:2, 2:-1"))])
    assert ly.boolean_contains(big, tri)
    assert not ly.boolean_contains(tri, big)
    assert ly.boolean_intersects(big, tri)
    assert ly.boolean_intersects(tri, GC(points=pv("0.2:0.2")))
    assert not ly.boolean_intersects(
        tri, GC(points=pv("5:5")))
    assert ly.boolean_contains(big, GC(lines=[pv("0:0, 1:1")]))
    assert not ly.boolean_contains(tri, GC(lines=[pv("0:0, 5:5")]))
    assert ly.boolean_intersects(tri, GC(lines=[pv("0:0, 5:5")]))
    # rotation-invariant region equality
    assert ly.boolean_equals(
        tri, GC(region=[Loop(pv("0:1, 1:0, 0:0"))]))
    assert not ly.boolean_equals(
        tri, GC(region=[Loop(pv("0.1:0.1, 0.1:1, 1:0.1"))]))
