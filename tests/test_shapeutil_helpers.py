"""Reference batteries for the S2Shape chain helpers in shapeutil.py:
edge wrap (s2shapeutil_edge_wrap_test.cc), edge/vertex counts
(s2shapeutil_count_edges_test.cc / count_vertices_test.cc), shape
conversions (s2shapeutil_conversion_test.cc) and brute-force point
containment (s2shapeutil_contains_brute_force_test.cc)."""
import math

import numpy as np
import pytest

from s2spark.kernels import shapeutil as su
from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.validation import VShape, parse_index


def _shape(text, i=0):
    return parse_index(text)[i]


# --- edge wrap (s2shapeutil_edge_wrap_test.cc:31-78) -----------------

def test_next_prev_edge_point_does_not_wrap():
    shape = _shape("1:1 | 2:2 ##")
    assert su.prev_edge_wrap(shape, 0) == -1
    assert su.next_edge_wrap(shape, 0) == -1
    assert su.prev_edge_wrap(shape, 1) == -1
    assert su.next_edge_wrap(shape, 1) == -1


def test_next_prev_edge_open_polyline_does_not_wrap():
    shape = _shape("# 1:1, 2:2, 3:3 #")
    assert su.prev_edge_wrap(shape, 0) == -1
    assert su.next_edge_wrap(shape, 0) == 1
    assert su.prev_edge_wrap(shape, 1) == 0
    assert su.next_edge_wrap(shape, 1) == -1


def test_next_prev_edge_closed_polyline_wraps():
    shape = _shape("# 0:0, 1:1, 0:2, -1:1, 0:0 #")
    assert su.prev_edge_wrap(shape, 0) == 3
    assert su.next_edge_wrap(shape, 0) == 1
    assert su.prev_edge_wrap(shape, 3) == 2
    assert su.next_edge_wrap(shape, 3) == 0


def test_next_prev_edge_polygon_wraps():
    shape = _shape("## 0:0, 1:1, 0:2, -1:1")
    assert su.prev_edge_wrap(shape, 0) == 3
    assert su.next_edge_wrap(shape, 0) == 1
    assert su.prev_edge_wrap(shape, 3) == 2
    assert su.next_edge_wrap(shape, 3) == 0


def test_multi_loop_polygon_wrap_stays_in_chain():
    shape = _shape("## 0:0, 0:1, 1:1; 5:5, 5:6, 6:6, 6:5")
    # chain 0: edges 0-2, chain 1: edges 3-6
    assert su.next_edge_wrap(shape, 2) == 0
    assert su.prev_edge_wrap(shape, 3) == 6
    assert su.next_edge_wrap(shape, 6) == 3


# --- counts (count_edges / count_vertices test fixtures) -------------

def test_count_edges_and_vertices():
    # three points
    shapes = parse_index("1:1 | 2:2 | 3:3 # #")
    assert su.count_edges(shapes) == 3
    assert su.count_vertices(shapes) == 3

    # two points + a two-edge polyline
    shapes = parse_index("1:1 | 2:2 # 3:3, 4:4, 5:5 #")
    assert su.count_edges(shapes) == 4
    assert su.count_vertices(shapes) == 5

    # + a four-edge polygon
    shapes = parse_index("1:1 | 2:2 # 3:3, 4:4, 5:5 # 6:6, 7:7, 8:8, 9:9")
    assert su.count_edges(shapes) == 8
    assert su.count_vertices(shapes) == 9

    # degenerate polylines count vertices = edges + chains
    shapes = parse_index("# 3:3, 3:3, 3:3 #")
    assert su.count_vertices(shapes) == 3

    # degenerate polygons: vertices = edges
    shapes = parse_index("# # 4:4, 4:4, 4:4, 4:4")
    assert su.count_vertices(shapes) == 4


def test_count_edges_up_to_stops_early():
    shapes = parse_index("# 0:0, 0:1, 0:2, 0:3 # 1:1, 1:2, 2:2, 2:1")
    assert su.count_edges(shapes) == 7
    # stops after the first shape crosses the threshold
    assert su.count_edges(shapes, max_edges=2) == 3


# --- conversions (s2shapeutil_conversion_test.cc:43-130) -------------

def test_point_vector_shape_to_points():
    pts = parse_vertices("11:11, 10:0, 5:5")
    shape = VShape(0, [pts[i:i + 1] for i in range(3)])
    out = su.shape_to_points(shape)
    assert out.shape == (3, 3)
    assert np.array_equal(out, pts)


def test_line_to_polyline():
    pts = parse_vertices("11:11, 10:0, 5:5")
    shape = VShape(1, [pts])
    out = su.shape_to_polyline(shape)
    assert out.shape == (3, 3)
    assert np.array_equal(out, pts)


def test_closed_line_to_polyline():
    pts = parse_vertices("0:0, 0:10, 10:10, 0:0")
    out = su.shape_to_polyline(VShape(1, [pts]))
    assert out.shape == (4, 3)
    assert np.array_equal(out, pts)


def test_polyline_conversion_rejects_bad_shapes():
    with pytest.raises(ValueError):
        su.shape_to_polyline(VShape(0, [parse_vertices("1:1")]))
    with pytest.raises(ValueError):
        su.shape_to_polyline(
            VShape(1, [parse_vertices("1:1, 2:2"),
                       parse_vertices("3:3, 4:4")]))
    with pytest.raises(ValueError):
        su.shape_to_polyline(VShape(1, []))


@pytest.mark.parametrize("text,nloops,nverts", [
    ("0:0, 0:10, 10:10, 10:0; 4:4, 6:4, 6:6, 4:6", 2, 8),
    ("0:0, 0:2, 2:2, 2:0; 0:4, 0:6, 3:6", 2, 7),
    ("0:0, 0:10, 10:10, 10:0; 1:1, 3:3, 1:3; 2:6, 4:7, 2:8", 3, 10),
])
def test_polygon_conversion(text, nloops, nverts):
    shape = _shape("## " + text)
    loops = su.shape_to_polygon(shape)
    assert len(loops) == nloops
    assert sum(len(lp) for lp in loops) == nverts
    for lp, want in zip(loops, [parse_vertices(t)
                                for t in text.split(";")]):
        assert np.array_equal(lp, want)


# --- contains_brute_force ---------------------------------------------

def test_no_interior():
    # dim-1 shapes have no interior (contains_brute_force_test.cc:36-43)
    shape = _shape("# 0:0, 0:1, 1:-1, -1:-1, -0.000000001:1 #")
    pt = parse_vertices("0:0")
    assert not su.contains_brute_force(shape, pt)[0]


def test_polygon_contains_interior_points():
    shape = _shape("## 0:0, 0:10, 10:10, 10:0")  # CCW square
    inside = parse_vertices("5:5, 1:1, 9:9")
    outside = parse_vertices("-5:5, 5:-5, 11:11, 85:5")
    assert su.contains_brute_force(shape, inside).all()
    assert not su.contains_brute_force(shape, outside).any()


def test_polygon_with_hole():
    shape = _shape("## 0:0, 0:10, 10:10, 10:0; 4:4, 4:6, 6:6, 6:4")
    # CCW hole in lax semantics = odd parity region subtracted
    ring = parse_vertices("2:2, 2:8, 8:2")
    hole = parse_vertices("5:5")
    assert su.contains_brute_force(shape, ring).all()
    assert not su.contains_brute_force(shape, hole).any()


def test_full_and_empty_polygons():
    full = _shape("## full")
    pts = parse_vertices("0:0, 45:45, -89:170")
    assert su.contains_brute_force(full, pts).all()
    empty = VShape(2, [])
    assert not su.contains_brute_force(empty, pts).any()


def test_consistent_with_loop_parity():
    """ConsistentWithS2Loop: a 100-vertex regular ring near the pole —
    brute force agrees with single-loop oriented containment for every
    vertex probe (boundary convention included)."""
    from s2spark.kernels.loops import Loop
    from s2spark.kernels.pointutil import tangent_frame

    center = parse_vertices("89:-179")[0]
    e1, e2 = tangent_frame(center)
    e1, e2 = e1[0], e2[0]
    r = math.radians(10.0)
    ang = np.linspace(0, 2 * math.pi, 100, endpoint=False)
    verts = (math.cos(r) * center[None, :]
             + math.sin(r) * (np.cos(ang)[:, None] * e1[None, :]
                              + np.sin(ang)[:, None] * e2[None, :]))
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    shape = VShape(2, [verts])
    got = su.contains_brute_force(shape, verts)
    want = Loop(verts).contains_points(verts).astype(bool)
    # single CCW loop: lax parity == loop containment directly
    assert np.array_equal(got, want)
    # and the center is inside, its antipode is not
    assert su.contains_brute_force(shape, center[None, :])[0]
    assert not su.contains_brute_force(shape, -center[None, :])[0]


def test_chain_position_roundtrip():
    shape = _shape("## 0:0, 0:1, 1:1; 5:5, 5:6, 6:6, 6:5")
    chains = su.shape_chains(shape)
    assert chains == [(0, 3), (3, 4)]
    for e in range(su.shape_num_edges(shape)):
        ci, off = su.chain_position(shape, e)
        assert chains[ci][0] + off == e


def test_contains_point_query_vertex_models():
    """S2ContainsPointQuery vertex-model battery
    (s2contains_point_query_test.cc:55-124): index = point 0:0,
    polyline -1:1→1:1, triangle (0:5, 0:7, 2:6)."""
    from s2spark.kernels.loops import parse_vertices as pv
    from s2spark.kernels.shapeutil import (contains_point_query,
                                           lax_loop_shape,
                                           point_vector_shape)
    from s2spark.kernels.validation import VShape

    shapes = [point_vector_shape(pv("0:0")),
              VShape(1, [pv("-1:1, 1:1")]),
              lax_loop_shape(pv("0:5, 0:7, 2:6"))]

    def contains(txt, model):
        p = pv(txt)[0]
        return any(contains_point_query(s, p, model) for s in shapes)

    # OPEN
    for txt in ("0:0", "-1:1", "1:1", "0:2", "0:3", "0:5", "0:7",
                "2:6", "10:10"):
        assert not contains(txt, "open"), txt
    assert contains("1:6", "open")
    assert not contains_point_query(shapes[1], pv("1:6")[0], "open")
    assert contains_point_query(shapes[2], pv("1:6")[0], "open")
    assert not contains_point_query(shapes[2], pv("0:5")[0], "open")
    assert not contains_point_query(shapes[2], pv("0:7")[0], "open")

    # SEMI_OPEN: exactly one triangle vertex (0:7) is contained
    for txt in ("0:0", "-1:1", "1:1", "0:2", "0:5", "2:6", "10:10"):
        assert not contains(txt, "semi_open"), txt
    assert contains("0:7", "semi_open")
    assert contains("1:6", "semi_open")
    assert not contains_point_query(shapes[1], pv("1:6")[0],
                                    "semi_open")
    assert contains_point_query(shapes[2], pv("1:6")[0], "semi_open")
    assert not contains_point_query(shapes[2], pv("0:5")[0],
                                    "semi_open")
    assert contains_point_query(shapes[2], pv("0:7")[0], "semi_open")

    # CLOSED: every vertex of every shape
    for txt in ("0:0", "-1:1", "1:1", "0:5", "0:7", "2:6", "1:6"):
        assert contains(txt, "closed"), txt
    for txt in ("0:2", "10:10"):
        assert not contains(txt, "closed"), txt
    assert not contains_point_query(shapes[1], pv("1:6")[0], "closed")
    assert contains_point_query(shapes[2], pv("1:6")[0], "closed")
    assert contains_point_query(shapes[2], pv("0:5")[0], "closed")
    assert contains_point_query(shapes[2], pv("0:7")[0], "closed")


def test_incident_edges_reference():
    """s2contains_point_query_test.cc:196-220 (VisitIncidentEdges):
    index = points {0:0, 1:1}, polyline 1:1→1:2, triangle
    (1:2, 1:3, 2:2)."""
    from s2spark.kernels.loops import parse_vertices as pv
    from s2spark.kernels.shapeutil import (incident_edges,
                                           lax_loop_shape,
                                           point_vector_shape)
    from s2spark.kernels.validation import VShape
    shapes = [point_vector_shape(pv("0:0, 1:1")),
              VShape(1, [pv("1:1, 1:2")]),
              lax_loop_shape(pv("1:2, 1:3, 2:2"))]
    assert incident_edges(shapes, pv("0:0")[0]) == [(0, 0)]
    assert incident_edges(shapes, pv("1:1")[0]) == [(0, 1), (1, 0)]
    assert incident_edges(shapes, pv("1:2")[0]) == \
        [(1, 0), (2, 0), (2, 2)]
    assert incident_edges(shapes, pv("1:3")[0]) == [(2, 0), (2, 1)]
    assert incident_edges(shapes, pv("2:2")[0]) == [(2, 1), (2, 2)]
