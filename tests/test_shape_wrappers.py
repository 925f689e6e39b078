"""Batteries for the thin shape wrappers: S2PointVectorShape /
S2EdgeVectorShape / S2LaxLoopShape / S2LaxClosedPolylineShape /
S2VertexIdLaxLoopShape constructors (s2lax_loop_shape_test.cc,
s2edge_vector_shape_test.cc) and the S2PointRegion region
(s2point_region_test.cc)."""
import numpy as np
import pytest

from s2spark.kernels import cellid
from s2spark.kernels import shapeutil as su
from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.region import Cell, PointRegion


def test_point_vector_shape():
    pts = parse_vertices("11:11, 10:0, 5:5")
    s = su.point_vector_shape(pts)
    assert s.dim == 0
    assert su.shape_num_edges(s) == 3
    assert len(su.shape_chains(s)) == 3  # one chain per point
    assert su.count_vertices([s]) == 3
    assert np.array_equal(su.shape_to_points(s), pts)
    empty = su.point_vector_shape(np.zeros((0, 3)))
    assert su.shape_num_edges(empty) == 0


def test_edge_vector_shape():
    pts = parse_vertices("0:0, 1:1, 2:2, 3:3")
    s = su.edge_vector_shape([(pts[0], pts[1]), (pts[2], pts[3])])
    assert s.dim == 1
    assert su.shape_num_edges(s) == 2
    assert su.shape_chains(s) == [(0, 1), (1, 1)]  # one chain per edge
    # edges don't wrap (each chain is open with one edge)
    assert su.next_edge_wrap(s, 0) == -1
    assert su.prev_edge_wrap(s, 0) == -1
    assert su.next_edge_wrap(s, 1) == -1
    # CountVertices: edges + chains for dim 1
    assert su.count_vertices([s]) == 4


def test_lax_loop_shape():
    # EmptyLoop (s2lax_loop_shape_test.cc)
    empty = su.lax_loop_shape(np.zeros((0, 3)))
    assert empty.dim == 2
    assert su.shape_num_edges(empty) == 0
    assert su.shape_chains(empty) == []

    # NonEmptyLoop: n vertices -> n edges, 1 chain
    verts = parse_vertices("0:0, 0:1, 1:1, 1:0")
    s = su.lax_loop_shape(verts)
    assert su.shape_num_edges(s) == 4
    assert su.shape_chains(s) == [(0, 4)]
    assert su.count_vertices([s]) == 4
    # edges wrap (closed chain)
    assert su.next_edge_wrap(s, 3) == 0
    assert su.prev_edge_wrap(s, 0) == 3

    # one-vertex loop = one degenerate edge
    s1 = su.lax_loop_shape(verts[:1])
    assert su.shape_num_edges(s1) == 1


def test_lax_closed_polyline_shape():
    verts = parse_vertices("0:0, 0:1, 1:1, 1:0")
    s = su.lax_closed_polyline_shape(verts)
    assert s.dim == 1
    # closing edge materialized: 4 edges over 5 stored vertices
    assert su.shape_num_edges(s) == 4
    # wraps like a closed polyline
    assert su.next_edge_wrap(s, 3) == 0
    assert su.prev_edge_wrap(s, 0) == 3


def test_vertex_id_lax_loop_shape():
    # EdgeAccess (s2lax_loop_shape_test.cc VertexIdLaxLoopShape):
    # vertex ids reference an external array, possibly reordered
    arr = parse_vertices("0:0, 0:1, 1:1, 1:0")
    s = su.vertex_id_lax_loop_shape([0, 3, 2, 1], arr)
    assert s.dim == 2
    assert su.shape_num_edges(s) == 4
    loops = su.shape_to_polygon(s)
    assert np.array_equal(loops[0], arr[[0, 3, 2, 1]])
    # empty id list -> empty shape
    assert su.shape_num_edges(
        su.vertex_id_lax_loop_shape([], arr)) == 0


def test_point_region_basics():
    p = tuple(parse_vertices("40:-100")[0])
    r = PointRegion(p)
    assert r.contains_point(p)
    q = tuple(parse_vertices("40:-101")[0])
    assert not r.contains_point(q)

    cap = r.get_cap_bound()
    assert cap.center == p and cap.radius2 == 0.0
    rb = r.get_rect_bound()
    assert rb.contains_point(p)

    # cell union bound is the leaf cell of the point
    leaf = int(cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))[0])
    assert r.get_cell_union_bound() == [leaf]

    # contains no cell; may-intersect exactly the ancestor cells
    for lev in (0, 5, 15, 30):
        cid = int(cellid.parent(np.array([leaf], dtype=np.uint64),
                                lev)[0])
        cell = Cell(cid)
        assert not r.contains_cell(cell)
        assert r.may_intersect_cell(cell)
    # a far-away cell does not intersect
    far = Cell(int(cellid.from_xyz(np.array([-p[0]]), np.array([-p[1]]),
                                   np.array([-p[2]]))[0]))
    assert not r.may_intersect_cell(far)


def test_point_region_coverer():
    from s2spark.kernels.coverer import RegionCoverer
    p = tuple(parse_vertices("12:34")[0])
    r = PointRegion(p)
    cov = RegionCoverer(max_cells=4).get_covering(r)
    assert len(cov) >= 1
    # the covering contains the point's leaf cell range
    leaf = int(cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))[0])
    lo = [int(cellid.range_min(np.array([c], dtype=np.uint64))[0])
          for c in cov]
    hi = [int(cellid.range_max(np.array([c], dtype=np.uint64))[0])
          for c in cov]
    assert any(a <= leaf <= b for a, b in zip(lo, hi))
