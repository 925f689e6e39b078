"""Shape adaptor batteries — the reference's
s2shapeutil_edge_iterator_test.cc index fixtures, s2wrapped_shape_test
.cc Coverage, and the S2PointLoopSpan double-index contract
(s2point_span.h:39-61), run against the kernel adaptors."""

import numpy as np
import pytest

from s2spark.kernels.shapeutil import (WrappedShape, chain_edge,
                                       chain_position, edge_iterator,
                                       loop_span_vertex, shape_chains,
                                       shape_edge, shape_num_edges)
from s2spark.kernels.validation import parse_index


def _flat_edges(shapes):
    """GetEdges (s2shapeutil_edge_iterator_test.cc:37-46): every
    shape's edges via the per-shape edge accessor, in shape order."""
    out = []
    for sid, shape in enumerate(shapes):
        for eid in range(shape_num_edges(shape)):
            out.append((sid, eid) + tuple(
                tuple(v) for v in shape_edge(shape, eid)))
    return out


def _verify(text):
    """Verify (s2shapeutil_edge_iterator_test.cc:49-68): the iterator
    visits exactly the flat edge list, with per-shape edge ids that
    reset at shape boundaries."""
    shapes = parse_index(text)
    expected = _flat_edges(shapes)
    got = [(sid, eid, tuple(v0), tuple(v1))
           for sid, eid, v0, v1 in edge_iterator(shapes)]
    assert got == expected
    # edge ids restart per shape and increase contiguously
    last = {}
    for sid, eid, _, _ in got:
        assert eid == last.get(sid, -1) + 1
        last[sid] = eid


class TestEdgeIterator:
    # s2shapeutil_edge_iterator_test.cc:72-100 fixtures verbatim
    def test_empty(self):
        _verify("##")

    def test_points(self):
        _verify("0:0|1:1##")

    def test_lines(self):
        _verify("#0:0,10:10|5:5,5:10|1:2,2:1#")

    def test_polygons(self):
        _verify("##10:10,10:0,0:0|-10:-10,-10:0,0:0,0:-10")

    def test_collection(self):
        _verify("1:1|7:2#1:1,2:2,3:3|2:2,1:7#"
                "10:10,10:0,0:0;20:20,20:10,10:10|15:15,15:0,0:0")

    def test_none_shape_skipped(self):
        # removed shapes are nullptr slots in the reference index
        shapes = parse_index("0:0##")
        rows = list(edge_iterator([None] + shapes))
        assert [(sid, eid) for sid, eid, _, _ in rows] == [(1, 0)]


class TestWrappedShape:
    def test_coverage(self):
        # s2wrapped_shape_test.cc Coverage: every accessor delegates
        # ("0:0; 1:1, 1:2, 2:1" = lax polygon, point loop + triangle)
        [shape] = parse_index("##0:0;1:1,1:2,2:1")
        w = WrappedShape(shape)
        assert w.dim == shape.dim
        assert w.is_full == shape.is_full
        assert shape_chains(w) == shape_chains(shape)
        assert shape_num_edges(w) == shape_num_edges(shape)
        for eid in range(shape_num_edges(shape)):
            assert chain_position(w, eid) == chain_position(shape, eid)
            for a, b in zip(shape_edge(w, eid), shape_edge(shape, eid)):
                assert np.array_equal(a, b)
        assert w.edges() == shape.edges()


class TestChainEdge:
    def test_dim0_multi_chain_flat_numbering(self):
        # dim-0 chain ids run across ALL vertex arrays (one chain per
        # point, s2shape.h dim-0 convention)
        shapes = parse_index("0:0|1:1|2:2##")
        [shape] = shapes
        for ci, (start, ln) in enumerate(shape_chains(shape)):
            assert ln == 1
            v0, v1 = chain_edge(shape, ci, 0)
            assert np.array_equal(v0, v1)

    def test_polygon_wraps(self):
        [shape] = parse_index("##0:0,0:4,4:4")
        v0, v1 = chain_edge(shape, 0, 2)  # last edge wraps to vertex 0
        assert np.array_equal(v1, shape.chains[0][0])


class TestLoopSpan:
    def test_double_index(self):
        v = np.arange(15, dtype=np.float64).reshape(5, 3)
        for i in range(5):
            assert np.array_equal(loop_span_vertex(v, i), v[i])
            assert np.array_equal(loop_span_vertex(v, i + 5), v[i])

    def test_out_of_range(self):
        v = np.arange(9, dtype=np.float64).reshape(3, 3)
        with pytest.raises(IndexError):
            loop_span_vertex(v, 6)
        with pytest.raises(IndexError):
            loop_span_vertex(v, -1)
