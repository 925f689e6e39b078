"""MutableShapeIndex parity battery — the reference's
mutable_s2shape_index_test.cc fixtures (NoEdges, OneEdge,
ShrinkToFitOptimization, LoopsSpanningThreeFaces, ManyIdenticalEdges,
DegenerateEdge, ManyTinyEdges, MixedGeometry) with the reference's own
QuadraticValidate: every index cell and every skipped cell is checked
edge-by-edge (ClipToPaddedFace + IntersectsRect with the ±error-band
padding, mutable_s2shape_index_test.cc:101-140) and interior-by-
interior (ContainsBruteForce at cell centers)."""

import numpy as np
import pytest

from s2spark.kernels import cellid, cellunion, pointutil
from s2spark.kernels.clipping import clip_to_padded_face
from s2spark.kernels.r2rect import R2Rect
from s2spark.kernels.range_iterator import (DISJOINT, INDEXED,
                                            CellRangeIterator)
from s2spark.kernels.shape_index import (CELL_PADDING,
                                         INTERSECTS_RECT_ERROR_UV_DIST,
                                         MutableShapeIndex,
                                         intersects_rect_batch)
from s2spark.kernels.padded_cell import PaddedCell
from s2spark.kernels.shapeutil import (contains_brute_force,
                                       edge_vector_shape,
                                       lax_loop_shape, shape_edge,
                                       shape_num_edges)
from s2spark.kernels.validation import parse_index


def _face_of(cid):
    return int(cellid.to_face_ij_orientation(
        np.array([cid], dtype=np.uint64))[0][0])


def _validate_edge(a, b, cid, index_has_edge):
    """ValidateEdge (mutable_s2shape_index_test.cc:101-112): membership
    re-derived with padding tightened/loosened by the IntersectsRect
    error band must match the index."""
    padding = CELL_PADDING + (
        1 if index_has_edge else -1) * INTERSECTS_RECT_ERROR_UV_DIST
    bound = PaddedCell(cid, 0.0).bound.expanded(padding)
    seg = clip_to_padded_face(a, b, _face_of(cid), padding)
    present = seg is not None and bool(intersects_rect_batch(
        np.asarray([seg[0]]), np.asarray([seg[1]]),
        bound.x.lo, bound.x.hi, bound.y.lo, bound.y.hi)[0])
    assert present == index_has_edge, (a, b, hex(cid))


def _center(cid):
    x, y, z = cellid.to_point(np.array([cid], dtype=np.uint64))
    return np.array([x[0], y[0], z[0]])


def _validate_interior(shape, cid, index_contains_center):
    if shape is None:
        assert not index_contains_center
        return
    assert bool(contains_brute_force(
        shape, _center(cid)[None])[0]) == index_contains_center, hex(cid)


def quadratic_validate(index: MutableShapeIndex):
    """QuadraticValidate (mutable_s2shape_index_test.cc:130-...):
    sweep the entire sphere as (index cells + skipped gaps)."""
    ids = index.cell_ids()
    cells = index.cells()
    # begin/end of the full leaf range across the 6 faces
    min_leaf = int(cellid.range_min(
        cellid.from_face(np.array([0])))[0])
    end_leaf = (int(cellid.range_max(
        cellid.from_face(np.array([5])))[0]) + 2) & (2**64 - 1)
    min_cellid = min_leaf
    for i in range(len(ids) + 1):
        if i < len(ids):
            cid = int(ids[i])
            arr = np.array([cid], dtype=np.uint64)
            assert int(cellid.range_min(arr)[0]) >= min_cellid
            skipped = cellunion.from_begin_end(
                min_cellid, int(cellid.range_min(arr)[0]))
            min_cellid = (int(cellid.range_max(arr)[0]) + 2) \
                & (2**64 - 1)
            cell = cells[i]
        else:
            skipped = cellunion.from_begin_end(min_cellid, end_leaf)
            cid, cell = None, None
        for sid in range(index.num_shape_ids()):
            shape = index.shape(sid)
            clipped = cell.find_clipped(sid) if cell else None
            for sk in skipped:
                _validate_interior(shape, int(sk), False)
            if cell is not None:
                _validate_interior(
                    shape, cid,
                    bool(clipped and clipped.contains_center))
            if shape is None:
                assert clipped is None
                continue
            for e in range(shape_num_edges(shape)):
                v0, v1 = shape_edge(shape, e)
                for sk in skipped:
                    _validate_edge(v0, v1, int(sk), False)
                if cell is not None:
                    _validate_edge(
                        v0, v1, cid,
                        bool(clipped and clipped.contains_edge(e)))


def _regular_loop(center, radius_rad, n):
    return pointutil.make_regular_loop(center, radius_rad, n)


def _concentric_loops(center, num_loops, num_vertices):
    """S2Testing::ConcentricLoopsPolygon (s2testing.cc:109-128)."""
    out = []
    for li in range(num_loops):
        radius = 0.005 * (li + 1) / num_loops
        pts = np.stack([
            radius * np.cos(2 * np.pi * np.arange(num_vertices)
                            / num_vertices),
            radius * np.sin(2 * np.pi * np.arange(num_vertices)
                            / num_vertices),
            np.ones(num_vertices)], axis=1)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        m = pointutil.get_frame(np.asarray(center, dtype=np.float64))
        out.append(pointutil.from_frame(m, pts))
    return out


class TestMutableShapeIndex:
    def test_no_edges(self):
        index = MutableShapeIndex()
        assert len(index.cell_ids()) == 0
        it = index.range_iterator()
        assert it.done()

    def test_one_edge(self):
        index = MutableShapeIndex()
        assert index.add(edge_vector_shape(
            [(np.array([1.0, 0, 0]), np.array([0, 1.0, 0]))])) == 0
        quadratic_validate(index)

    def test_shrink_to_fit_optimization(self):
        # mutable_s2shape_index_test.cc:466-478: an 89-degree loop
        # whose edges all fall in one subcell; all other cells of the
        # face must still carry interior entries
        loop = _regular_loop(
            np.array([1.0, 0.5, 0.5]) / np.linalg.norm([1, 0.5, 0.5]),
            np.radians(89), 100)
        index = MutableShapeIndex([lax_loop_shape(loop)])
        quadratic_validate(index)

    def test_loops_spanning_three_faces(self):
        # two concentric 100-vertex loops around the cube corner at
        # the Hilbert curve start (test .cc:480-494)
        center = np.array([1.0, -1.0, -1.0]) / np.sqrt(3)
        index = MutableShapeIndex(
            [lax_loop_shape(lp)
             for lp in _concentric_loops(center, 2, 100)])
        quadratic_validate(index)
        # geometry spans exactly three faces
        faces = {_face_of(int(c)) for c in index.cell_ids()}
        assert len(faces) == 3

    def test_many_identical_edges(self):
        # 100 copies of a face-diagonal edge -> no subdivision
        a = np.array([0.99, 0.99, 1.0])
        a /= np.linalg.norm(a)
        b = np.array([-0.99, -0.99, 1.0])
        b /= np.linalg.norm(b)
        index = MutableShapeIndex()
        for i in range(100):
            assert index.add(edge_vector_shape([(a, b)])) == i
        quadratic_validate(index)
        for c in index.cell_ids():
            assert int(cellid.level(
                np.array([c], dtype=np.uint64))[0]) == 0

    def test_degenerate_edge(self):
        # a degenerate edge at a cube-face vertex -> exactly 3 leaf
        # index cells (test .cc:514-532)
        a = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
        index = MutableShapeIndex([edge_vector_shape([(a, a)])])
        quadratic_validate(index)
        ids = index.cell_ids()
        assert len(ids) == 3
        for i, c in enumerate(ids):
            assert bool(cellid.is_leaf(
                np.array([c], dtype=np.uint64))[0])
            cell = index.cells()[i]
            assert cell.num_clipped() == 1
            assert cell.clipped[0].num_edges() == 1

    def test_many_tiny_edges(self):
        # 100 edges inside one leaf cell -> exactly one leaf index
        # cell (subdivision stops at the max level)
        x, y, z = cellid.to_point(cellid.from_xyz(
            np.array([1.0]), np.array([0.0]), np.array([0.0])))
        a = np.array([x[0], y[0], z[0]])
        b = a + np.array([0, 1e-12, 0])
        b /= np.linalg.norm(b)
        index = MutableShapeIndex(
            [edge_vector_shape([(a, b)] * 100)])
        quadratic_validate(index)
        ids = index.cell_ids()
        assert len(ids) == 1
        assert bool(cellid.is_leaf(
            np.array([ids[0]], dtype=np.uint64))[0])

    def test_mixed_geometry(self):
        # polylines + a leaf-cell loop; face 1 is untouched and must
        # have no index cells (test .cc:693-711)
        from s2spark.kernels.region import Cell
        shapes = parse_index(
            "#0:0,2:1,0:2,2:3,0:4,2:5,0:6"
            "|1:0,3:1,1:2,3:3,1:4,3:5,1:6"
            "|2:0,4:1,2:2,4:3,2:4,4:5,2:6#")
        leaf = int(cellid.range_min(cellid.from_face(np.array([0])))[0])
        cell = Cell(leaf)
        loop = np.stack([np.asarray(cell.get_vertex(k))
                         for k in range(4)])
        index = MutableShapeIndex(shapes + [lax_loop_shape(loop)])
        it = index.range_iterator()
        face1 = int(cellid.from_face(np.array([1]))[0])
        assert it.locate(face1) == DISJOINT

    def test_release_leaves_stable_ids(self):
        shapes = parse_index("0:0|5:5##")
        index = MutableShapeIndex(shapes)
        s2 = index.add(parse_index("##0:0,0:4,4:4,4:0")[0])
        index.release(0)
        quadratic_validate(index)
        assert index.shape(0) is None
        assert index.shape(s2) is not None

    def test_contains_point_matches_brute(self):
        # index-accelerated PIP == brute parity on a doughnut + a
        # disjoint triangle, probing a lat/lng grid
        shapes = parse_index(
            "##10:10,10:-10,-10:-10,-10:10;4:4,-4:4,-4:-4,4:-4"
            "|30:30,30:40,40:40")
        # annulus: reverse the hole (odd nesting depth)
        from s2spark.kernels.shapeutil import nested_loops_to_lax
        from s2spark.kernels.loops import Loop
        lax = nested_loops_to_lax([Loop(c) for c in shapes[0].chains])
        from s2spark.kernels.validation import VShape
        shapes[0] = VShape(2, [lp.vertices for lp in lax])
        index = MutableShapeIndex(shapes)
        lats = np.arange(-15, 46, 3, dtype=np.float64)
        lngs = np.arange(-15, 46, 3, dtype=np.float64)
        for lat in lats:
            for lng in lngs:
                phi, lam = np.radians(lat), np.radians(lng)
                p = np.array([np.cos(phi) * np.cos(lam),
                              np.cos(phi) * np.sin(lam),
                              np.sin(phi)])
                got = index.contains_point(p)
                for sid, shape in enumerate(shapes):
                    want = bool(contains_brute_force(shape, p[None])[0])
                    assert got[sid] == want, (lat, lng, sid)


class TestCellUnionFromBeginEnd:
    def test_full_face(self):
        f = cellid.from_face(np.array([4]))
        u = cellunion.from_min_max(int(cellid.range_min(f)[0]),
                                   int(cellid.range_max(f)[0]))
        assert len(u) == 1 and int(u[0]) == int(f[0])

    def test_empty_range(self):
        leaf = int(cellid.range_min(cellid.from_face(np.array([0])))[0])
        assert len(cellunion.from_begin_end(leaf, leaf)) == 0

    def test_coverage_and_normalization(self):
        leaf = int(cellid.range_min(cellid.from_face(np.array([2])))[0])
        u = cellunion.from_begin_end(leaf + 2 * 7, leaf + 2 * 7777)
        assert cellunion.is_normalized(u)
        assert cellunion.leaf_cells_covered(u) == 7770
        # cells are disjoint and sorted
        rmin = cellid.range_min(u)
        rmax = cellid.range_max(u)
        assert np.all(rmax[:-1] < rmin[1:])


class TestEncodeDecode:
    def _roundtrip(self, index):
        """TestEncodeDecode (mutable_s2shape_index_test.cc:124-131):
        the index survives the EncodedS2ShapeIndex wire format."""
        from s2spark.kernels import codecs
        cells = [(int(cid) & (2**64 - 1),
                  [(c.shape_id, c.contains_center, list(c.edges))
                   for c in cell.clipped])
                 for cid, cell in zip(index.cell_ids(), index.cells())]
        buf = codecs.encode_shape_index(cells, index.num_shape_ids())
        max_edges, back = codecs.decode_shape_index(
            buf, index.num_shape_ids())
        assert max_edges == index.max_edges_per_cell
        assert len(back) == len(cells)
        for (cid, cl), (cid2, cl2) in zip(cells, back):
            assert cid == cid2
            assert [(s, bool(cc), list(es)) for s, cc, es in cl] == \
                   [(s, bool(cc), list(es)) for s, cc, es in cl2]

    def test_loops_roundtrip(self):
        center = np.array([1.0, -1.0, -1.0]) / np.sqrt(3)
        index = MutableShapeIndex(
            [lax_loop_shape(lp)
             for lp in _concentric_loops(center, 2, 32)])
        self._roundtrip(index)

    def test_mixed_roundtrip(self):
        shapes = parse_index("1:1|2:2#0:0,4:4#10:10,10:20,20:20")
        self._roundtrip(MutableShapeIndex(shapes))


class TestFromMinMaxReference:
    """s2cell_union_test.cc FromMinMax/FromBeginEnd verbatim."""

    @staticmethod
    def _check(min_id, max_id):
        # TestFromMinMax: normalized, covers exactly [min, max] leaves
        u = cellunion.from_min_max(min_id, max_id)
        assert len(u) > 0
        assert cellunion.is_normalized(u)
        assert int(cellid.range_min(u[:1])[0]) == min_id
        assert int(cellid.range_max(u[-1:])[0]) == max_id
        # contiguous: each cell starts right after the previous ends
        rmin = cellid.range_min(u)
        rmax = cellid.range_max(u)
        assert np.all(rmin[1:] == rmax[:-1] + np.uint64(2))

    def test_first_and_last_cells(self):
        f0 = cellid.from_face(np.array([0]))
        lo, hi = int(cellid.range_min(f0)[0]), int(cellid.range_max(f0)[0])
        self._check(lo, lo)
        self._check(lo, hi)
        f5 = cellid.from_face(np.array([5]))
        lo5, hi5 = int(cellid.range_min(f5)[0]), int(cellid.range_max(f5)[0])
        self._check(lo5, hi5)
        self._check(hi5, hi5)

    def test_random_leaf_ranges(self):
        rng = np.random.default_rng(20260821)
        lo = int(cellid.range_min(cellid.from_face(np.array([0])))[0])
        hi = int(cellid.range_max(cellid.from_face(np.array([5])))[0])
        n_leaves = (hi - lo) // 2 + 1
        for _ in range(100):
            a, b = sorted(int(v) for v in
                          rng.integers(0, n_leaves, size=2))
            self._check(lo + 2 * a, lo + 2 * b)

    def test_from_begin_end_empty_and_full(self):
        begin = int(cellid.range_min(cellid.from_face(np.array([0])))[0])
        end = (int(cellid.range_max(
            cellid.from_face(np.array([5])))[0]) + 2) & (2**64 - 1)
        assert len(cellunion.from_begin_end(begin, begin)) == 0
        assert len(cellunion.from_begin_end(end, end)) == 0
        full = cellunion.from_begin_end(begin, end)
        assert len(full) == 6
        assert all(bool(cellid.is_face(
            np.array([c], dtype=np.uint64))[0]) for c in full)
