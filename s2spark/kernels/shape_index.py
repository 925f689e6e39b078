"""MutableS2ShapeIndex analogue — the reference's adaptive cell
decomposition of a mixed-dimension shape collection
(mutable_s2shape_index.h:107-210, mutable_s2shape_index.cc:1240-1850).

Each index cell holds, per intersecting shape, a "clipped shape": the
edge ids whose padded UV clip intersects the cell, plus a
contains_center bit (polygon interior contains the cell center).  The
build follows the reference's rules exactly:

  * edges are clipped ONCE per face with ``CELL_PADDING`` =
    2*(kFaceClipErrorUVCoord + kEdgeClipErrorUVCoord)
    (mutable_s2shape_index.cc:184-185), and cell membership is the
    straight-UV segment × padded-cell-rect test (IntersectsRect,
    s2edge_clipping.cc) — so query-time clipping needs no padding;
  * per face the recursion starts at PaddedCell.shrink_to_fit of the
    union bound of all face edges, with the skipped leaf ranges
    emitted as interior candidates (mutable_s2shape_index.cc:
    1265-1281 ShrinkToFit + SkipCellRange);
  * a cell subdivides only while it holds more than
    ``max_edges_per_cell`` edges that are "short" at its level —
    edge max level = AVG_EDGE.get_level_for_max_value(|a-b| *
    cell_size_to_long_edge_ratio) (GetEdgeMaxLevel, .cc:1167-1180) —
    and the short count exceeds max(max_edges_per_cell,
    min_short_edge_fraction * (edges + containing shapes)), the
    linear-size guarantee of MakeIndexCell (.cc:1785-1801);
  * cells with no edges appear iff some polygon interior contains
    their center (the ShrinkToFitOptimization invariant).

Instead of the reference's incremental along-curve InteriorTracker,
contains_center bits are computed in one vectorized post-pass per
dim-2 shape over all result-cell centers (shapeutil.
contains_brute_force) — bit-identical by the tracker's own invariant
(the tests' ValidateInterior definition).

Mutations (add / release) invalidate the cells and rebuild lazily on
the next query — same semantics as the reference's lazy ApplyUpdates,
minus the batched incremental merge (a memory optimization for
single-node million-edge updates; the engine's million-shape regime
is the distributed build in ops/pip.py, which produces these same
rows as DataFrames).

The distributed twin of this kernel is ops/pip.build_edge_index
(_distributed): identical cell/edge rows at scale, partitioned by
cell prefix.  This class is the single-node/driver face used by
builder layers, codecs, and queries over collection literals.
"""

from __future__ import annotations

import numpy as np

from . import cellid
from .metrics import AVG_EDGE
from .padded_cell import PaddedCell
from .r2rect import R2Rect
from .range_iterator import DISJOINT, INDEXED, CellRangeIterator

__all__ = ["MutableShapeIndex", "CELL_PADDING", "intersects_rect_batch",
           "FACE_CLIP_ERROR_UV_COORD", "EDGE_CLIP_ERROR_UV_COORD",
           "INTERSECTS_RECT_ERROR_UV_DIST"]

DBL_EPSILON = 2.220446049250313e-16
# s2edge_clipping.h:101,113,152
FACE_CLIP_ERROR_UV_COORD = 9 * (2.0 ** -0.5) * DBL_EPSILON
EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPSILON
INTERSECTS_RECT_ERROR_UV_DIST = 3 * (2.0 ** 0.5) * DBL_EPSILON
# mutable_s2shape_index.cc:184-185
CELL_PADDING = 2 * (FACE_CLIP_ERROR_UV_COORD + EDGE_CLIP_ERROR_UV_COORD)

MAX_EDGES_PER_CELL = 10           # FLAGS_..._default_max_edges_per_cell
CELL_SIZE_TO_LONG_EDGE_RATIO = 1.0
MIN_SHORT_EDGE_FRACTION = 0.2


def intersects_rect_batch(a: np.ndarray, b: np.ndarray,
                          xlo: float, xhi: float,
                          ylo: float, yhi: float) -> np.ndarray:
    """Vectorized IntersectsRect (s2edge_clipping.cc): for each UV
    segment (a[i], b[i]), true iff it intersects the CLOSED rect
    [xlo,xhi]×[ylo,yhi].  Bound test + all-four-vertices-on-one-side
    test via the extreme-vertex projections onto the edge normal.
    Degenerate segments reduce to the bound test (normal = 0 makes
    both projections 0)."""
    ax, ay = a[:, 0], a[:, 1]
    bx, by = b[:, 0], b[:, 1]
    ok = ((np.minimum(ax, bx) <= xhi) & (np.maximum(ax, bx) >= xlo)
          & (np.minimum(ay, by) <= yhi) & (np.maximum(ay, by) >= ylo))
    # n = (b - a).Ortho() = (-(by-ay), bx-ax)
    nx = ay - by
    ny = bx - ax
    vx_hi = np.where(nx >= 0, xhi, xlo)
    vy_hi = np.where(ny >= 0, yhi, ylo)
    vx_lo = np.where(nx >= 0, xlo, xhi)
    vy_lo = np.where(ny >= 0, ylo, yhi)
    d_hi = nx * (vx_hi - ax) + ny * (vy_hi - ay)
    d_lo = nx * (vx_lo - ax) + ny * (vy_lo - ay)
    return ok & (d_hi >= 0) & (d_lo <= 0)


class ClippedShape:
    """S2ClippedShape (s2shape_index.h:123-180): one shape's edge ids
    within an index cell + the contains-center bit."""

    __slots__ = ("shape_id", "contains_center", "edges")

    def __init__(self, shape_id: int, contains_center: bool, edges):
        self.shape_id = shape_id
        self.contains_center = bool(contains_center)
        self.edges = tuple(int(e) for e in edges)

    def num_edges(self) -> int:
        return len(self.edges)

    def contains_edge(self, edge_id: int) -> bool:
        return edge_id in self.edges

    def __repr__(self):  # pragma: no cover
        return (f"ClippedShape({self.shape_id}, "
                f"center={self.contains_center}, edges={self.edges})")


class IndexCell:
    """S2ShapeIndexCell: the clipped shapes of one index cell, in
    shape-id order."""

    __slots__ = ("clipped",)

    def __init__(self, clipped: list[ClippedShape]):
        self.clipped = clipped

    def num_clipped(self) -> int:
        return len(self.clipped)

    def find_clipped(self, shape_id: int) -> ClippedShape | None:
        for c in self.clipped:
            if c.shape_id == shape_id:
                return c
        return None


def _u64(cid: int) -> int:
    return int(cid) & 0xFFFF_FFFF_FFFF_FFFF


class MutableShapeIndex:
    """See module docstring.  Shapes are VShape-compatible values
    (``dim``, ``chains``, ``is_full``, ``edges()``) — everything
    shapeutil's constructors and validation.parse_index produce."""

    def __init__(self, shapes=(),
                 max_edges_per_cell: int = MAX_EDGES_PER_CELL,
                 cell_size_to_long_edge_ratio: float =
                 CELL_SIZE_TO_LONG_EDGE_RATIO,
                 min_short_edge_fraction: float =
                 MIN_SHORT_EDGE_FRACTION):
        self._shapes: list = []
        self.max_edges_per_cell = int(max_edges_per_cell)
        self.cell_size_to_long_edge_ratio = \
            float(cell_size_to_long_edge_ratio)
        self.min_short_edge_fraction = float(min_short_edge_fraction)
        self._ids: np.ndarray | None = None
        self._cells: list[IndexCell] | None = None
        for s in shapes:
            self.add(s)

    # -- mutation (lazy rebuild, mutable_s2shape_index.h Add/Release)

    def add(self, shape) -> int:
        self._shapes.append(shape)
        self._ids = None
        return len(self._shapes) - 1

    def release(self, shape_id: int):
        """Remove the shape; its id slot stays (reference Release
        leaves a nullptr slot so shape ids remain stable)."""
        shape = self._shapes[shape_id]
        self._shapes[shape_id] = None
        self._ids = None
        return shape

    def num_shape_ids(self) -> int:
        return len(self._shapes)

    def shape(self, shape_id: int):
        return self._shapes[shape_id]

    # -- index access

    def cell_ids(self) -> np.ndarray:
        self._maybe_build()
        return self._ids

    def cells(self) -> list[IndexCell]:
        self._maybe_build()
        return self._cells

    def range_iterator(self) -> CellRangeIterator:
        return CellRangeIterator(self.cell_ids())

    def cell_at(self, cid: int) -> IndexCell | None:
        self._maybe_build()
        i = int(np.searchsorted(self._ids, np.uint64(_u64(cid))))
        if i < len(self._ids) and int(self._ids[i]) == _u64(cid):
            return self._cells[i]
        return None

    # -- queries

    def contains_point(self, p, shape_id: int | None = None):
        """Index-accelerated point containment (the
        S2ContainsPointQuery path, s2contains_point_query.h:133-160):
        locate the index cell of the point's leaf, then combine the
        cell's contains_center bit with the edge-or-vertex crossings
        of the segment center→p against the cell's clipped edges of
        each dim-2 shape.  Returns a bool (shape_id given) or the
        per-shape bool list."""
        from . import predicates
        from .shapeutil import shape_edge
        self._maybe_build()
        p = np.asarray(p, dtype=np.float64).reshape(3)
        out = [False] * len(self._shapes)
        if len(self._ids):
            leaf = int(cellid.from_xyz(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0])
            it = self.range_iterator()
            if it.locate_point(leaf):
                cell = self._cells[it.pos]
                center = np.asarray(
                    cellid.to_point(np.array([it.id()],
                                             dtype=np.uint64))
                ).reshape(3)
                for c in cell.clipped:
                    shape = self._shapes[c.shape_id]
                    if shape is None or shape.dim != 2:
                        continue
                    inside = c.contains_center
                    if c.edges:
                        v = np.array([shape_edge(shape, e)
                                      for e in c.edges])
                        m = len(c.edges)
                        signs = predicates.crossing_sign(
                            np.broadcast_to(center, (m, 3)),
                            np.broadcast_to(p, (m, 3)),
                            v[:, 0], v[:, 1])
                        toggles = int(np.count_nonzero(signs > 0))
                        for k in np.nonzero(signs == 0)[0]:
                            if bool(predicates.vertex_crossing(
                                    tuple(center), tuple(p),
                                    tuple(v[k, 0]), tuple(v[k, 1]))):
                                toggles += 1
                        inside ^= bool(toggles & 1)
                    out[c.shape_id] = inside
        if shape_id is not None:
            return out[shape_id]
        return out

    # -- build

    def _maybe_build(self):
        if self._ids is None:
            self._build()

    def _edge_table(self):
        """Flat arrays over every edge of every live shape."""
        sid, eid, va, vb = [], [], [], []
        for s, shape in enumerate(self._shapes):
            if shape is None:
                continue
            for e, (_, _, v0, v1) in enumerate(shape.edges()):
                sid.append(s)
                eid.append(e)
                va.append(v0)
                vb.append(v1)
        if not sid:
            z = np.empty((0, 3))
            return (np.empty(0, np.int64), np.empty(0, np.int64), z, z,
                    np.empty(0, np.int64))
        va = np.asarray(va, dtype=np.float64)
        vb = np.asarray(vb, dtype=np.float64)
        # GetEdgeMaxLevel (mutable_s2shape_index.cc:1167-1180)
        norm = np.linalg.norm(va - vb, axis=1)
        max_lev = np.array([AVG_EDGE.get_level_for_max_value(
            n * self.cell_size_to_long_edge_ratio) for n in norm],
            dtype=np.int64)
        return (np.asarray(sid, np.int64), np.asarray(eid, np.int64),
                va, vb, max_lev)

    def _parity_evaluators(self):
        """Per-dim-2-shape (loops, calibration) pairs, computed ONCE
        per build — the parity calibration probe is O(shape edges) and
        dominates the build if recomputed per subdivision cell."""
        from .loops import Loop
        from .builder import _parity_calibration
        out = {}
        for sid, shape in enumerate(self._shapes):
            if shape is None or shape.dim != 2:
                continue
            if getattr(shape, "is_full", False) and not shape.chains:
                out[sid] = (None, True)
                continue
            if not shape.chains:
                continue
            loops = [Loop(c) for c in shape.chains]
            out[sid] = (loops, _parity_calibration(loops))
        return out

    def _num_containing(self, pcell: PaddedCell, parity) -> int:
        """Upper bound on shapes containing the whole cell: dim-2
        shapes containing the cell's entry vertex (the quantity the
        reference's InteriorTracker supplies to MakeIndexCell)."""
        from .builder import _parity_contains
        v = np.asarray(pcell.get_entry_vertex(),
                       dtype=np.float64).reshape(1, 3)
        n = 0
        for _sid, (loops, calib) in parity.items():
            if loops is None:
                n += 1
            else:
                n += int(_parity_contains(loops, v, calib)[0])
        return n

    def _build(self):
        from .clipping import clip_to_padded_face
        from .builder import _parity_contains
        sid, eid, va, vb, max_lev = self._edge_table()
        mepc = self.max_edges_per_cell
        frac = self.min_short_edge_fraction
        parity = self._parity_evaluators()

        edge_cells: list[tuple[int, np.ndarray]] = []  # (cid, idxs)
        interior_cand: list[int] = []

        for face in range(6):
            keep, auv, buv = [], [], []
            for k in range(len(sid)):
                seg = clip_to_padded_face(va[k], vb[k], face,
                                          CELL_PADDING)
                if seg is not None:
                    keep.append(k)
                    auv.append(seg[0])
                    buv.append(seg[1])
            face_cell = PaddedCell(
                int(cellid.from_face(np.array([face]))[0]),
                CELL_PADDING)
            if not keep:
                interior_cand.append(face_cell.id)
                continue
            keep = np.asarray(keep, np.int64)
            auv = np.asarray(auv, np.float64).reshape(-1, 2)
            buv = np.asarray(buv, np.float64).reshape(-1, 2)

            def visit(pcell: PaddedCell, rows: np.ndarray):
                if rows.size == 0:
                    interior_cand.append(pcell.id)
                    return
                nE = int(rows.size)
                subdivide = False
                if pcell.level < cellid.MAX_LEVEL and nE > mepc:
                    # MakeIndexCell linear-size rule (.cc:1785-1801)
                    short = int(np.count_nonzero(
                        pcell.level < max_lev[keep[rows]]))
                    max_short = max(mepc, int(
                        frac * (nE + self._num_containing(pcell,
                                                          parity))))
                    subdivide = short > max_short
                if not subdivide:
                    edge_cells.append((pcell.id, keep[rows]))
                    return
                a, b = auv[rows], buv[rows]
                for pos in range(4):
                    i, j = pcell.get_child_ij(pos)
                    child = PaddedCell.child(pcell, i, j)
                    m = intersects_rect_batch(
                        a, b, child.bound.x.lo, child.bound.x.hi,
                        child.bound.y.lo, child.bound.y.hi)
                    visit(child, rows[m])

            # per-face ShrinkToFit jump (.cc:1265-1281): start at the
            # smallest cell containing every edge's UV bound, and emit
            # the skipped leaf ranges as interior candidates
            bound = R2Rect.empty()
            for k in range(len(auv)):
                bound = bound.add_rect(
                    R2Rect.from_point_pair(tuple(auv[k]),
                                           tuple(buv[k])))
            shrunk = face_cell.shrink_to_fit(bound)
            all_rows = np.arange(len(keep), dtype=np.int64)
            if shrunk != face_cell.id:
                from .cellunion import from_begin_end
                f_arr = np.array([face_cell.id], dtype=np.uint64)
                s_arr = np.array([shrunk], dtype=np.uint64)
                interior_cand.extend(int(c) for c in from_begin_end(
                    int(cellid.range_min(f_arr)[0]),
                    int(cellid.range_min(s_arr)[0])))
                visit(PaddedCell(shrunk, CELL_PADDING), all_rows)
                interior_cand.extend(int(c) for c in from_begin_end(
                    int(cellid.range_max(s_arr)[0]) + 2,
                    int(cellid.range_max(f_arr)[0]) + 2))
            else:
                visit(face_cell, all_rows)

        # -- post-pass: contains_center bits for every candidate cell
        all_ids = np.array([c for c, _ in edge_cells] + interior_cand,
                           dtype=np.uint64)
        if len(all_ids):
            cx, cy, cz = cellid.to_point(all_ids)
            centers = np.stack([cx, cy, cz], axis=1)
        else:
            centers = np.empty((0, 3))
        inside = {}
        for s, (loops, calib) in parity.items():
            if loops is None:
                inside[s] = np.ones(len(centers), dtype=bool)
            else:
                inside[s] = (_parity_contains(loops, centers, calib)
                             if len(centers) else
                             np.zeros(0, dtype=bool))

        cells: list[tuple[int, IndexCell]] = []
        for n, (cid, rows) in enumerate(edge_cells):
            per_shape: dict[int, list[int]] = {}
            for k in rows:
                per_shape.setdefault(int(sid[k]), []).append(
                    int(eid[k]))
            for s, bits in inside.items():
                if bits[n] and s not in per_shape:
                    per_shape[s] = []
            clipped = [ClippedShape(
                s, bool(inside[s][n]) if s in inside else False,
                sorted(es))
                for s, es in sorted(per_shape.items())]
            cells.append((cid, IndexCell(clipped)))
        base = len(edge_cells)
        for n, cid in enumerate(interior_cand):
            clipped = [ClippedShape(s, True, ())
                       for s, bits in sorted(inside.items())
                       if bits[base + n]]
            if clipped:
                cells.append((cid, IndexCell(clipped)))

        cells.sort(key=lambda kv: _u64(kv[0]))
        self._ids = np.array([c for c, _ in cells], dtype=np.uint64)
        self._cells = [cell for _, cell in cells]


class IndexedShapeRegion:
    """S2ShapeIndexRegion over a MutableShapeIndex
    (s2shape_index_region.h:60-120 and the template implementation):
    every decision is answered FROM THE INDEX CELLS — locate the
    target, then test only the located cell's clipped edges
    (AnyEdgeIntersects = padded UV clip × rect, kMaxError =
    kFaceClipErrorUVCoord + kIntersectsRectErrorUVDist) and the
    contains-center parity walk.  Duck-compatible with the greedy
    RegionCoverer (contains_cell / may_intersect_cell /
    contains_point / get_cell_union_bound), like the brute
    shape_region.ShapeIndexRegion — same answers, O(cell) work per
    probe instead of O(collection)."""

    MAX_ERROR = FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST

    def __init__(self, index: MutableShapeIndex):
        self.index = index
        index._maybe_build()

    # -- internals ----------------------------------------------------

    def _any_edge_intersects(self, clipped: ClippedShape,
                             target_cid: int) -> bool:
        """AnyEdgeIntersects (s2shape_index_region.h tail)."""
        from .clipping import clip_to_padded_face
        from .shapeutil import shape_edge
        if not clipped.edges:
            return False
        pc = PaddedCell(target_cid, 0.0)
        bound = pc.bound.expanded(self.MAX_ERROR)
        shape = self.index.shape(clipped.shape_id)
        for e in clipped.edges:
            v0, v1 = shape_edge(shape, e)
            seg = clip_to_padded_face(v0, v1, pc.face, self.MAX_ERROR)
            if seg is not None and bool(intersects_rect_batch(
                    np.asarray([seg[0]]), np.asarray([seg[1]]),
                    bound.x.lo, bound.x.hi,
                    bound.y.lo, bound.y.hi)[0]):
                return True
        return False

    def _clipped_contains(self, index_cid: int, clipped: ClippedShape,
                          p: np.ndarray) -> bool:
        """ShapeContains (s2contains_point_query.h): parity from the
        index cell's center to p over the clipped edges."""
        from . import predicates
        from .shapeutil import shape_edge
        shape = self.index.shape(clipped.shape_id)
        if shape is None or shape.dim != 2:
            return False
        inside = clipped.contains_center
        if clipped.edges:
            center = _center_of(index_cid)
            v = np.array([shape_edge(shape, e) for e in clipped.edges])
            m = len(clipped.edges)
            signs = predicates.crossing_sign(
                np.broadcast_to(center, (m, 3)),
                np.broadcast_to(p, (m, 3)), v[:, 0], v[:, 1])
            toggles = int(np.count_nonzero(signs > 0))
            for k in np.nonzero(signs == 0)[0]:
                if bool(predicates.vertex_crossing(
                        tuple(center), tuple(p),
                        tuple(v[k, 0]), tuple(v[k, 1]))):
                    toggles += 1
            inside ^= bool(toggles & 1)
        return inside

    @staticmethod
    def _cid_of(cell) -> int:
        return int(getattr(cell, "id", cell))

    # -- S2Region / coverer protocol ----------------------------------

    def contains_cell(self, cell) -> bool:
        """Contains(S2Cell): true iff ANY shape contains the whole
        cell."""
        target = self._cid_of(cell)
        it = self.index.range_iterator()
        if it.locate(target) != INDEXED:
            return False
        cell_ = self.index.cells()[it.pos]
        for clipped in cell_.clipped:
            if it.id() == target:
                if not clipped.edges and clipped.contains_center:
                    return True
            else:
                shape = self.index.shape(clipped.shape_id)
                if (shape is not None and shape.dim == 2
                        and not self._any_edge_intersects(clipped,
                                                          target)
                        and self._clipped_contains(
                            it.id(), clipped, _center_of(target))):
                    return True
        return False

    def may_intersect_cell(self, cell) -> bool:
        target = self._cid_of(cell)
        it = self.index.range_iterator()
        rel = it.locate(target)
        if rel == DISJOINT:
            return False
        if rel != INDEXED:   # SUBDIVIDED
            return True
        if it.id() == target:
            return True
        cell_ = self.index.cells()[it.pos]
        for clipped in cell_.clipped:
            if self._any_edge_intersects(clipped, target):
                return True
            if self._clipped_contains(it.id(), clipped,
                                      _center_of(target)):
                return True
        return False

    def contains_point(self, p) -> bool:
        return any(self.index.contains_point(p))

    def visit_intersecting_shape_ids(self, cell) -> dict[int, bool]:
        """VisitIntersectingShapeIds: {shape_id: contains_target} for
        every shape intersecting the target cell."""
        target = self._cid_of(cell)
        it = self.index.range_iterator()
        rel = it.locate(target)
        out: dict[int, bool] = {}
        if rel == DISJOINT:
            return out
        if rel == INDEXED:
            cell_ = self.index.cells()[it.pos]
            for clipped in cell_.clipped:
                if it.id() == target:
                    contains = (not clipped.edges
                                and clipped.contains_center)
                else:
                    if self._any_edge_intersects(clipped, target):
                        contains = False
                    elif self._clipped_contains(it.id(), clipped,
                                                _center_of(target)):
                        contains = True
                    else:
                        continue  # disjoint
                out[clipped.shape_id] = contains
            return out
        # SUBDIVIDED: a shape contains the target iff it appears with
        # contains_center and no edges in EVERY contained index cell
        arr = np.array([target], dtype=np.uint64)
        rmax = int(cellid.range_max(arr)[0])
        not_contains: dict[int, bool] = {}
        while not it.done() and it.id() <= rmax:
            cell_ = self.index.cells()[it.pos]
            for clipped in cell_.clipped:
                not_contains[clipped.shape_id] = (
                    not_contains.get(clipped.shape_id, False)
                    or bool(clipped.edges)
                    or not clipped.contains_center)
            it.next()
        return {s: not nc for s, nc in not_contains.items()}

    def get_cell_union_bound(self) -> list[int]:
        """GetCellUnionBound: ≤6 cells spanning the index (≤4 when it
        fits one face) — per span chunk, the lowest common ancestor of
        the first/last index cell in the chunk."""
        ids = self.index.cell_ids()
        if len(ids) == 0:
            return []
        first_id, last_id = int(ids[0]), int(ids[-1])
        if first_id == last_id:
            return [first_id]
        lev = int(cellid.common_ancestor_level(
            np.array([first_id], dtype=np.uint64),
            np.array([last_id], dtype=np.uint64))[0]) + 1
        out: list[int] = []
        it = self.index.range_iterator()
        it.begin()

        def parent_at(cid, level):
            if level == 0:
                a = np.array([cid], dtype=np.uint64)
                f = int(cellid.to_face_ij_orientation(a)[0][0])
                return int(cellid.from_face(np.array([f]))[0])
            return int(cellid.parent(
                np.array([cid], dtype=np.uint64), level)[0])

        def cover_range(first, last):
            if first == last:
                out.append(first)
            else:
                cal = int(cellid.common_ancestor_level(
                    np.array([first], dtype=np.uint64),
                    np.array([last], dtype=np.uint64))[0])
                out.append(parent_at(first, cal))

        last_chunk = parent_at(last_id, lev)
        cid = parent_at(int(it.id()), lev)
        while True:
            arr = np.array([cid], dtype=np.uint64)
            rmax = int(cellid.range_max(arr)[0])
            if rmax >= int(it.id()):
                first = int(it.id())
                it.seek((rmax + 2) & 0xFFFF_FFFF_FFFF_FFFF)
                it.prev()
                cover_range(first, int(it.id()))
                it.next()
                if it.done():
                    break
            if cid == last_chunk:
                break
            cid = (cid + ((cid & -cid) << 1)) & 0xFFFF_FFFF_FFFF_FFFF
        return out


def _center_of(cid: int) -> np.ndarray:
    x, y, z = cellid.to_point(np.array([cid], dtype=np.uint64))
    return np.array([x[0], y[0], z[0]])


def get_crossing_edge_pairs(index: MutableShapeIndex,
                            crossing_type: str = "all"):
    """GetCrossingEdgePairs (s2shapeutil_visit_crossing_edge_pairs.h:
    40-76) over a MutableShapeIndex: candidate pairs are edges
    CO-LOCATED IN AN INDEX CELL (the index guarantees every crossing
    pair shares at least one cell, since each edge appears in every
    cell it intersects), then the exact CrossingSign filter keeps
    sign >= 0 ('all', touching included) or sign > 0 ('interior').

    -> sorted list of ((shape_a, edge_a), (shape_b, edge_b)) with
    a < b in (shape, edge) order.  The distributed twin is
    ops/edges.crossing_edge_join (same candidates from the exploded
    cell table, same exact filter)."""
    from . import predicates
    from .shapeutil import shape_edge
    min_sign = 0 if crossing_type == "all" else 1
    cand: set = set()
    for cell in index.cells():
        entries = [(c.shape_id, e) for c in cell.clipped
                   for e in c.edges]
        for i in range(len(entries)):
            for j in range(i + 1, len(entries)):
                a, b = entries[i], entries[j]
                if a == b:
                    continue
                cand.add((a, b) if a < b else (b, a))
    if not cand:
        return []
    pairs = sorted(cand)
    av, bv = [], []
    for (sa, ea), (sb, eb) in pairs:
        av.append(shape_edge(index.shape(sa), ea))
        bv.append(shape_edge(index.shape(sb), eb))
    av = np.asarray(av)
    bv = np.asarray(bv)
    signs = predicates.crossing_sign(av[:, 0], av[:, 1],
                                     bv[:, 0], bv[:, 1])
    return [p for p, s in zip(pairs, signs) if s >= min_sign]


def find_self_intersection(shape) -> str | None:
    """FindSelfIntersection (s2shapeutil_visit_crossing_edge_pairs.cc:
    395-470): first crossing error among the chains of ONE dim-2
    shape, or None.  Interior crossings are loop-cross /
    self-intersection errors; shared END vertices (checked once per
    vertex via the a.v1 == b.v1 convention) classify as duplicate
    vertex (same chain), shared/reversed duplicate edge, or a
    vertex crossing via the two-wedge PROPERLY_OVERLAPS test —
    adjacent edges of a chain are skipped."""
    from . import predicates
    from .shapeutil import chain_edge, chain_position, shape_edge
    index = MutableShapeIndex([shape])
    pairs = get_crossing_edge_pairs(index, "all")
    chains = None
    for (sa, ea), (sb, eb) in pairs:
        ap = chain_position(shape, ea)
        bp = chain_position(shape, eb)
        if chains is None:
            from .shapeutil import shape_chains
            chains = shape_chains(shape)
        if ap[0] == bp[0]:
            ln = chains[ap[0]][1]
            if ((ap[1] + 1) % ln == bp[1]) or ((bp[1] + 1) % ln == ap[1]):
                continue  # adjacent edges in the chain
        a0, a1 = shape_edge(shape, ea)
        b0, b1 = shape_edge(shape, eb)
        sign = int(predicates.crossing_sign(a0[None], a1[None],
                                            b0[None], b1[None])[0])
        if sign > 0:
            return ("LOOP_SELF_INTERSECTION" if ap[0] == bp[0]
                    else "POLYGON_LOOPS_CROSS")
        # shared-vertex analysis, once per vertex: require a.v1 == b.v1
        if not np.array_equal(a1, b1):
            continue
        if ap[0] == bp[0]:
            return "DUPLICATE_VERTICES"
        a_len = chains[ap[0]][1]
        b_len = chains[bp[0]][1]
        a2 = chain_edge(shape, ap[0], (ap[1] + 1) % a_len)[1]
        b2 = chain_edge(shape, bp[0], (bp[1] + 1) % b_len)[1]
        if np.array_equal(a0, b0) or np.array_equal(a0, b2):
            return "POLYGON_LOOPS_SHARE_EDGE"
        ta = tuple(a0), tuple(a1), tuple(a2)
        if (predicates.get_wedge_relation(
                ta[0], ta[1], ta[2], tuple(b0), tuple(b2))
                == predicates.WEDGE_PROPERLY_OVERLAPS
                and predicates.get_wedge_relation(
                    ta[0], ta[1], ta[2], tuple(b2), tuple(b0))
                == predicates.WEDGE_PROPERLY_OVERLAPS):
            return "POLYGON_LOOPS_CROSS"
    return None
