"""Point-dimension boolean operations — the POINT layer of
S2BooleanOperation (s2boolean_operation.h:157-188 dimension rules;
fixtures s2boolean_operation_test.cc:228-404):

- For UNION the higher-dimensional shape wins: a point contained by
  the other geometry is absorbed.
- For INTERSECTION the lower-dimensional shape wins: exactly the
  contained points survive.
- For DIFFERENCE higher dimensions are unaffected by subtracting
  points; the point layer keeps the uncontained points.
- SYMMETRIC_DIFFERENCE keeps points not contained by the other side.

Containment is model-parameterized:
- polygons: PolygonModel (OPEN = interior only, SEMI_OPEN = the
  crossing-parity S2Polygon::Contains semantics, CLOSED = interior +
  boundary)
- polylines: PolylineModel (OPEN = no endpoints, SEMI_OPEN = all
  vertices but the last, CLOSED = all vertices; points interior to an
  edge always contained; polyline loops optionally have no boundary —
  polyline_loops_have_boundaries)
"""

from __future__ import annotations

import numpy as np

from .builder import region_contains, region_loops

# exact-coincidence tolerance for "point lies on the 1D feature":
# squared chord; inputs share exact doubles in the fixture regime
_ON_EDGE_TOL2 = 1e-30

POLYLINE_MODELS = ("open", "semi_open", "closed")


def _on_segment(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> bool:
    from .edges import point_segment_chord2
    d2 = point_segment_chord2(p[None], a[None], b[None])
    return float(d2[0]) <= _ON_EDGE_TOL2


def polygon_contains_points_model(region, pts: np.ndarray,
                                  model: str = "semi_open"
                                  ) -> np.ndarray:
    """Model-parameterized polygon point containment
    (s2boolean_operation.h:131-152): SEMI_OPEN is the calibrated
    crossing parity (exactly one polygon of a vertex tiling contains
    the vertex); OPEN subtracts the boundary; CLOSED adds it."""
    loops, full = region_loops(region)
    pts = np.asarray(pts, dtype=np.float64)
    base = region_contains(loops, full, pts)
    if model == "semi_open" or full or not loops:
        return base
    on_boundary = np.zeros(len(pts), dtype=bool)
    for k, p in enumerate(pts):
        for lp in loops:
            v = lp.vertices
            w = np.roll(v, -1, axis=0)
            if any(_on_segment(p, v[i], w[i]) for i in range(lp.n)):
                on_boundary[k] = True
                break
    if model == "open":
        return base & ~on_boundary
    if model == "closed":
        return base | on_boundary
    raise ValueError(model)


def polyline_contains_point(verts: np.ndarray, p: np.ndarray,
                            model: str = "semi_open",
                            loops_have_boundaries: bool = True) -> bool:
    """PolylineModel point containment (s2boolean_operation.h:109-129):
    interior edge points always contained; first/last vertices per the
    model, with the polyline_loops_have_boundaries special case for
    closed walks (first == last)."""
    if model not in POLYLINE_MODELS:
        raise ValueError(model)
    verts = np.asarray(verts, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    n = len(verts)
    if n == 0:
        return False
    is_loop = n >= 2 and np.array_equal(verts[0], verts[-1])
    degenerate = n == 2 and is_loop  # single degenerate edge
    if degenerate:
        # contains only its vertex, and only in the CLOSED model
        return model == "closed" and np.array_equal(p, verts[0])
    if is_loop and not loops_have_boundaries:
        # no boundary: every vertex / edge point is interior
        for i in range(n - 1):
            if _on_segment(p, verts[i], verts[i + 1]):
                return True
        return False
    # endpoint membership per model (any interior OCCURRENCE of the
    # same point still counts — fall through to the scans below)
    at_first = np.array_equal(p, verts[0])
    at_last = np.array_equal(p, verts[-1])
    if model == "closed" and (at_first or at_last):
        return True
    if model == "semi_open" and at_first:
        # contains every vertex except the LAST; first/last coincide
        # for loops and "all but last" keeps the first
        return True
    for i in range(1, n - 1):
        if np.array_equal(p, verts[i]):
            return True
    for i in range(n - 1):
        a, b = verts[i], verts[i + 1]
        if np.array_equal(p, a) or np.array_equal(p, b):
            continue  # endpoint membership decided above
        if _on_segment(p, a, b):
            return True
    return False


def point_boolean(points_a: np.ndarray, other, op: str,
                  other_kind: str = "polygon",
                  polygon_model: str = "semi_open",
                  polyline_model: str = "semi_open",
                  loops_have_boundaries: bool = True) -> np.ndarray:
    """Point layer of op(A=points, B=other): the surviving points of A
    (multiset semantics — duplicates preserved, matching the
    reference's PointPoint note).  `other` is a polygon region
    (Loop/list/FULL), a list of polyline vertex arrays
    (other_kind='polyline'), or an (m,3) point array
    (other_kind='points')."""
    pts = np.asarray(points_a, dtype=np.float64)
    if len(pts) == 0:
        return pts.reshape(0, 3)
    if other_kind == "polygon":
        contained = polygon_contains_points_model(other, pts,
                                                  polygon_model)
    elif other_kind == "polyline":
        contained = np.array([
            any(polyline_contains_point(pl, p, polyline_model,
                                        loops_have_boundaries)
                for pl in other)
            for p in pts], dtype=bool)
    elif other_kind == "points":
        ob = {tuple(q) for q in np.asarray(other, dtype=np.float64)}
        contained = np.array([tuple(p) in ob for p in pts], dtype=bool)
    else:
        raise ValueError(other_kind)
    keep = contained if op == "intersection" else ~contained
    return pts[keep]


# ---------------------------------------------------------------------------
# polyline x polyline boolean operations
# (s2boolean_operation_test.cc:406-785 fixture semantics)

def _subdivide_two_groups(a_lists: list[list], b_lists: list[list]):
    """Split every edge of group A at its transverse crossings with
    group B (and vice versa), sharing bit-identical crossing points;
    self-crossings within a group are NOT split (the reference's
    guarantee).  Returns per-polyline lists of subsegment lists."""
    import numpy as np

    from . import predicates
    from .builder import _edge_param
    from .edges import edge_intersection
    fa = [e for lst in a_lists for e in lst]
    fb = [e for lst in b_lists for e in lst]
    sa: list[list] = [[] for _ in fa]
    sb: list[list] = [[] for _ in fb]
    if fa and fb:
        na, nb = len(fa), len(fb)
        a0 = np.repeat(np.array([e[0] for e in fa]), nb, axis=0)
        a1 = np.repeat(np.array([e[1] for e in fa]), nb, axis=0)
        b0 = np.tile(np.array([e[0] for e in fb]), (na, 1))
        b1 = np.tile(np.array([e[1] for e in fb]), (na, 1))
        cs = predicates.crossing_sign(a0, a1, b0, b1).reshape(na, nb)
        for i, j in zip(*np.nonzero(cs > 0)):
            x = edge_intersection(fa[i][0], fa[i][1],
                                  fb[j][0], fb[j][1])
            sa[int(i)].append(x)
            sb[int(j)].append(x)

    def apply(flat, splits, lists):
        out = []
        k = 0
        for lst in lists:
            cur = []
            for (p0, p1) in lst:
                xs = splits[k]
                k += 1
                if not xs:
                    cur.append([(p0, p1)])
                    continue
                xs = sorted(xs, key=lambda x: _edge_param(p0, p1, x))
                chain = [p0, *xs, p1]
                cur.append([(chain[t], chain[t + 1])
                            for t in range(len(chain) - 1)])
            out.append(cur)
        return out

    return apply(fa, sa, a_lists), apply(fb, sb, b_lists)


def _chain_of(sub_polyline: list[list]) -> list[np.ndarray]:
    """Per-polyline subdivided vertex chain from subsegment lists."""
    chain: list[np.ndarray] = []
    for segs in sub_polyline:
        for (p0, p1) in segs:
            if not chain:
                chain.append(p0)
            chain.append(p1)
    return chain


def _occurrence_contained(i: int, n: int, is_loop: bool,
                          model: str, boundaries: bool) -> bool:
    """Is vertex occurrence i of an n-vertex chain contained per the
    PolylineModel (position-based)?"""
    if is_loop and not boundaries:
        return i < n - 1  # last occurrence is the duplicated first
    if model == "closed":
        return True
    if model == "semi_open":
        return i < n - 1
    return 0 < i < n - 1  # open


def polyline_polyline_boolean(a_lines: list[np.ndarray],
                              b_lines: list[np.ndarray], op: str,
                              polyline_model: str = "semi_open",
                              loops_have_boundaries: bool = True
                              ) -> list[np.ndarray]:
    """Polyline x polyline boolean operation (both layers emitted, as
    the reference: 'the expected output includes the relevant portions
    of BOTH input polylines'; duplicates retained).

    Edge dimension: after shared crossing subdivision, an edge is 'in'
    the other side iff bitwise-coincident with one of its sub-edges
    (same or reversed — model-independent), or, for degenerate (x,x)
    edges, iff coincident with an opposite degenerate OR x is
    contained by the opposite side per the model.  UNION keeps
    everything; INTERSECTION keeps in-edges; DIFFERENCE/Δ keep
    out-edges (A only / both sides).

    Vertex dimension (INTERSECTION only): a vertex occurrence emits a
    degenerate 2-vertex polyline iff it is contained at that position
    per the model, the point lies in the opposite side, and neither
    incident sub-edge was kept (isolated-vertex rule of the
    PolylineVertex* and PolylineLoopMultiple* fixtures)."""
    from .builder import OPS
    if op not in OPS:
        raise ValueError(op)
    if polyline_model not in POLYLINE_MODELS:
        raise ValueError(polyline_model)

    def norm(lines):
        out = []
        for v in lines:
            v = np.asarray(v, dtype=np.float64)
            out.append(v)
        return out

    a_lines, b_lines = norm(a_lines), norm(b_lines)

    def edge_lists(lines):
        out = []
        for v in lines:
            out.append([(v[i], v[i + 1]) for i in range(len(v) - 1)])
        return out

    sub_a, sub_b = _subdivide_two_groups(edge_lists(a_lines),
                                         edge_lists(b_lines))

    def keyset(sub):
        same, degen = set(), set()
        for pl in sub:
            for segs in pl:
                for (p0, p1) in segs:
                    k = (p0.tobytes(), p1.tobytes())
                    if k[0] == k[1]:
                        degen.add(k[0])
                    else:
                        same.add(k)
        return same, degen

    keys_a, degen_a = keyset(sub_a)
    keys_b, degen_b = keyset(sub_b)

    def contains_pt(lines, p):
        return any(polyline_contains_point(
            pl, p, polyline_model, loops_have_boundaries)
            for pl in lines)

    def in_other(p0, p1, other_same, other_degen, other_lines):
        k0, k1 = p0.tobytes(), p1.tobytes()
        if k0 == k1:  # degenerate edge
            return k0 in other_degen or contains_pt(other_lines, p0)
        return (k0, k1) in other_same or (k1, k0) in other_same

    out: list[np.ndarray] = []

    def process(sub, orig_lines, other_same, other_degen, other_lines,
                emit_vertices: bool, keep_pred):
        for pl_idx, pl in enumerate(sub):
            chain = _chain_of(pl)
            n = len(chain)
            if n == 0:
                continue
            orig = orig_lines[pl_idx]
            is_degen_input = (len(orig) == 2
                              and np.array_equal(orig[0], orig[1]))
            kept = [keep_pred(in_other(chain[i], chain[i + 1],
                                       other_same, other_degen,
                                       other_lines))
                    for i in range(n - 1)]
            # maximal runs of kept sub-edges
            run: list = []
            for i in range(n - 1):
                if kept[i]:
                    if not run:
                        run = [chain[i]]
                    run.append(chain[i + 1])
                elif run:
                    out.append(np.array(run))
                    run = []
            if run:
                out.append(np.array(run))
            if not emit_vertices or is_degen_input:
                continue
            is_loop = n >= 2 and np.array_equal(chain[0], chain[-1])
            for i in range(n):
                if not _occurrence_contained(i, n, is_loop,
                                             polyline_model,
                                             loops_have_boundaries):
                    continue
                prev_kept = kept[i - 1] if i > 0 else False
                next_kept = kept[i] if i < n - 1 else False
                if prev_kept or next_kept:
                    continue
                if contains_pt(other_lines, chain[i]):
                    out.append(np.array([chain[i], chain[i]]))

    if op == "union":
        process(sub_a, a_lines, keys_b, degen_b, b_lines, False,
                lambda _: True)
        process(sub_b, b_lines, keys_a, degen_a, a_lines, False,
                lambda _: True)
    elif op == "intersection":
        process(sub_a, a_lines, keys_b, degen_b, b_lines, True,
                lambda x: x)
        process(sub_b, b_lines, keys_a, degen_a, a_lines, True,
                lambda x: x)
    elif op == "difference":
        process(sub_a, a_lines, keys_b, degen_b, b_lines, False,
                lambda x: not x)
    else:  # symmetric_difference
        process(sub_a, a_lines, keys_b, degen_b, b_lines, False,
                lambda x: not x)
        process(sub_b, b_lines, keys_a, degen_a, a_lines, False,
                lambda x: not x)
    return out


def polyline_polygon_boolean(lines: list[np.ndarray], region, op: str,
                             polygon_model: str = "semi_open",
                             polyline_model: str = "closed",
                             loops_have_boundaries: bool = True
                             ) -> list[np.ndarray]:
    """Polyline x polygon boolean operation, polyline dimension, WITH
    the reference's degenerate vertex outputs (the full semantics of
    PolylineVertex*PolygonVertex / PolylineEdge*PolygonEdgeOverlap:
    builder.clip_polyline without vertex emission is the fast path).

    Edge dimension: sub-edges after crossing subdivision classified by
    midpoint parity, with coincident polygon-boundary edges decided by
    the PolygonModel (OPEN: never contained; SEMI_OPEN: same direction
    only; CLOSED: both).  INTERSECTION keeps inside parts; UNION /
    DIFFERENCE / Δ keep outside parts.

    Vertex dimension: an occurrence of a polyline vertex (existing per
    the PolylineModel — default CLOSED, the reference default) emits a
    degenerate 2-vertex polyline iff its point containment vs the
    polygon (per PolygonModel) matches the op's keep side and neither
    incident sub-edge was kept."""
    from .builder import (OPS, POLYGON_MODELS, _loop_edges,
                          region_loops, subdivide_at_crossings)
    if op not in OPS:
        raise ValueError(op)
    if polygon_model not in POLYGON_MODELS:
        raise ValueError(polygon_model)
    loops, is_full = region_loops(region)
    want_inside = op == "intersection"
    eb = _loop_edges(loops)
    same_keys = set()
    rev_keys = set()
    out: list[np.ndarray] = []
    for v in lines:
        v = np.asarray(v, dtype=np.float64)
        ea = [(v[i], v[i + 1]) for i in range(len(v) - 1)]
        sa, sb = subdivide_at_crossings(ea, eb)
        same_keys = {(f[0].tobytes(), f[1].tobytes()) for f in sb}
        rev_keys = {(f[1].tobytes(), f[0].tobytes()) for f in sb}
        # chain + per-sub-edge containment
        chain: list[np.ndarray] = []
        for (p0, p1) in sa:
            if not chain:
                chain.append(p0)
            chain.append(p1)
        n = len(chain)
        contained: list[bool] = []
        for i in range(n - 1):
            k = (chain[i].tobytes(), chain[i + 1].tobytes())
            if k in same_keys:
                contained.append(polygon_model in ("semi_open",
                                                   "closed"))
            elif k in rev_keys:
                contained.append(polygon_model == "closed")
            else:
                m = chain[i] + chain[i + 1]
                m /= np.linalg.norm(m)
                if is_full:
                    contained.append(True)
                elif not loops:
                    contained.append(False)
                else:
                    contained.append(bool(
                        polygon_contains_points_model(
                            loops, m[None], polygon_model)[0]))
        kept = [c == want_inside for c in contained]
        run: list = []
        for i in range(n - 1):
            if kept[i]:
                if not run:
                    run = [chain[i]]
                run.append(chain[i + 1])
            elif run:
                out.append(np.array(run))
                run = []
        if run:
            out.append(np.array(run))
        # degenerate vertex emissions
        if n == 0:
            continue
        is_degen_input = (len(v) == 2
                          and np.array_equal(v[0], v[1]))
        if is_degen_input:
            continue  # degenerate edges are edge-dimension features
        is_loop = n >= 2 and np.array_equal(chain[0], chain[-1])
        for i in range(n):
            if not _occurrence_contained(i, n, is_loop,
                                         polyline_model,
                                         loops_have_boundaries):
                continue
            prev_kept = kept[i - 1] if i > 0 else False
            next_kept = kept[i] if i < n - 1 else False
            if prev_kept or next_kept:
                continue
            if is_full:
                inside = True
            elif not loops:
                inside = False
            else:
                inside = bool(polygon_contains_points_model(
                    loops, chain[i][None], polygon_model)[0])
            if inside == want_inside:
                out.append(np.array([chain[i], chain[i]]))
    return out


# ---------------------------------------------------------------------------
# boolean predicates over geometry collections
# (S2BooleanOperation::Intersects/Contains/Equals,
# s2boolean_operation.h:240-280; fixtures :2272-2304)

class GeometryCollection:
    """(points, polylines, polygon region) — the three dimensions of
    an S2ShapeIndex-style geometry collection."""

    def __init__(self, points=None, lines=None, region=None):
        self.points = (np.asarray(points, dtype=np.float64).reshape(
            -1, 3) if points is not None and len(points)
            else np.empty((0, 3)))
        self.lines = [np.asarray(v, dtype=np.float64)
                      for v in (lines or [])]
        self.region = [] if region is None else region

    def region_nonempty(self) -> bool:
        from .builder import region_loops
        loops, full = region_loops(self.region)
        return full or bool(loops)

    def is_empty(self) -> bool:
        return (len(self.points) == 0 and not self.lines
                and not self.region_nonempty())


def _points_in_collection(pts: np.ndarray, c: GeometryCollection
                          ) -> np.ndarray:
    """Default-model containment of points by a collection (polygon
    SEMI_OPEN, polyline CLOSED — the reference defaults)."""
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    inside = np.zeros(len(pts), dtype=bool)
    if len(c.points):
        keys = {q.tobytes() for q in c.points}
        inside |= np.array([p.tobytes() in keys for p in pts])
    if c.lines:
        inside |= np.array([any(polyline_contains_point(pl, p,
                                                        "closed")
                                for pl in c.lines) for p in pts])
    if c.region_nonempty():
        inside |= polygon_contains_points_model(c.region, pts,
                                                "semi_open")
    return inside


def boolean_intersects(a: GeometryCollection,
                       b: GeometryCollection) -> bool:
    """S2BooleanOperation::Intersects — is a ∩ b non-empty?"""
    from .builder import overlay_geometry, overlay_result_state
    if _points_in_collection(a.points, b).any():
        return True
    if _points_in_collection(b.points, a).any():
        return True
    if a.lines and b.lines and polyline_polyline_boolean(
            a.lines, b.lines, "intersection", "closed"):
        return True
    for lines, other in ((a.lines, b), (b.lines, a)):
        if lines and other.region_nonempty() \
                and polyline_polygon_boolean(lines, other.region,
                                             "intersection"):
            return True
    if a.region_nonempty() and b.region_nonempty():
        chains = overlay_geometry(a.region, b.region, "intersection")
        if chains:
            return True
        return overlay_result_state(a.region, b.region,
                                    "intersection", chains) == "full"
    return False


def boolean_contains(a: GeometryCollection,
                     b: GeometryCollection) -> bool:
    """S2BooleanOperation::Contains — is b − a empty (a ⊇ b)?"""
    from .builder import overlay_geometry, overlay_result_state
    if not _points_in_collection(b.points, a).all():
        return False
    if b.lines:
        remnant = polyline_polygon_boolean(
            b.lines, a.region if a.region_nonempty() else [],
            "difference")
        if remnant and a.lines:
            remnant = polyline_polyline_boolean(remnant, a.lines,
                                                "difference", "closed")
        # degenerate leftovers (isolated vertices) count only if the
        # point truly escapes a
        remnant = [r for r in remnant
                   if not (len(r) == 2 and np.array_equal(r[0], r[1])
                           and _points_in_collection(r[:1], a)[0])]
        if remnant:
            return False
    if b.region_nonempty():
        if not a.region_nonempty():
            return False
        chains = overlay_geometry(b.region, a.region, "difference")
        if chains:
            return False
        if overlay_result_state(b.region, a.region, "difference",
                                chains) == "full":
            return False
    return True


def boolean_equals(a: GeometryCollection,
                   b: GeometryCollection) -> bool:
    """S2BooleanOperation::Equals — is the symmetric difference
    empty?"""
    # dimension counts must agree (a point is never equal to a line)
    if (len(a.points) == 0) != (len(b.points) == 0):
        return False
    if bool(a.lines) != bool(b.lines):
        return False
    if a.region_nonempty() != b.region_nonempty():
        return False
    return boolean_contains(a, b) and boolean_contains(b, a)
