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


def _region_overlay(a_region, b_region, op: str):
    """overlay_geometry with the reference's input-snap fallback:
    vertex-on-edge (T-junction) inputs — e.g. s2polygon_test.cc's
    kNearFar2 vertex 8:-175 sitting exactly on kNearFar1's meridian
    edge 1:-175→9:-175 — fail the exact overlay's coincident-boundary
    calibration (the sub-edges along the shared geodesic are not
    bit-identical).  The reference handles these through snap rounding
    (s2builder.h snap contract); we mirror it by pre-snapping both
    inputs with IdentitySnapFunction(intersection merge radius), which
    merges each vertex onto the edge it touches and splits that edge
    at the site, making the incident sub-edges bit-identical
    (polygon_approx._presnap).  Returns (a', b', chains) — the
    possibly-snapped regions, so result-state probes stay consistent
    with the chains."""
    from .builder import overlay_geometry
    try:
        return a_region, b_region, overlay_geometry(a_region, b_region,
                                                    op)
    except ValueError:
        from .polygon_approx import (INTERSECTION_MERGE_RADIUS,
                                     _presnap)
        a2, b2 = _presnap(a_region, b_region,
                          INTERSECTION_MERGE_RADIUS)
        return a2, b2, overlay_geometry(a2, b2, op)


def boolean_intersects(a: GeometryCollection,
                       b: GeometryCollection) -> bool:
    """S2BooleanOperation::Intersects — is a ∩ b non-empty?"""
    from .builder import overlay_result_state
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
        ra, rb, chains = _region_overlay(a.region, b.region,
                                         "intersection")
        if chains:
            return True
        return overlay_result_state(ra, rb,
                                    "intersection", chains) == "full"
    return False


def boolean_contains(a: GeometryCollection,
                     b: GeometryCollection) -> bool:
    """S2BooleanOperation::Contains — is b − a empty (a ⊇ b)?"""
    from .builder import overlay_result_state
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
        rb, ra, chains = _region_overlay(b.region, a.region,
                                         "difference")
        if chains:
            return False
        if overlay_result_state(rb, ra, "difference",
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


# ---------------------------------------------------------------------------
# ClosedSetNormalizer / NormalizeClosedSet
# (s2builderutil_closed_set_normalizer.h:34-105; test table
# s2builderutil_closed_set_normalizer_test.cc:161-256)

def _key(p) -> bytes:
    return np.asarray(p, dtype=np.float64).tobytes()


def _undirected_edge_key(p0, p1) -> bytes:
    k0, k1 = _key(p0), _key(p1)
    return k0 + k1 if k0 <= k1 else k1 + k0


def _walk_key(verts: list) -> bytes:
    fwd = b"".join(_key(v) for v in verts)
    rev = b"".join(_key(v) for v in reversed(verts))
    return fwd if fwd <= rev else rev


def normalize_closed_set(points, lines, region,
                         suppress_lower_dimensions: bool = True,
                         merge_duplicates: bool = True):
    """ClosedSetNormalizer (s2builderutil_closed_set_normalizer.h:
    34-72): given the three dimensional layers of a closed-model
    geometry (points (n,3); polylines list[(k,3)]; polygon as lax
    vertex chains — 1-vertex chains are degenerate points, 2-vertex
    chains sibling edge pairs, FULL accepted), normalize degeneracies
    downward:

    - polygon sibling edge pairs: discarded (holes) or converted to a
      polyline edge (shells);
    - degenerate polygon edges (single-vertex loops): discarded
      (holes) or converted to points (shells);
    - degenerate polyline edges (AA): converted to points;

    and, if suppress_lower_dimensions (the reference default):

    - polyline edges coinciding with (either direction of) a polygon
      edge are discarded;
    - points coinciding with polyline or polygon vertices are
      discarded.

    merge_duplicates mirrors DuplicateEdges::MERGE on the point and
    (undirected) polyline layers; False is the KEEP behavior of the
    reference's NormalizeTest harness.

    Returns (points (m,3), polylines list[(k,3)], polygon_chains,
    polygon_is_full)."""
    from .builder import FULL, find_polygon_degeneracies
    pts_out: list[np.ndarray] = [np.asarray(p, dtype=np.float64)
                                 for p in (points if points is not None
                                           else [])]
    # --- polygon layer: classify + demote degeneracies
    if isinstance(region, str):
        region = [region] if region == FULL else []
    chains_in = [c if isinstance(c, str)
                 else np.asarray(getattr(c, "vertices", c),
                                 dtype=np.float64)
                 for c in (region or [])]
    poly_full = any(isinstance(c, str) and c == FULL
                    for c in chains_in)
    degens, poly_chains = find_polygon_degeneracies(chains_in)
    lines_out: list[np.ndarray] = []
    pair_count: dict = {}
    for (p0, p1, is_hole) in degens:
        if is_hole:
            continue
        if np.array_equal(p0, p1):
            pts_out.append(np.asarray(p0, dtype=np.float64))
            continue
        # both directions of each matched sibling pair are reported;
        # emit ONE polyline edge per pair
        ek = _undirected_edge_key(p0, p1)
        pair_count[ek] = pair_count.get(ek, 0) + 1
        if pair_count[ek] % 2 == 1:
            lines_out.append(np.asarray([p0, p1], dtype=np.float64))
    # --- polyline layer: demote degenerate edges, split walks
    for pl in (lines or []):
        v = np.asarray(pl, dtype=np.float64)
        run: list = []
        for i in range(len(v) - 1):
            if _key(v[i]) == _key(v[i + 1]):
                pts_out.append(v[i])
                if len(run) >= 2:
                    lines_out.append(np.asarray(run))
                run = []
                continue
            if not run:
                run = [v[i]]
            run.append(v[i + 1])
        if len(run) >= 2:
            lines_out.append(np.asarray(run))
    # --- suppression of lower-dimensional duplicates
    if suppress_lower_dimensions:
        poly_edges = set()
        for c in poly_chains:
            for i in range(len(c)):
                poly_edges.add(_undirected_edge_key(
                    c[i], c[(i + 1) % len(c)]))
        split: list[np.ndarray] = []
        for pl in lines_out:
            run = []
            for i in range(len(pl) - 1):
                if _undirected_edge_key(pl[i], pl[i + 1]) \
                        in poly_edges:
                    if len(run) >= 2:
                        split.append(np.asarray(run))
                    run = []
                    continue
                if not run:
                    run = [pl[i]]
                run.append(pl[i + 1])
            if len(run) >= 2:
                split.append(np.asarray(run))
        lines_out = split
        suppress_keys = {_key(v) for c in poly_chains for v in c}
        for pl in lines_out:
            suppress_keys.update(_key(v) for v in pl)
        pts_out = [p for p in pts_out
                   if _key(p) not in suppress_keys]
    if merge_duplicates:
        seen: set = set()
        uniq_pts = []
        for p in pts_out:
            k = _key(p)
            if k not in seen:
                seen.add(k)
                uniq_pts.append(p)
        pts_out = uniq_pts
        # DuplicateEdges::MERGE is per UNDIRECTED EDGE, not per walk
        # (ADVICE r4: two walks sharing only some coincident edges must
        # not keep duplicate copies of those edges).  Merge each edge
        # once — first-encountered direction, deterministic — and
        # reassemble maximal walks like the polyline layer does.
        edge_seen: set = set()
        merged_edges: list = []
        for pl in lines_out:
            for i in range(len(pl) - 1):
                ek = _undirected_edge_key(pl[i], pl[i + 1])
                if ek not in edge_seen:
                    edge_seen.add(ek)
                    merged_edges.append((pl[i], pl[i + 1]))
        if merged_edges:
            from .builder import build_polylines
            lines_out = build_polylines(merged_edges, stabilize=False)
        else:
            lines_out = []
    pts_arr = (np.asarray(pts_out, dtype=np.float64).reshape(-1, 3)
               if pts_out else np.empty((0, 3)))
    return pts_arr, lines_out, poly_chains, poly_full


def _split_lax_region(region):
    """Lax region -> (core Loops (>=3 verts), degenerate chains
    (1/2-vertex arrays), is_full)."""
    from .builder import FULL
    from .loops import Loop
    if isinstance(region, str):
        region = [region] if region == FULL else []
    if isinstance(region, Loop):
        region = [region]
    core: list = []
    degen: list = []
    full = False
    for item in (region or []):
        if isinstance(item, str):
            full = full or item == FULL
            continue
        v = np.asarray(getattr(item, "vertices", item),
                       dtype=np.float64)
        if len(v) <= 2:
            degen.append(v)
        elif isinstance(item, Loop):
            core.append(item)
        else:
            core.append(Loop(v))
    return core, degen, full


def _points_contained_closed(pts: np.ndarray, other_region,
                             other_lines, other_points=None
                             ) -> np.ndarray:
    """CLOSED-model containment of points by the other side's
    geometry (interior + boundary of polygons, every vertex + edge
    interior of polylines, exact match on points when given)."""
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    inside = np.zeros(len(pts), dtype=bool)
    if other_points is not None and len(other_points):
        keys = {_key(q) for q in other_points}
        inside |= np.array([_key(p) in keys for p in pts])
    if other_lines:
        inside |= np.array([
            any(polyline_contains_point(pl, p, "closed")
                for pl in other_lines) for p in pts])
    inside |= polygon_contains_points_model(other_region, pts,
                                            "closed")
    return inside


def mixed_boolean_layers(a: GeometryCollection, b: GeometryCollection,
                         op: str, polygon_model: str = "semi_open",
                         polyline_model: str = "closed",
                         suppress_lower_dimensions: bool = True,
                         merge_duplicates: bool = True):
    """Mixed-dimension S2BooleanOperation + NormalizeClosedSet: the
    three-layer boolean op over (points, polylines, polygons) with
    degeneracy-normalized output (the reference's ComputeUnion recipe,
    s2builderutil_closed_set_normalizer.h:170-200 and its
    MixedGeometry fixture).  Regions are lax: 1/2-vertex chains are
    degenerate point/sibling-pair polygon features.

    Dimension rules (s2boolean_operation.h:157-188): higher dimension
    absorbs lower for UNION (a point/polyline inside the other's
    CLOSED region contributes nothing and is dropped); INTERSECTION
    keeps the contained lower-dimension features; DIFFERENCE
    subtracts the other's closed region from each layer (the
    subtrahend's lower-dimension features carve nothing and are
    dropped); SYMMETRIC_DIFFERENCE is per-side difference.  Degenerate
    polygon features survive vs the OTHER region (union/Δ: not in its
    open interior; intersection: closed-contained; difference: A-side
    only, not closed-contained) and are then classified as
    shells/holes of the RESULT polygon by the normalizer.

    Returns (points (m,3), polylines list[(k,3)], polygon_chains,
    polygon_is_full)."""
    from .builder import (FULL, overlay_geometry, overlay_result_state)
    if op not in ("union", "intersection", "difference",
                  "symmetric_difference"):
        raise ValueError(op)
    core_a, deg_a, full_a = _split_lax_region(a.region)
    core_b, deg_b, full_b = _split_lax_region(b.region)
    ra = FULL if full_a else core_a
    rb = FULL if full_b else core_b
    # --- dim 2
    chains = overlay_geometry(ra, rb, op, polygon_model=polygon_model)
    state = overlay_result_state(ra, rb, op, chains)
    kept_deg: list = []
    for degs, other, side in ((deg_a, rb, "a"), (deg_b, ra, "b")):
        for d in degs:
            q = np.sum(d, axis=0)
            q = q / np.linalg.norm(q)
            in_open = bool(polygon_contains_points_model(
                other, q[None], "open")[0])
            in_closed = bool(polygon_contains_points_model(
                other, q[None], "closed")[0])
            if op == "intersection":
                keep = in_closed
            elif op == "difference":
                keep = side == "a" and not in_closed
            else:  # union / symmetric_difference
                keep = not in_open
            if keep:
                kept_deg.append(d)
    region_out: list = ([FULL] if state == "full" else [])
    region_out += [c for c in chains] + kept_deg
    # --- dim 1
    lines_out: list = []
    if op in ("union", "difference", "symmetric_difference"):
        srcs = [(a.lines, rb, b.lines)]
        if op != "difference":
            srcs.append((b.lines, ra, a.lines))
        for lines, other_region, other_lines in srcs:
            if not lines:
                continue
            part = polyline_polygon_boolean(
                lines, other_region,
                "union" if op == "union" else "difference",
                polygon_model, polyline_model)
            if op != "union" and other_lines and part:
                part = polyline_polyline_boolean(
                    part, other_lines, "difference", polyline_model)
            lines_out += part
    else:  # intersection
        if a.lines:
            lines_out += polyline_polygon_boolean(
                a.lines, rb, "intersection", polygon_model,
                polyline_model)
        if b.lines:
            lines_out += polyline_polygon_boolean(
                b.lines, ra, "intersection", polygon_model,
                polyline_model)
        if a.lines and b.lines:
            lines_out += polyline_polyline_boolean(
                a.lines, b.lines, "intersection", polyline_model)
    # --- dim 0
    pts_out: list = []
    in_b = _points_contained_closed(
        a.points, rb, b.lines,
        b.points if op != "union" else None)
    in_a = _points_contained_closed(
        b.points, ra, a.lines,
        a.points if op != "union" else None)
    if op == "intersection":
        pts_out += list(a.points[in_b]) + list(b.points[in_a])
    elif op == "difference":
        pts_out += list(a.points[~in_b])
    else:  # union / symmetric_difference: both uncontained sides
        pts_out += list(a.points[~in_b]) + list(b.points[~in_a])
    return normalize_closed_set(
        pts_out, lines_out, region_out,
        suppress_lower_dimensions=suppress_lower_dimensions,
        merge_duplicates=merge_duplicates)
