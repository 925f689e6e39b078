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
