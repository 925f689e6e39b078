"""Edge distance/crossing kernels (s2edge_distances.h:16-23),
vectorized over NumPy batches.

point_segment_chord2: min squared chord distance from unit point p to
the geodesic segment (a, b) — the reference's UpdateMinDistance
decomposition: the closest point is either the perpendicular
projection of p onto the great circle through (a, b) when that
projection lies inside the segment's wedge, or the nearer endpoint
(s2edge_distances.cc, AlwaysUpdateMinDistance).
"""

from __future__ import annotations

import numpy as np


def _dot(u, v):
    return (u * v).sum(axis=1)


def _cross(u, v):
    return np.cross(u, v)


def _norm2(u):
    return (u * u).sum(axis=1)


def point_segment_chord2(p: np.ndarray, a: np.ndarray, b: np.ndarray
                         ) -> np.ndarray:
    """(n,3) unit points / segment endpoints -> (n,) min chord²."""
    p = np.asarray(p, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n = _cross(a, b)                    # great-circle normal (unnormalized)
    # interior iff p lies in the wedge: on the b-side of plane (n, a)
    # and the a-side of plane (b, n)
    in_wedge = (_dot(_cross(n, a), p) > 0) & (_dot(_cross(b, n), p) > 0)
    # perpendicular chord² to the great circle:
    # sin(dist) = |p·n̂| ; chord² = 2 - 2·cos(dist)
    n2 = _norm2(n)
    pn = _dot(p, n)
    with np.errstate(invalid="ignore", divide="ignore"):
        sin2 = np.where(n2 > 0, (pn * pn) / n2, np.inf)
    sin2 = np.clip(sin2, 0.0, 1.0)
    perp_chord2 = 2.0 - 2.0 * np.sqrt(np.clip(1.0 - sin2, 0.0, 1.0))
    d2a = _norm2(p - a)
    d2b = _norm2(p - b)
    ends = np.minimum(d2a, d2b)
    out = np.where(in_wedge, np.minimum(perp_chord2, ends), ends)
    # degenerate edge (a == b): endpoint distance
    return np.where(n2 > 0, out, ends)


def edge_intersection(a0: np.ndarray, a1: np.ndarray,
                      b0: np.ndarray, b1: np.ndarray) -> np.ndarray:
    """Intersection point of two crossing geodesic edges
    (S2::GetIntersection, s2edge_crossings.cc:663-770 semantics):
    normalize(cross(cross(a0,a1), cross(b0,b1))) with the antipode
    resolved by Sign(a0, a1, b1); escalates to exact rational cross
    products when the double-precision normals are too short (nearly
    parallel edges), and to the reference's endpoint heuristic for
    exactly collinear inputs."""
    from fractions import Fraction

    from . import predicates
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    na = np.cross(a0, a1)
    nb = np.cross(b0, b1)
    x = np.cross(na, nb)
    norm = float(np.linalg.norm(x))
    # double path is safe when the result norm is far above its error
    # (~1e-14 relative); otherwise recompute the crosses exactly
    if norm < 1e-9:
        def xf(v):
            return tuple(Fraction(float(c)) for c in v)

        def cross_f(u, v):
            return (u[1] * v[2] - u[2] * v[1],
                    u[2] * v[0] - u[0] * v[2],
                    u[0] * v[1] - u[1] * v[0])

        axf = cross_f(xf(a0), xf(a1))
        bxf = cross_f(xf(b0), xf(b1))
        xf3 = cross_f(axf, bxf)
        if any(v != 0 for v in xf3):
            x = np.array([float(v) for v in xf3], dtype=np.float64)
            norm = float(np.linalg.norm(x))
            # scale exact coords into double range if needed
            if norm == 0.0 or not np.isfinite(norm):
                mx = max(abs(v) for v in xf3)
                x = np.array([float(v / mx) for v in xf3])
                norm = float(np.linalg.norm(x))
        else:
            # exactly collinear: the reference's endpoint heuristic
            # (s2edge_crossings.cc:689-705) — of the two endpoints
            # interior to the other edge, the lexicographically least
            an = np.array([float(v) for v in axf]) \
                if any(v != 0 for v in axf) else np.cross(a0, a1)
            bn = np.array([float(v) for v in bxf]) \
                if any(v != 0 for v in bxf) else np.cross(b0, b1)
            best = None
            for p, (c0, c1, nrm) in ((a0, (b0, b1, bn)),
                                     (a1, (b0, b1, bn)),
                                     (b0, (a0, a1, an)),
                                     (b1, (a0, a1, an))):
                if predicates.ordered_ccw(tuple(c0), tuple(p),
                                          tuple(c1), tuple(nrm)):
                    key = tuple(p)
                    if best is None or key < best:
                        best = key
            if best is None:
                raise ValueError("degenerate collinear edges")
            return np.array(best, dtype=np.float64)
    x = x / norm
    # antipode resolution (s2edge_crossings.cc:679): the true
    # intersection is Sign(a0, a1, b1) * normalize(na x nb)
    s = int(predicates.sign(np.array([a0[0]]), np.array([a0[1]]),
                            np.array([a0[2]]), np.array([a1[0]]),
                            np.array([a1[1]]), np.array([a1[2]]),
                            np.array([b1[0]]), np.array([b1[1]]),
                            np.array([b1[2]]))[0])
    return float(s) * x


class EdgeRegion:
    """A single geodesic segment as a coverable region (duck-typed for
    RegionCoverer): may_intersect = endpoint-in-cell or crossing with
    one of the cell's 4 geodesic edges; contains_cell is always False
    (a curve has no interior).  Used to cover query edges for the
    indexed S2CrossingEdgeQuery plan (s2crossing_edge_query.h:17-24,
    which covers query edges with index cells the same way)."""

    def __init__(self, a, b):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)

    def may_intersect_cell(self, cell) -> bool:
        from . import predicates
        if cell.contains_point(tuple(self.a)) \
                or cell.contains_point(tuple(self.b)):
            return True
        cv = np.array([cell.get_vertex(k) for k in range(4)],
                      dtype=np.float64)
        cn = np.roll(cv, -1, axis=0)
        aa = np.broadcast_to(self.a, (4, 3))
        bb = np.broadcast_to(self.b, (4, 3))
        return bool((predicates.crossing_sign(aa, bb, cv, cn) >= 0).any())

    def contains_cell(self, cell) -> bool:
        return False

    def get_cell_union_bound(self) -> list:
        from . import cellid
        from .region import Cap
        mid = self.a + self.b
        norm = float(np.linalg.norm(mid))
        if norm < 1e-9:  # antipodal endpoints: no useful cap bound
            return [int(v) for v in cellid.from_face(np.arange(6))]
        center = mid / norm
        d2 = max(float(((self.a - center) ** 2).sum()),
                 float(((self.b - center) ** 2).sum()))
        cap = Cap(tuple(center), d2)
        if cap.radius2 >= 2.0:
            return [int(v) for v in cellid.from_face(np.arange(6))]
        return cap.get_cell_union_bound()


def edge_covering(a, b, max_cells: int = 8, min_level: int = 0,
                  max_level: int = 30) -> np.ndarray:
    """Cell covering of one geodesic segment (int64 cell ids)."""
    from .coverer import RegionCoverer
    rc = RegionCoverer(max_cells=max_cells, min_level=min_level,
                       max_level=max_level)
    from . import cellid
    return cellid.as_i64(rc.get_covering(EdgeRegion(a, b)))
