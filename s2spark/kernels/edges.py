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


# ---------------------------------------------------------------------------
# S2::Project / IsEdgeBNearEdgeA / polyline covering
# (s2edge_distances.cc:286-520, s2polyline.cc:665-815)

def _robust_cross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a+b) x (b-a) = 2 a x b with better orthogonality for nearly
    (anti)parallel inputs (the RobustCrossProd identity); falls back
    to an arbitrary orthogonal for degenerate input."""
    c = np.cross(a + b, b - a)
    n = float(np.linalg.norm(c))
    if n > 0:
        return c / n
    # a == +-b: any orthogonal direction
    ref = np.array([0.0, 0.0, 1.0]) if abs(a[2]) < 0.9 \
        else np.array([1.0, 0.0, 0.0])
    c = np.cross(a, ref)
    return c / np.linalg.norm(c)


def project_to_edge(x: np.ndarray, a: np.ndarray,
                    b: np.ndarray) -> np.ndarray:
    """Closest point on geodesic edge (a, b) to x (S2::Project)."""
    from . import predicates
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if np.array_equal(x, a) or np.array_equal(x, b):
        return x
    n = _robust_cross(a, b)
    p = np.cross(np.cross(n, x), n)
    pn = float(np.linalg.norm(p))
    if pn > 0:
        p = p / pn
        if (predicates._sign_scalar(tuple(p), tuple(n), tuple(a)) > 0
                and predicates._sign_scalar(tuple(p), tuple(n),
                                            tuple(b)) < 0):
            return p
    da = float(np.dot(x - a, x - a))
    db = float(np.dot(x - b, x - b))
    return a if da <= db else b


def _angle(u: np.ndarray, v: np.ndarray) -> float:
    import math
    cross = float(np.linalg.norm(np.cross(u, v)))
    return math.atan2(cross, float(np.dot(u, v)))


def get_point_on_ray(origin: np.ndarray, direction: np.ndarray,
                     r_rad: float) -> np.ndarray:
    """Point at angle `r_rad` from `origin` along unit tangent
    `direction` (GetPointOnRay, s2edge_distances.h:283-293)."""
    import math
    p = math.cos(r_rad) * np.asarray(origin, dtype=np.float64) \
        + math.sin(r_rad) * np.asarray(direction, dtype=np.float64)
    return p / np.linalg.norm(p)


def get_point_on_line(a: np.ndarray, b: np.ndarray,
                      r_rad: float) -> np.ndarray:
    """Point at angle `r_rad` from `a` along the great circle towards
    `b` (GetPointOnLine, s2edge_distances.cc:47-59): tangent =
    RobustCrossProd(a,b) x a, robust even for nearly-antipodal
    endpoints."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d = np.cross(_robust_cross(a, b), a)
    return get_point_on_ray(a, d / np.linalg.norm(d), r_rad)


def get_point_to_left(a: np.ndarray, b: np.ndarray,
                      r_rad: float) -> np.ndarray:
    """Point at angle `r_rad` from `a`, perpendicular-left of edge ab
    (GetPointToLeft, s2edge_distances.cc:61-67)."""
    return get_point_on_ray(np.asarray(a, dtype=np.float64),
                            _robust_cross(a, b), r_rad)


def get_point_to_right(a: np.ndarray, b: np.ndarray,
                       r_rad: float) -> np.ndarray:
    """Mirror of get_point_to_left (s2edge_distances.cc:69-75)."""
    return get_point_on_ray(np.asarray(a, dtype=np.float64),
                            _robust_cross(b, a), r_rad)


def interpolate(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    """Point at fraction `t` of the spherical distance from `a` to
    `b`; t outside [0,1] extrapolates along the great circle
    (S2::Interpolate, s2edge_distances.cc:77-86)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if t == 0.0:
        return a
    if t == 1.0:
        return b
    return get_point_on_line(a, b, t * _angle(a, b))


def is_edge_b_near_edge_a(a0, a1, b0, b1, tolerance: float) -> bool:
    """True iff every point of edge B is within `tolerance` of edge A
    (s2edge_distances.cc:421-505: endpoint projections + the planar-
    angle / furthest-point-on-circ(B) analysis)."""
    import math

    from . import predicates
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    a_ortho = _robust_cross(a0, a1)
    a_nearest_b0 = project_to_edge(b0, a0, a1)
    a_nearest_b1 = project_to_edge(b1, a0, a1)
    if predicates._sign_scalar(tuple(a_ortho), tuple(a_nearest_b0),
                               tuple(a_nearest_b1)) < 0:
        a_ortho = -a_ortho
    if (_angle(b0, a_nearest_b0) > tolerance
            or _angle(b1, a_nearest_b1) > tolerance):
        return False
    b_ortho = _robust_cross(b0, b1)
    planar = _angle(a_ortho, b_ortho)
    if planar <= tolerance:
        return True
    if planar >= math.pi / 2:
        return ((_angle(b0, a0) < _angle(b0, a1))
                == (_angle(b1, a0) < _angle(b1, a1)))
    furthest = np.cross(b_ortho, _robust_cross(a_ortho, b_ortho))
    furthest /= np.linalg.norm(furthest)
    finv = -furthest
    sgn = predicates._sign_scalar
    on_b = lambda p: (sgn(tuple(b_ortho), tuple(b0), tuple(p)) > 0  # noqa
                      and sgn(tuple(p), tuple(b1),
                              tuple(b_ortho)) > 0)
    return not (on_b(furthest) or on_b(finv))


def _next_distinct(verts: np.ndarray, index: int) -> int:
    initial = verts[index]
    index += 1
    while index < len(verts) and np.array_equal(verts[index], initial):
        index += 1
    return index


def polyline_nearly_covers(a: np.ndarray, covered: np.ndarray,
                           max_error: float) -> bool:
    """S2Polyline::NearlyCovers (s2polyline.cc:713-815): is `covered`
    within max_error of a contiguous, monotone subpath of `a`?  The
    two-car search over (i, j, i_in_progress) states."""
    a = np.asarray(a, dtype=np.float64)
    covered = np.asarray(covered, dtype=np.float64)
    if len(covered) == 0:
        return True
    if len(a) == 0:
        return False
    pending: list[tuple] = []
    done: set = set()
    i = 0
    next_i = _next_distinct(a, 0)
    while next_i < len(a):
        next_next_i = _next_distinct(a, next_i)
        closest = project_to_edge(covered[0], a[i], a[next_i])
        if ((next_next_i == len(a)
             or not np.array_equal(closest, a[next_i]))
                and _angle(closest, covered[0]) <= max_error):
            pending.append((i, 0, True))
        i, next_i = next_i, next_next_i
    while pending:
        state = pending.pop()
        if state in done:
            continue
        done.add(state)
        si, sj, i_in_progress = state
        next_i = _next_distinct(a, si)
        next_j = _next_distinct(covered, sj)
        if next_j == len(covered):
            return True
        if next_i == len(a):
            continue
        if i_in_progress:
            j_begin = covered[sj]
            i_begin = project_to_edge(j_begin, a[si], a[next_i])
        else:
            i_begin = a[si]
            j_begin = project_to_edge(i_begin, covered[sj],
                                      covered[next_j])
        if is_edge_b_near_edge_a(j_begin, covered[next_j],
                                 i_begin, a[next_i], max_error):
            pending.append((next_i, sj, False))
        if is_edge_b_near_edge_a(i_begin, a[next_i],
                                 j_begin, covered[next_j], max_error):
            pending.append((si, next_j, True))
    return False


def polyline_approx_equals(a: np.ndarray, b: np.ndarray,
                           max_error: float = 1e-15) -> bool:
    """S2Polyline::ApproxEquals (s2polyline.cc:665-673)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if len(a) != len(b):
        return False
    return all(_angle(a[i], b[i]) <= max_error for i in range(len(a)))


# ---------------------------------------------------------------------------
# S2Polyline Project / UnInterpolate / GetSuffix
# (s2polyline.cc:238-300)

def _angle_between(p: np.ndarray, q: np.ndarray) -> float:
    """S1Angle(p, q) = atan2(|p x q|, p.q) — robust for near-0/pi."""
    c = np.cross(p, q)
    return float(np.arctan2(np.linalg.norm(c), np.dot(p, q)))


def polyline_get_suffix(verts: np.ndarray, fraction: float
                        ) -> tuple[np.ndarray, int]:
    """S2Polyline::GetSuffix start point (s2polyline.cc:238-266):
    the point at `fraction` of the polyline's arc length ->
    (point, next_vertex); fraction <= 0 -> first vertex, >= 1 ->
    last."""
    v = np.asarray(verts, dtype=np.float64)
    n = len(v)
    if fraction <= 0 or n == 1:
        return v[0], 1
    total = sum(_angle_between(v[i - 1], v[i]) for i in range(1, n))
    target = fraction * total
    for i in range(1, n):
        length = _angle_between(v[i - 1], v[i])
        if target < length:
            # arc-length interpolation (GetPointOnLine)
            a, b = v[i - 1], v[i]
            e2 = b - np.dot(b, a) * a
            nn = np.linalg.norm(e2)
            if nn == 0.0:
                result = a
            else:
                result = a * np.cos(target) + (e2 / nn) * np.sin(target)
                result = result / np.linalg.norm(result)
            nxt = i + 1 if np.array_equal(result, v[i]) else i
            return result, nxt
        target -= length
    return v[n - 1], n


def polyline_project(verts: np.ndarray, p: np.ndarray
                     ) -> tuple[np.ndarray, int]:
    """S2Polyline::Project (s2polyline.cc:268-298): closest point of
    the polyline to p -> (closest_point, next_vertex).  First edge
    with the strictly smallest distance wins (the reference's `<`
    scan order); next_vertex advances past the edge end when the
    closest point IS that vertex."""
    v = np.asarray(verts, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    if len(v) == 1:
        return v[0], 1
    a = v[:-1]
    b = v[1:]
    d2 = point_segment_chord2(np.broadcast_to(p, a.shape), a, b)
    min_index = int(np.argmin(d2)) + 1  # argmin = first minimum
    closest = project_to_edge(p, v[min_index - 1], v[min_index])
    nxt = min_index + (1 if np.array_equal(closest, v[min_index])
                       else 0)
    return closest, nxt


def polyline_uninterpolate(verts: np.ndarray, p: np.ndarray,
                           next_vertex: int) -> float:
    """S2Polyline::UnInterpolate (s2polyline.cc:273-289): arc-length
    fraction of `p` given its next_vertex, clamped to 1.0."""
    v = np.asarray(verts, dtype=np.float64)
    n = len(v)
    if n < 2:
        return 0.0
    length_sum = 0.0
    for i in range(1, next_vertex):
        length_sum += _angle_between(v[i - 1], v[i])
    length_to_point = length_sum + _angle_between(v[next_vertex - 1],
                                                  np.asarray(p))
    for i in range(next_vertex, n):
        length_sum += _angle_between(v[i - 1], v[i])
    return min(1.0, length_to_point / length_sum)


# ---------------------------------------------------------------------------
# Edge-pair distances (s2edge_distances.cc:327-430): min/max distance
# between two geodesic edges and the closest point pair.  Vectorized
# over (n,3) edge arrays — the kernel behind geometry-to-geometry
# distance (the reference's ShapeIndexTarget regime).
# ---------------------------------------------------------------------------

def edge_pair_min_chord2(a0, a1, b0, b1) -> np.ndarray:
    """Min chord² between edges (a0,a1) and (b0,b1)
    (UpdateEdgePairMinDistance, s2edge_distances.cc:327-351): zero when
    the edges cross or touch (CrossingSign >= 0), else the min over the
    four endpoint-to-other-edge distances."""
    from . import predicates
    a0 = np.asarray(a0, dtype=np.float64).reshape(-1, 3)
    a1 = np.asarray(a1, dtype=np.float64).reshape(-1, 3)
    b0 = np.asarray(b0, dtype=np.float64).reshape(-1, 3)
    b1 = np.asarray(b1, dtype=np.float64).reshape(-1, 3)
    d2 = np.minimum.reduce([
        point_segment_chord2(a0, b0, b1),
        point_segment_chord2(a1, b0, b1),
        point_segment_chord2(b0, a0, a1),
        point_segment_chord2(b1, a0, a1),
    ])
    crossing = predicates.crossing_sign(a0, a1, b0, b1) >= 0
    return np.where(crossing, 0.0, d2)


def point_edge_max_chord2(x, a, b) -> np.ndarray:
    """Max chord² from point x to edge (a,b) (UpdateMaxDistance,
    s2edge_distances.cc): the farther endpoint, unless the result
    exceeds 90° — then the true max is 180° minus the min distance of
    the ANTIPODE of x to the edge (the far side of the great circle)."""
    x = np.asarray(x, dtype=np.float64).reshape(-1, 3)
    a = np.asarray(a, dtype=np.float64).reshape(-1, 3)
    b = np.asarray(b, dtype=np.float64).reshape(-1, 3)
    cand = np.maximum(_norm2(x - a), _norm2(x - b))
    needs = cand > 2.0  # Right() in chord² space
    if np.any(needs):
        dmin = point_segment_chord2(-x[needs], a[needs], b[needs])
        # S1ChordAngle Straight() - dist: with a.length2()==4 the
        # reference's x + y - 2*sqrt(x*y) collapses to exactly
        # x = 4*(1 - 0.25*dmin) (y term vanishes).
        alt = 4.0 * (1.0 - 0.25 * dmin)
        cand = cand.copy()
        cand[needs] = np.maximum(cand[needs], alt)
    return cand


def edge_pair_max_chord2(a0, a1, b0, b1) -> np.ndarray:
    """Max chord² between two edges (UpdateEdgePairMaxDistance,
    s2edge_distances.cc:353-377): 180° when edge a crosses the
    REFLECTION of edge b (the edges span antipodal directions), else
    the max over the four endpoint-to-other-edge maxima."""
    from . import predicates
    a0 = np.asarray(a0, dtype=np.float64).reshape(-1, 3)
    a1 = np.asarray(a1, dtype=np.float64).reshape(-1, 3)
    b0 = np.asarray(b0, dtype=np.float64).reshape(-1, 3)
    b1 = np.asarray(b1, dtype=np.float64).reshape(-1, 3)
    d2 = np.maximum.reduce([
        point_edge_max_chord2(a0, b0, b1),
        point_edge_max_chord2(a1, b0, b1),
        point_edge_max_chord2(b0, a0, a1),
        point_edge_max_chord2(b1, a0, a1),
    ])
    antipodal = predicates.crossing_sign(a0, a1, -b0, -b1) >= 0
    return np.where(antipodal, 4.0, d2)


def edge_pair_closest_points(a0, a1, b0, b1):
    """Closest point pair between two edges (GetEdgePairClosestPoints,
    s2edge_distances.cc:396-430).  Scalar (driver-side) helper: the
    crossing case returns the exact intersection twice; otherwise the
    projection of the minimizing endpoint onto the other edge."""
    from . import predicates
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    if int(predicates.crossing_sign(a0[None], a1[None], b0[None],
                                    b1[None])[0]) > 0:
        x = edge_intersection(a0, a1, b0, b1)
        return x, x
    cands = [
        (float(point_segment_chord2(a0[None], b0[None], b1[None])[0]),
         0),
        (float(point_segment_chord2(a1[None], b0[None], b1[None])[0]),
         1),
        (float(point_segment_chord2(b0[None], a0[None], a1[None])[0]),
         2),
        (float(point_segment_chord2(b1[None], a0[None], a1[None])[0]),
         3),
    ]
    _, best = min(cands)
    if best == 0:
        return a0, project_to_edge(a0, b0, b1)
    if best == 1:
        return a1, project_to_edge(a1, b0, b1)
    if best == 2:
        return project_to_edge(b0, a0, a1), b0
    return project_to_edge(b1, a0, a1), b1
