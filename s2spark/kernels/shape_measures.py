"""Shape and shape-collection measures — s2centroids.h (true
centroids of edges/triangles), s2shape_measures.h (per-shape length /
perimeter / area / centroid with the signed-area accumulation rule)
and s2shape_index_measures.h (collection-level sums + the
max-dimension centroid rule).

All formulas follow the reference's operation shapes:
- TrueCentroid(edge) = sqrt(|a-b|^2/|a+b|^2) * (a+b)
  (s2centroids.cc:75-84) — the centroid times the edge length.
- TrueCentroid(triangle) via the row-reduced Cramer solve
  (s2centroids.cc:33-72) — the centroid times the SIGNED area.
- GetArea(polygon shape) = sum of per-chain signed areas in
  [-2pi, 2pi], +4pi if the total is negative
  (s2shape_measures.cc GetArea) — avoids the near-4pi hole
  cancellation of naive mod-4pi accumulation.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "true_centroid_edge", "true_centroid_triangle",
    "polyline_length", "polyline_centroid",
    "loop_signed_area", "loop_perimeter", "loop_centroid",
    "collection_measures", "region_area", "overlap_fractions",
    "stable_angle", "angle", "turn_angle",
    "area", "girard_area", "signed_area", "planar_centroid",
]


def _angle(a: np.ndarray, b: np.ndarray) -> float:
    c = np.cross(a, b)
    return float(np.arctan2(np.linalg.norm(c), np.dot(a, b)))


# ---------------------------------------------------------------------------
# Point-level measures (s2measures.h / s2measures.cc:39-165)
# ---------------------------------------------------------------------------

def _rcross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a+b) x (b-a) = 2 a x b — the RobustCrossProd identity: much
    better orthogonality for nearly (anti)parallel unit inputs
    (s2edge_crossings.cc RobustCrossProd, minus the exact-arithmetic
    escalation; an exactly-degenerate result falls back to an
    arbitrary orthogonal like the reference's symbolic tail)."""
    c = np.cross(a + b, b - a)
    if float(np.dot(c, c)) > 0.0:
        return c
    ref = np.array([0.0, 0.0, 1.0]) if abs(float(a[2])) < 0.9 \
        else np.array([1.0, 0.0, 0.0])
    return np.cross(a, ref)


def stable_angle(a: np.ndarray, b: np.ndarray) -> float:
    """Kahan's stable angle between unit vectors:
    2*atan2(|a-b|, |a+b|) (s2measures.cc:82-86) — keeps full relative
    precision for nearly (anti)parallel inputs where
    atan2(|axb|, a.b) loses half its bits."""
    return 2.0 * math.atan2(float(np.linalg.norm(a - b)),
                            float(np.linalg.norm(a + b)))


def angle(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Interior angle at b of the triangle (a, b, c) in [0, pi]
    (s2measures.cc:39-43): the angle between the great-circle normals
    of (a,b) and (c,b), robust when two inputs nearly coincide."""
    return _angle(_rcross(a, b), _rcross(c, b))


def turn_angle(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Exterior (turn) angle at b in (-pi, pi]: positive for a left
    turn, negative for a right turn, with the sign decided by the
    robust Sign predicate so turns near 180 degrees come out right
    (s2measures.cc:45-57)."""
    from . import predicates
    t = _angle(_rcross(a, b), _rcross(b, c))
    return t if predicates._sign_scalar(tuple(a), tuple(b),
                                        tuple(c)) > 0 else -t


def girard_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Girard's formula via angles between robust cross products
    (s2measures.cc:149-160) — handles a == b == c without a special
    case and stays accurate for near-degenerate triangles."""
    ab = _rcross(a, b)
    bc = _rcross(b, c)
    ac = _rcross(a, c)
    return max(0.0, _angle(ab, ac) - _angle(ab, bc) + _angle(bc, ac))


def area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Unsigned spherical triangle area: l'Huilier's theorem with the
    reference's Girard fallback for long skinny triangles
    (s2measures.cc:87-147).  The dispatch constants (s >= 3e-4,
    dmin < 1e-2*s^5, dmin < s*(0.1*(area + 5e-15))) are the
    reference's — they decide which formula's error bound wins."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    sa = stable_angle(b, c)
    sb = stable_angle(c, a)
    sc = stable_angle(a, b)
    s = 0.5 * (sa + sb + sc)
    if s >= 3e-4:
        s2 = s * s
        dmin = s - max(sa, sb, sc)
        if dmin < 1e-2 * s * s2 * s2:
            g = girard_area(a, b, c)
            if dmin < s * (0.1 * (g + 5e-15)):
                return g
    return 4.0 * math.atan(math.sqrt(max(
        0.0, math.tan(0.5 * s) * math.tan(0.5 * (s - sa))
        * math.tan(0.5 * (s - sb)) * math.tan(0.5 * (s - sc)))))


def signed_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Area with the orientation sign (s2measures.cc:162-164)."""
    from . import predicates
    return predicates._sign_scalar(tuple(a), tuple(b),
                                   tuple(c)) * area(a, b, c)


def planar_centroid(a: np.ndarray, b: np.ndarray,
                    c: np.ndarray) -> np.ndarray:
    """Centroid of the PLANAR triangle (a, b, c) — not projected to
    the sphere, norm < 1 (s2centroids.cc PlanarCentroid)."""
    return (np.asarray(a, dtype=np.float64) + np.asarray(b, np.float64)
            + np.asarray(c, np.float64)) / 3.0


def true_centroid_edge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    vdiff = a - b
    vsum = a + b
    sin2 = float(np.dot(vdiff, vdiff))
    cos2 = float(np.dot(vsum, vsum))
    if cos2 == 0.0:
        return np.zeros(3)
    return math.sqrt(sin2 / cos2) * vsum


def true_centroid_triangle(a: np.ndarray, b: np.ndarray,
                           c: np.ndarray) -> np.ndarray:
    angle_a = _angle(b, c)
    angle_b = _angle(c, a)
    angle_c = _angle(a, b)
    ra = 1.0 if angle_a == 0 else angle_a / math.sin(angle_a)
    rb = 1.0 if angle_b == 0 else angle_b / math.sin(angle_b)
    rc = 1.0 if angle_c == 0 else angle_c / math.sin(angle_c)
    x = np.array([a[0], b[0] - a[0], c[0] - a[0]])
    y = np.array([a[1], b[1] - a[1], c[1] - a[1]])
    z = np.array([a[2], b[2] - a[2], c[2] - a[2]])
    r = np.array([ra, rb - ra, rc - ra])
    return 0.5 * np.array([float(np.dot(np.cross(y, z), r)),
                           float(np.dot(np.cross(z, x), r)),
                           float(np.dot(np.cross(x, y), r))])


def polyline_length(v: np.ndarray) -> float:
    v = np.asarray(v, dtype=np.float64)
    return sum(_angle(v[i], v[i + 1]) for i in range(len(v) - 1))


def polyline_centroid(v: np.ndarray) -> np.ndarray:
    """Centroid times length (S2::GetCentroid of a polyline)."""
    v = np.asarray(v, dtype=np.float64)
    out = np.zeros(3)
    for i in range(len(v) - 1):
        out += true_centroid_edge(v[i], v[i + 1])
    return out


def loop_perimeter(v: np.ndarray) -> float:
    """Closed-chain perimeter (degenerate chains traverse both
    directions: a 2-vertex sibling pair counts AB + BA)."""
    v = np.asarray(v, dtype=np.float64)
    n = len(v)
    if n < 2:
        return 0.0
    return sum(_angle(v[i], v[(i + 1) % n]) for i in range(n))


def loop_signed_area(v: np.ndarray) -> float:
    """S2::GetSignedArea: interior-on-left area mapped into
    [-2pi, 2pi] (a CW loop's near-4pi complement area becomes a small
    negative number, avoiding hole cancellation)."""
    from .loops import Loop
    v = np.asarray(v, dtype=np.float64)
    if len(v) < 3:
        return 0.0
    area = Loop(v).get_area()
    return area - 4.0 * math.pi if area > 2.0 * math.pi else area


def loop_centroid(v: np.ndarray) -> np.ndarray:
    """Centroid times signed area: vertex-0 triangle fan of signed
    triangle centroids (GetSurfaceIntegral shape,
    s2loop_measures.cc)."""
    v = np.asarray(v, dtype=np.float64)
    out = np.zeros(3)
    for i in range(1, len(v) - 1):
        out += true_centroid_triangle(v[0], v[i], v[i + 1])
    return out


def collection_measures(col) -> dict:
    """s2shape_index_measures.h over a GeometryCollection:
    dimension = max shape dimension (-1 when empty); num_points
    counts dim-0 objects only; length sums polylines; perimeter sums
    polygon chains (shells AND holes AND degenerates); area sums
    signed chain areas (+4pi when negative, FULL = 4pi); centroid =
    measure-weighted centroid of the MAX-dimension shapes only."""
    from .layers import _split_lax_region
    pts = np.asarray(col.points, dtype=np.float64).reshape(-1, 3)
    lines = [np.asarray(x, dtype=np.float64) for x in col.lines]
    loops, degen, full = _split_lax_region(col.region)
    chains = [lp.vertices for lp in loops] + degen
    has_poly = bool(chains) or full
    dim = 2 if has_poly else (1 if lines else (0 if len(pts) else -1))
    length = sum(polyline_length(x) for x in lines)
    perimeter = sum(loop_perimeter(c) for c in chains)
    area = sum(loop_signed_area(c) for c in chains)
    if area < 0.0:
        area += 4.0 * math.pi
    if full and not chains:
        area = 4.0 * math.pi
    centroid = np.zeros(3)
    if dim == 2:
        for c in chains:
            centroid += loop_centroid(c)
    elif dim == 1:
        for x in lines:
            centroid += polyline_centroid(x)
    elif dim == 0:
        centroid = pts.sum(axis=0) if len(pts) else centroid
    return {"dim": dim, "num_points": int(len(pts)),
            "length": float(length), "perimeter": float(perimeter),
            "area": float(area),
            "centroid": centroid.astype(np.float64)}


def region_area(region) -> float:
    """Area of a lax (interior-on-left) region in steradians —
    S2Polygon::GetArea semantics: signed chain areas summed, +4pi
    wrap when the total goes negative (complement-dominant loop
    sets), FULL = 4pi."""
    from .layers import _split_lax_region
    loops, degen, full = _split_lax_region(region)
    chains = [lp.vertices for lp in loops] + degen
    if full and not chains:
        return 4.0 * math.pi
    area = sum(loop_signed_area(c) for c in chains)
    if area < 0.0:
        area += 4.0 * math.pi
    return float(area)


def overlap_fractions(a_region, b_region) -> tuple[float, float]:
    """S2Polygon::GetOverlapFractions (s2polygon.h:358-365,
    s2polygon.cc GetOverlapFractions): (area(a ∩ b)/area(a),
    area(a ∩ b)/area(b)), with an empty denominator reported as 1 —
    'zero area means full overlap by convention'."""
    from .builder import FULL, overlay_result_state
    from .layers import _region_overlay
    from .loops import Loop
    ra, rb, chains = _region_overlay(a_region, b_region,
                                     "intersection")
    loops = [Loop(c) for c in chains if len(c) >= 3]
    if loops:
        inter = loops
    else:
        state = overlay_result_state(ra, rb, "intersection", [])
        inter = FULL if state == "full" else []
    ia = region_area(inter)
    aa, ab = region_area(a_region), region_area(b_region)
    fa = 1.0 if aa <= 0.0 else min(1.0, ia / aa)
    fb = 1.0 if ab <= 0.0 else min(1.0, ia / ab)
    return fa, fb
