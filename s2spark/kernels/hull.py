"""S2ConvexHullQuery: spherical convex hull via Andrew's monotone
chain (re-implemented from the reference's published algorithm,
s2convex_hull_query.cc:117-180; fixtures from
s2convex_hull_query_test.cc in tests/test_hull.py).

Points are sorted CCW around an origin orthogonal to the bounding
cap's center (so all points lie on one side of a geodesic through the
origin), then the lower/upper chains keep only left (CCW) turns —
each decided by the robust Sign predicate, so hulls are exact for any
input in an open hemisphere.  Inputs spanning a hemisphere or more
return None (the full-sphere hull, S2Loop::kFull in the reference).
"""

from __future__ import annotations

import numpy as np

from . import predicates

DBL_ERR = predicates.DBL_EPSILON / 2


def _ortho(p: np.ndarray) -> np.ndarray:
    """Unit vector orthogonal to p (s2pointutil.h Ortho)."""
    return np.array(predicates.ref_dir(tuple(p)), dtype=np.float64)


def _sign(a, b, c) -> int:
    return predicates._sign_scalar(tuple(a), tuple(b), tuple(c))


def _bound_cap(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Centroid cap through all points -> (center, height).

    Any valid cap works: the origin derived from it only needs the
    one-sided guarantee, and the hull itself is origin-independent.
    """
    c = points.mean(axis=0)
    n = np.linalg.norm(c)
    if n < 1e-12:
        return np.array([1.0, 0.0, 0.0]), 2.0  # spans the sphere
    c = c / n
    chord2 = float(((points - c) ** 2).sum(axis=1).max())
    return c, chord2 / 2.0  # cap height = chord^2 / 2


def _monotone_chain(pts: list[np.ndarray]) -> list[np.ndarray]:
    out: list[np.ndarray] = []
    for p in pts:
        while len(out) >= 2 and _sign(out[-2], out[-1], p) <= 0:
            out.pop()
        out.append(p)
    return out


def convex_hull(points: np.ndarray) -> np.ndarray | None:
    """(n,3) unit points -> hull loop vertices (m,3) in CCW order, or
    None when the hull is the full sphere.  Fewer than 3 distinct
    points return the degenerate loops the reference constructs
    (s2convex_hull_query.cc:183-226 semantics, simplified: the points
    themselves)."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 0:
        return pts.reshape(0, 3)
    center, height = _bound_cap(pts)
    if height >= 1 - 10 * DBL_ERR:
        return None  # full
    origin = _ortho(center)

    # CCW-around-origin order (s2convex_hull_query.cc:104-114):
    # Sign(origin, x, y) > 0 means x precedes y
    import functools
    order = sorted(range(len(pts)), key=functools.cmp_to_key(
        lambda i, j: -_sign(origin, pts[i], pts[j])))
    seq = [pts[i] for i in order]
    # dedup exact duplicates (sorted CCW -> duplicates adjacent)
    dedup: list[np.ndarray] = []
    for p in seq:
        if not dedup or not np.array_equal(dedup[-1], p):
            dedup.append(p)
    if len(dedup) < 3:
        return np.array(dedup)
    lower = _monotone_chain(dedup)
    upper = _monotone_chain(list(reversed(dedup)))
    return np.array(lower[:-1] + upper[:-1])


def convex_hull_of_loop(loop) -> np.ndarray | None:
    """AddLoop semantics (s2convex_hull_query.cc:64-74): the hull must
    contain the loop's INTERIOR, not just its vertices — the reference
    tracks this through the loop's rect bound (a loop whose interior
    reaches a pole and crosses the equator has a non-convex cap bound
    -> full sphere).  Specialized here: interior contains a pole and
    the vertices reach past the equator => full; otherwise the vertex
    hull (which then contains the interior)."""
    v = loop.vertices
    if loop.contains_point((0.0, 0.0, 1.0)) and float(v[:, 2].min()) <= 0:
        return None
    if loop.contains_point((0.0, 0.0, -1.0)) and float(v[:, 2].max()) >= 0:
        return None
    return convex_hull(v)


def hull_indices(points: np.ndarray) -> np.ndarray | None:
    """Indices (into `points`) of the hull vertices, rotated so the
    smallest index comes first (canonical cyclic order); None = full
    sphere."""
    hull = convex_hull(points)
    if hull is None:
        return None
    pts = np.asarray(points, dtype=np.float64)
    idx = []
    for v in hull:
        hit = np.nonzero((pts == v).all(axis=1))[0]
        idx.append(int(hit[0]))
    if not idx:
        return np.array([], dtype=np.int64)
    arr = np.array(idx, dtype=np.int64)
    rot = int(np.argmin(arr))
    return np.roll(arr, -rot)
