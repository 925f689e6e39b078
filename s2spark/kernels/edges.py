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
