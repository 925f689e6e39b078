"""Polyline simplification: S2Polyline::SubsampleVertices
(s2polyline.cc:560-655), the tangent-wedge greedy scan.

Returns a *subsequence* of vertex indices such that the simplified
polyline stays within `tolerance` of every original vertex AND is
parametrically equivalent (backtracking preserved — vertices must be
encountered in increasing distance order along each output segment).
Verified against the reference's own SubsampleVertices fixture table
(s2polyline_test.cc:404-454) in tests/test_simplify.py.
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates


def _ortho(p: np.ndarray) -> np.ndarray:
    return np.array(predicates.ref_dir(tuple(p)), dtype=np.float64)


def _angle(a: np.ndarray, b: np.ndarray) -> float:
    """S2Point::Angle: atan2(|a×b|, a·b)."""
    c = np.cross(a, b)
    return math.atan2(float(np.linalg.norm(c)), float(np.dot(a, b)))


class _S1Interval:
    """Minimal S1Interval (interval on the unit circle, endpoints in
    (-pi, pi]) covering the operations the wedge scan needs."""

    __slots__ = ("lo", "hi", "full")

    def __init__(self, lo: float, hi: float, full: bool = False):
        self.lo, self.hi, self.full = lo, hi, full

    @classmethod
    def full_interval(cls) -> "_S1Interval":
        return cls(-math.pi, math.pi, full=True)

    @classmethod
    def from_point_expanded(cls, p: float, h: float) -> "_S1Interval":
        if h >= math.pi:
            return cls.full_interval()

        def norm(x: float) -> float:
            while x > math.pi:
                x -= 2 * math.pi
            while x <= -math.pi:
                x += 2 * math.pi
            return x

        return cls(norm(p - h), norm(p + h))

    def contains(self, x: float) -> bool:
        if self.full:
            return True
        if self.lo <= self.hi:
            return self.lo <= x <= self.hi
        return x >= self.lo or x <= self.hi

    def intersection(self, o: "_S1Interval") -> "_S1Interval | None":
        """Single-interval intersection (the scan's wedges are always
        < half the circle after the first constraint; the reference
        DCHECKs non-emptiness).  None = empty."""
        if self.full:
            return o
        if o.full:
            return self
        if o.contains(self.lo):
            lo = self.lo
        elif self.contains(o.lo):
            lo = o.lo
        else:
            return None
        if o.contains(self.hi):
            hi = self.hi
        elif self.contains(o.hi):
            hi = o.hi
        else:
            return None
        return _S1Interval(lo, hi)


def _find_end_vertex(vertices: np.ndarray, tolerance: float,
                     index: int) -> int:
    """Largest end index such that the single edge (index, end) stays
    within tolerance of all intermediate vertices
    (s2polyline.cc:560-637)."""
    origin = vertices[index]
    z = origin
    y = _ortho(z)
    x = np.cross(y, z)
    wedge = _S1Interval.full_interval()
    last_distance = 0.0
    n = len(vertices)
    index += 1
    while index < n:
        candidate = vertices[index]
        distance = _angle(origin, candidate)
        if distance > math.pi / 2 and last_distance > 0:
            break
        if distance < last_distance and last_distance > tolerance:
            break
        last_distance = distance
        if distance <= tolerance:
            index += 1
            continue
        # direction in the tangent frame
        dx = float(np.dot(candidate, x))
        dy = float(np.dot(candidate, y))
        center = math.atan2(dy, dx)
        if not wedge.contains(center):
            break
        half_angle = math.asin(min(1.0, math.sin(tolerance)
                                   / math.sin(distance)))
        target = _S1Interval.from_point_expanded(center, half_angle)
        nxt = wedge.intersection(target)
        if nxt is None:
            break
        wedge = nxt
        index += 1
    return index - 1


def dtw_cost(a: np.ndarray, b: np.ndarray) -> float:
    """Exact dynamic-timewarp alignment cost between two vertex chains
    (S2PolylineAlignment::GetExactVertexAlignmentCost semantics,
    s2polyline_alignment.h:16-27): min over monotone warp paths of the
    summed squared chord distances, O(n*m) DP."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return math.inf
    # pairwise squared chord distances, vectorized
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
    cost = np.full((n, m), np.inf)
    cost[0, 0] = d[0, 0]
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                continue
            best = np.inf
            if i > 0:
                best = min(best, cost[i - 1, j])
            if j > 0:
                best = min(best, cost[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, cost[i - 1, j - 1])
            cost[i, j] = d[i, j] + best
    return float(cost[n - 1, m - 1])


def subsample_vertices(vertices: np.ndarray,
                       tolerance_rad: float) -> list[int]:
    """Indices of the kept subsequence (s2polyline.cc:640-655)."""
    v = np.asarray(vertices, dtype=np.float64)
    n = len(v)
    if n == 0:
        return []
    out = [0]
    tol = max(tolerance_rad, 0.0)
    index = 0
    while index + 1 < n:
        next_index = _find_end_vertex(v, tol, index)
        if not np.array_equal(v[next_index], v[index]):
            out.append(next_index)
        index = next_index
    return out
