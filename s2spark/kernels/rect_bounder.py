"""S2LatLngRectBounder: conservative lat/lng rectangle bound for edge
chains (ported semantics from s2latlng_rect_bounder.cc:26-210 —
edge-interior latitude extrema included with certified error
margins).  Tighter than the cap-through-vertices bound for skinny
loops; GetBound() pads latitude by 2*DBL_EPSILON and applies the
polar closure, exactly like the reference.
"""

from __future__ import annotations

import math

import numpy as np

from .region import LatLngRect, R1Interval, S1Interval

DBL_EPSILON = 2.220446049250313e-16


def _latlng(p) -> tuple[float, float]:
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    return (math.atan2(z, math.sqrt(x * x + y * y)), math.atan2(y, x))


class RectBounder:
    def __init__(self):
        self.bound = LatLngRect.empty()
        self._a = None
        self._a_latlng = None

    def add_point(self, b) -> None:
        b = np.asarray(b, dtype=np.float64)
        b_lat, b_lng = _latlng(b)
        if self.bound.is_empty():
            self.bound = LatLngRect(R1Interval(b_lat, b_lat),
                                    S1Interval.from_point_pair(b_lng,
                                                               b_lng))
            self._a, self._a_latlng = b, (b_lat, b_lng)
            return
        a = self._a
        a_lat, a_lng = self._a_latlng
        # N = (A - B) x (A + B) = 2 (A x B), computed robustly
        n = np.cross(a - b, a + b)
        n_norm = float(np.linalg.norm(n))
        if n_norm < 1.91346e-15:
            # nearly identical or antipodal (s2latlng_rect_bounder.cc:74)
            if float(np.dot(a, b)) < 0:
                self.bound = LatLngRect.full()
            else:
                rect = LatLngRect(
                    R1Interval.from_point_pair(a_lat, b_lat),
                    S1Interval.from_point_pair(a_lng, b_lng))
                self.bound = _rect_union(self.bound, rect)
        else:
            lng_ab = S1Interval.from_point_pair(a_lng, b_lng)
            if lng_ab.get_length() >= math.pi - 2 * DBL_EPSILON:
                lng_ab = S1Interval.full()
            lat_ab = R1Interval.from_point_pair(a_lat, b_lat)
            # does AB cross the plane through N and the Z-axis?
            m = np.cross(n, np.array([0.0, 0.0, 1.0]))
            m_a = float(np.dot(m, a))
            m_b = float(np.dot(m, b))
            m_error = 6.06638e-16 * n_norm + 6.83174e-31
            if (m_a * m_b < 0 or abs(m_a) <= m_error
                    or abs(m_b) <= m_error):
                max_lat = min(
                    math.atan2(math.sqrt(n[0] * n[0] + n[1] * n[1]),
                               abs(n[2])) + 3 * DBL_EPSILON,
                    math.pi / 2)
                lat_budget_z = (0.5 * float(np.linalg.norm(a - b))
                                * math.sin(max_lat))
                lat_budget = 2 * math.asin(
                    min((1 + 4 * DBL_EPSILON) * lat_budget_z, 1.0))
                max_delta = 0.5 * (lat_budget
                                   - (lat_ab.hi - lat_ab.lo)) \
                    + DBL_EPSILON
                lo, hi = lat_ab.lo, lat_ab.hi
                if m_a <= m_error and m_b >= -m_error:
                    hi = min(max_lat, hi + max_delta)
                if m_b <= m_error and m_a >= -m_error:
                    lo = max(-max_lat, lo - max_delta)
                lat_ab = R1Interval(lo, hi)
            self.bound = _rect_union(self.bound,
                                     LatLngRect(lat_ab, lng_ab))
        self._a, self._a_latlng = b, (b_lat, b_lng)

    def get_bound(self) -> LatLngRect:
        """Pad latitude by 2*DBL_EPSILON + polar closure
        (s2latlng_rect_bounder.cc:188-210)."""
        return self.bound.expanded(2 * DBL_EPSILON, 0.0).polar_closure()


def _rect_union(a: LatLngRect, b: LatLngRect) -> LatLngRect:
    if a.is_empty():
        return b
    if b.is_empty():
        return a
    return LatLngRect(a.lat.union(b.lat), a.lng.union(b.lng))


def loop_rect_bound(vertices: np.ndarray) -> LatLngRect:
    """Rect bound of a closed vertex chain (S2Loop::GetRectBound
    shape: every edge including the closing one)."""
    v = np.asarray(vertices, dtype=np.float64)
    rb = RectBounder()
    for p in v:
        rb.add_point(p)
    if len(v):
        rb.add_point(v[0])
    return rb.get_bound()
