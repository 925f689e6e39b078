"""S2 cell metrics for the quadratic projection.

Semantics match the reference (s2metrics.h:42-90, s2metrics.cc:39-124):
a metric's value at level L is deriv * 2^(-dim*L); the level inversions use
ilogb (floor log2) exactly as the reference does, so level selections agree
bit-for-bit.
"""

from __future__ import annotations

import math

MAX_LEVEL = 30


class Metric:
    __slots__ = ("deriv", "dim")

    def __init__(self, dim: int, deriv: float):
        self.dim = dim
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        return math.ldexp(self.deriv, -self.dim * level)

    def get_level_for_max_value(self, value: float) -> int:
        """Minimum level such that the metric is <= value (s2metrics.h:168-179)."""
        if value <= 0:
            return MAX_LEVEL
        level = math.frexp(value / self.deriv)[1] - 1  # ilogb
        return max(0, min(MAX_LEVEL, -(level >> (self.dim - 1))))

    def get_level_for_min_value(self, value: float) -> int:
        """Maximum level such that the metric is >= value (s2metrics.h:181-192)."""
        if value <= 0:
            return MAX_LEVEL
        level = math.frexp(self.deriv / value)[1] - 1  # ilogb
        return max(0, min(MAX_LEVEL, level >> (self.dim - 1)))

    def get_closest_level(self, value: float) -> int:
        return self.get_level_for_max_value(
            (math.sqrt(2) if self.dim == 1 else 2) * value)


# Quadratic-projection constants (s2metrics.cc:39-124)
MIN_ANGLE_SPAN = Metric(1, 4.0 / 3)
MAX_ANGLE_SPAN = Metric(1, 1.704897179199218452)
AVG_ANGLE_SPAN = Metric(1, math.pi / 2)
MIN_WIDTH = Metric(1, 2 * math.sqrt(2) / 3)
MAX_WIDTH = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_WIDTH = Metric(1, 1.434523672886099389)
MIN_EDGE = Metric(1, 2 * math.sqrt(2) / 3)
MAX_EDGE = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_EDGE = Metric(1, 1.459213746386106062)
MIN_DIAG = Metric(1, 8 * math.sqrt(2) / 9)
MAX_DIAG = Metric(1, 2.438654594434021032)
AVG_DIAG = Metric(1, 2.060422738998471683)
MIN_AREA = Metric(2, 8 * math.sqrt(2) / 9)
MAX_AREA = Metric(2, 2.635799256963161491)
AVG_AREA = Metric(2, 4 * math.pi / 6)
MAX_EDGE_ASPECT = 1.442615274452682920
MAX_DIAG_ASPECT = math.sqrt(3)

# Earth radius used by all meters<->radians helpers (s2earth.h:269)
EARTH_RADIUS_METERS = 6371010.0


def meters_to_radians(meters: float) -> float:
    return meters / EARTH_RADIUS_METERS


def radians_to_meters(radians: float) -> float:
    return radians * EARTH_RADIUS_METERS
