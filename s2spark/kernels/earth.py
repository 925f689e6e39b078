"""S2Earth: metric <-> angular conversions (s2earth.h:147-183, 269).

The engine works in radians / squared-chord units internally; user
APIs take meters/kilometers through these helpers.
"""

from __future__ import annotations

import math

RADIUS_METERS = 6_371_010.0          # s2earth.h:269
RADIUS_KM = RADIUS_METERS / 1000.0


def meters_to_radians(m: float) -> float:
    return m / RADIUS_METERS


def radians_to_meters(rad: float) -> float:
    return rad * RADIUS_METERS


def km_to_radians(km: float) -> float:
    return km * 1000.0 / RADIUS_METERS


def radians_to_km(rad: float) -> float:
    return rad * RADIUS_KM


def chord2_to_meters(c2: float) -> float:
    """Squared chord distance -> arc length in meters."""
    c2 = min(max(c2, 0.0), 4.0)
    return radians_to_meters(2.0 * math.asin(0.5 * math.sqrt(c2)))


def meters_to_chord2(m: float) -> float:
    ang = min(meters_to_radians(m), math.pi)
    return (2.0 * math.sin(0.5 * ang)) ** 2
