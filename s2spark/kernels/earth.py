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


# -- solid angle (s2earth.h:105-120) ---------------------------------------

def square_km_to_steradians(km2: float) -> float:
    return km2 / (RADIUS_KM * RADIUS_KM)


def steradians_to_square_km(sr: float) -> float:
    return sr * RADIUS_KM * RADIUS_KM


def square_meters_to_steradians(m2: float) -> float:
    return m2 / (RADIUS_METERS * RADIUS_METERS)


def steradians_to_square_meters(sr: float) -> float:
    return sr * RADIUS_METERS * RADIUS_METERS


# -- east-west distance at a latitude (s2earth.cc:38-44) -------------------

def meters_to_longitude_radians(meters: float,
                                latitude_radians: float) -> float:
    """Longitude radians spanning `meters` east-west at the latitude;
    capped at 2*pi (and exactly 2*pi at the poles instead of dividing
    by ~0)."""
    scalar = math.cos(latitude_radians)
    if scalar == 0:
        return 2 * math.pi
    return min(meters_to_radians(meters) / scalar, 2 * math.pi)


def km_to_longitude_radians(km: float, latitude_radians: float) -> float:
    return meters_to_longitude_radians(1000.0 * km, latitude_radians)


# -- bearing and great-circle distance (s2earth.cc:27-56) ------------------

def get_initial_bearing(lat1: float, lng1: float,
                        lat2: float, lng2: float) -> float:
    """Initial bearing radians (clockwise from north) of the great
    circle from (lat1, lng1) to (lat2, lng2), all in radians — the
    standard forward-azimuth formula with the haversine form of the
    latitude term for stability near zero."""
    cos_lat2 = math.cos(lat2)
    lng_diff = lng2 - lng1
    hav = math.sin(0.5 * lng_diff) ** 2
    x = math.sin(lat2 - lat1) + math.sin(lat1) * cos_lat2 * 2 * hav
    y = math.sin(lng_diff) * cos_lat2
    return math.atan2(y, x)


def get_distance_meters(a, b) -> float:
    """Arc distance in meters between two unit xyz points."""
    c = (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
         a[0] * b[1] - a[1] * b[0])
    dot = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
    return radians_to_meters(
        math.atan2(math.sqrt(c[0] ** 2 + c[1] ** 2 + c[2] ** 2), dot))


def get_distance_km(a, b) -> float:
    return get_distance_meters(a, b) / 1000.0


# s2earth.h:277-279
LOWEST_ALTITUDE_METERS = -10898.0
HIGHEST_ALTITUDE_METERS = 8846.0
