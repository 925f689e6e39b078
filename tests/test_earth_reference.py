"""S2Earth conversions vs the reference fixtures (s2earth_test.cc:31-160)."""
import math

import pytest

from s2spark.kernels import earth
from s2spark.kernels.region import latlng_to_point


def test_angle_conversion():
    # s2earth_test.cc:31-55 (angle/chord/meter/km identities)
    assert earth.meters_to_radians(earth.RADIUS_METERS) == 1.0
    assert earth.meters_to_radians(earth.radians_to_km(0.3) * 1000) == \
        pytest.approx(0.3, rel=1e-15)
    assert earth.radians_to_meters(math.pi) == \
        pytest.approx(earth.RADIUS_METERS * math.pi, rel=1e-15)
    assert earth.radians_to_meters(earth.km_to_radians(2.5)) == \
        pytest.approx(2500, rel=1e-15)
    assert earth.km_to_radians(earth.RADIUS_METERS / 1000) == 1.0
    assert earth.radians_to_km(0.5) == 0.5 * earth.RADIUS_KM
    # chord2 of a straight angle is the full chord (diameter squared / R^2)
    assert earth.meters_to_chord2(earth.RADIUS_METERS * math.pi) == \
        pytest.approx(4.0, rel=1e-15)
    assert earth.chord2_to_meters(earth.meters_to_chord2(1234.5)) == \
        pytest.approx(1234.5, rel=1e-12)


def test_solid_angle_conversion():
    # s2earth_test.cc:68-78
    assert earth.square_km_to_steradians(
        (earth.RADIUS_METERS / 1000) ** 2) == pytest.approx(1, rel=1e-15)
    assert earth.steradians_to_square_km(0.5 ** 2) == \
        pytest.approx((0.5 * earth.RADIUS_KM) ** 2, rel=1e-15)
    assert earth.square_meters_to_steradians(
        (earth.radians_to_km(0.3) * 1000) ** 2) == \
        pytest.approx(0.3 ** 2, rel=1e-15)
    assert earth.steradians_to_square_meters(
        earth.km_to_radians(2.5) ** 2) == pytest.approx(2500 ** 2, rel=1e-15)


def test_to_longitude_radians():
    # s2earth_test.cc:80-105
    r = earth.RADIUS_METERS
    assert earth.meters_to_longitude_radians(r, 0) == 1.0
    assert earth.meters_to_longitude_radians(r, 0.5) > \
        earth.meters_to_longitude_radians(r, 0.4)
    assert earth.meters_to_longitude_radians(r, math.pi / 2) == 2 * math.pi
    assert earth.meters_to_longitude_radians(r, math.pi / 2 - 1e-4) == \
        2 * math.pi
    assert earth.km_to_longitude_radians(r / 1000.0, 0.5) == \
        pytest.approx(earth.meters_to_longitude_radians(r, 0.5), rel=1e-15)


BEARING_CASES = [
    # (description, a_deg, b_deg, bearing_deg) — s2earth_test.cc:107-139
    ("westward on equator", (0, 50), (0, 100), 90),
    ("eastward on equator", (0, 50), (0, 0), -90),
    ("northward on meridian", (16, 28), (81, 28), 0),
    ("southward on meridian", (24, 64), (-27, 64), 180),
    ("towards north pole", (12, 76), (90, 50), 0),
    ("towards south pole", (-35, 105), (-90, -120), 180),
    ("Spain to Japan", (40.4379332, -3.749576),
     (35.6733227, 139.6403486), 29.2),
    ("Japan to Spain", (35.6733227, 139.6403486),
     (40.4379332, -3.749576), -27.2),
]


def test_get_initial_bearing():
    for desc, a, b, want_deg in BEARING_CASES:
        got = math.degrees(earth.get_initial_bearing(
            math.radians(a[0]), math.radians(a[1]),
            math.radians(b[0]), math.radians(b[1])))
        diff = (got - want_deg + 180) % 360 - 180
        assert abs(diff) <= 1e-2, desc


def test_get_distance():
    # s2earth_test.cc:141-160
    north, south = (0.0, 0.0, 1.0), (0.0, 0.0, -1.0)
    west = (0.0, -1.0, 0.0)
    assert earth.get_distance_meters(north, south) == \
        pytest.approx(math.pi * earth.RADIUS_METERS, rel=1e-15)
    assert earth.get_distance_km(west, west) == 0.0
    assert earth.get_distance_meters(north, west) == \
        pytest.approx(math.pi / 2 * earth.RADIUS_METERS, rel=1e-15)
    a = latlng_to_point(math.radians(0), math.radians(-90))
    b = latlng_to_point(math.radians(-90), math.radians(-38))
    assert earth.get_distance_meters(a, b) == \
        pytest.approx(earth.get_distance_meters(west, south), rel=1e-6)
    assert earth.get_distance_km(
        latlng_to_point(0, 0.6), latlng_to_point(0, -0.4)) == \
        pytest.approx(earth.RADIUS_KM, rel=1e-12)


def test_altitude_bounds():
    assert earth.LOWEST_ALTITUDE_METERS == -10898
    assert earth.HIGHEST_ALTITUDE_METERS == 8846
