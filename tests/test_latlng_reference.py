"""Reference battery for the S2LatLng helpers
(s2latlng_test.cc:47-185): validity, normalization, point conversion
(poles / date line / negative zeros / random round-trips) and the
haversine distance."""
import math

import numpy as np
import pytest

from s2spark.kernels.region import (_latitude, _longitude, latlng_distance,
                                    latlng_is_valid, latlng_normalized,
                                    latlng_to_point, point_angle)

PI = math.pi
D = math.radians


def test_basic_validity_and_normalization():
    assert latlng_is_valid(PI / 4, PI / 2)
    assert latlng_is_valid(D(45), D(90))
    assert not latlng_is_valid(D(-91), 0)
    assert not latlng_is_valid(0, D(181))

    lat, lng = latlng_normalized(D(120), D(200))
    assert latlng_is_valid(lat, lng)
    assert lat == D(90)
    assert lng == pytest.approx(D(-160))

    lat, lng = latlng_normalized(D(-100), D(-360))
    assert latlng_is_valid(lat, lng)
    assert lat == D(-90)
    assert lng == pytest.approx(0.0)


def test_inf_nan_invalid():
    inf, nan = math.inf, math.nan
    assert not latlng_is_valid(inf, D(-122))
    assert not latlng_is_valid(D(37), inf)
    assert not latlng_is_valid(*latlng_normalized(inf, D(-122)))
    assert not latlng_is_valid(*latlng_normalized(D(37), inf))
    assert not latlng_is_valid(nan, D(-122))
    assert not latlng_is_valid(*latlng_normalized(D(37), nan))


def test_conversion_special_cases():
    # poles and date line
    p = latlng_to_point(D(90), D(65))
    assert math.degrees(_latitude(p)) == pytest.approx(90.0)
    p = latlng_to_point(-PI / 2, 1)
    assert _latitude(p) == -PI / 2
    p = latlng_to_point(D(12.2), D(180))
    assert abs(math.degrees(_longitude(p))) == pytest.approx(180.0)
    p = latlng_to_point(0.1, -PI)
    assert abs(_longitude(p)) == PI


def test_conversion_roundtrip():
    rng = np.random.default_rng(2026)
    for _ in range(20000):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        p = tuple(v)
        q = latlng_to_point(_latitude(p), _longitude(p))
        assert point_angle(p, q) < 1e-14


def _is_identical(x, y):
    return x == y and math.copysign(1, x) == math.copysign(1, y)


def test_negative_zeros():
    assert _is_identical(_latitude((1.0, 0.0, -0.0)), +0.0)
    assert _is_identical(_longitude((1.0, -0.0, 0.0)), +0.0)
    assert _is_identical(_longitude((-1.0, -0.0, 0.0)), PI)
    assert _is_identical(_longitude((-0.0, 0.0, 1.0)), +0.0)
    assert _is_identical(_longitude((-0.0, -0.0, 1.0)), +0.0)


def test_distance():
    assert latlng_distance(D(90), 0, D(90), 0) == 0.0
    assert math.degrees(latlng_distance(
        D(-37), D(25), D(-66), D(-155))) == pytest.approx(77.0, abs=1e-13)
    assert math.degrees(latlng_distance(
        D(0), D(165), D(0), D(-80))) == pytest.approx(115.0, abs=1e-13)
    assert math.degrees(latlng_distance(
        D(47), D(-127), D(-47), D(53))) == pytest.approx(180.0, abs=2e-6)
