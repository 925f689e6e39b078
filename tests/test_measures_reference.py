"""Point-level measure parity with the reference's s2measures_test.cc
and s2centroids_test.cc batteries (Angle/TurnAngle/Area/GirardArea/
SignedArea, Planar/True centroids).

Random sweeps use a fixed NumPy seed in place of the reference's absl
BitGen — the assertions are property bounds, not seed-dependent
values."""

import math

import numpy as np
import pytest

from s2spark.kernels.shape_measures import (
    angle, area, girard_area, planar_centroid, signed_area, stable_angle,
    true_centroid_edge, true_centroid_triangle, turn_angle,
)
from s2spark.kernels.pointutil import tangent_frame


def _n(*xyz):
    v = np.array(xyz, dtype=np.float64)
    return v / np.linalg.norm(v)


def _ll(lat_deg, lng_deg):
    lat = math.radians(lat_deg)
    lng = math.radians(lng_deg)
    return np.array([math.cos(lat) * math.cos(lng),
                     math.cos(lat) * math.sin(lng),
                     math.sin(lat)])


PZ = np.array([0.0, 0.0, 1.0])
P000 = np.array([1.0, 0.0, 0.0])
P045 = _n(1, 1, 0)
P090 = np.array([0.0, 1.0, 0.0])
P180 = np.array([-1.0, 0.0, 0.0])


def test_angle_methods():
    # s2measures_test.cc:34-54 (EXPECT_DOUBLE_EQ → 4-ulp rel tol)
    assert angle(P000, PZ, P045) == pytest.approx(math.pi / 4, rel=1e-15)
    assert turn_angle(P000, PZ, P045) == pytest.approx(-3 * math.pi / 4,
                                                       rel=1e-15)
    assert angle(P045, PZ, P180) == pytest.approx(3 * math.pi / 4, rel=1e-15)
    assert turn_angle(P045, PZ, P180) == pytest.approx(-math.pi / 4,
                                                       rel=1e-15)
    assert angle(P000, PZ, P180) == pytest.approx(math.pi, rel=1e-15)
    assert turn_angle(P000, PZ, P180) == pytest.approx(0, abs=1e-15)
    assert angle(PZ, P000, P045) == pytest.approx(math.pi / 2, rel=1e-15)
    assert turn_angle(PZ, P000, P045) == pytest.approx(math.pi / 2,
                                                       rel=1e-15)
    assert angle(PZ, P000, PZ) == pytest.approx(0, abs=1e-15)
    assert abs(turn_angle(PZ, P000, PZ)) == pytest.approx(math.pi, rel=1e-15)


def test_area_basic():
    # s2measures_test.cc:56-80
    assert area(P000, P090, PZ) == pytest.approx(math.pi / 2, rel=1e-15)
    assert area(P045, PZ, P180) == pytest.approx(3 * math.pi / 4, rel=1e-15)

    eps = 1e-10
    pepsx = _n(eps, 0, 1)
    pepsy = _n(0, eps, 1)
    expected1 = 0.5 * eps * eps
    assert area(pepsx, pepsy, PZ) == pytest.approx(expected1,
                                                   rel=1e-14 / 1e-14 * 1e-14)

    pr = _n(0.257, -0.5723, 0.112)
    pq = _n(-0.747, 0.401, 0.2235)
    assert area(pr, pr, pr) == 0
    assert area(pr, pq, pr) == pytest.approx(0, abs=1e-15)
    assert area(P000, P045, P090) == 0


def test_area_girard_small_triangles():
    # s2measures_test.cc:86-100: perturbations ~1e-15 off a random
    # point give triangle areas <= 0.7e-30, and GirardArea stays below
    # 1e-14 only because of the robust cross product.
    rng = np.random.RandomState(20260820)
    max_girard = 0.0
    for _ in range(10000):
        p0 = _n(*rng.randn(3))
        d1 = _n(*rng.randn(3))
        d2 = _n(*rng.randn(3))
        p1 = _n(*(p0 + 1e-15 * d1))
        p2 = _n(*(p0 + 1e-15 * d2))
        assert area(p0, p1, p2) <= 0.7e-30
        max_girard = max(max_girard, girard_area(p0, p1, p2))
    assert max_girard <= 1e-14


def test_area_long_skinny():
    # s2measures_test.cc:102-105 (Mathematica-derived expectation)
    eps = 1e-10
    p045eps = _n(1, 1, eps)
    expected2 = 5.8578643762690495119753e-11
    assert area(P000, p045eps, P090) == pytest.approx(expected2, rel=1e-9)


def test_area_quarter_sphere_sums():
    # s2measures_test.cc:107-122: triangles with near-180-degree edges
    # that sum exactly (to double precision) to a quarter sphere.
    eps2 = 1e-14
    p000eps2 = _n(1, 0.1 * eps2, eps2)
    q1 = (area(p000eps2, P000, P045) + area(p000eps2, P045, P180)
          + area(p000eps2, P180, PZ) + area(p000eps2, PZ, P000))
    assert q1 == pytest.approx(math.pi, rel=1e-15)

    p045eps2 = _n(1, 1, eps2)
    q2 = (area(p045eps2, P000, P045) + area(p045eps2, P045, P180)
          + area(p045eps2, P180, PZ) + area(p045eps2, PZ, P000))
    assert q2 == pytest.approx(math.pi, rel=1e-15)


def test_area_hemisphere_near_degenerate():
    # s2measures_test.cc:124-137: hemisphere area from four triangles
    # with one near-180-degree edge and one near-degenerate edge.
    rng = np.random.RandomState(7)
    for _ in range(100):
        lng = rng.uniform(0, 2 * math.pi)
        p0 = _n(*_ll(math.degrees(1e-20), math.degrees(lng)))
        p1 = _ll(0, math.degrees(lng))
        p2 = _ll(0, math.degrees(lng + rng.uniform(0, 1)))
        p3 = _ll(0, math.degrees(lng + math.pi))
        p4 = _ll(0, math.degrees(lng + 5.0))
        total = (area(p0, p1, p2) + area(p0, p2, p3)
                 + area(p0, p3, p4) + area(p0, p4, p1))
        assert total == pytest.approx(2 * math.pi, abs=2e-15)


def test_area_zero_rounding_case():
    # s2measures_test.cc:139-143: zero-area triangle where naive
    # dmin > 0 from rounding would miss the Girard fallback.
    assert area(_ll(-45, -170), _ll(45, -170), _ll(0, -170)) == 0.0


def test_area_regression_b229644268():
    # s2measures_test.cc:150-158: catastrophic cross-product error
    # once made Area() skip the Girard fallback (1e-14 vs true 1e-21).
    a = np.array([-1.705424004316021258e-01, -8.242696197922716461e-01,
                  5.399026611737816062e-01])
    b = np.array([-1.706078905422188652e-01, -8.246067119418969416e-01,
                  5.393669607095969987e-01])
    c = np.array([-1.705800600596222294e-01, -8.244634596153025408e-01,
                  5.395947061167500891e-01])
    assert area(a, b, c) == 0


def test_signed_area_orientation():
    assert signed_area(P000, P090, PZ) == pytest.approx(math.pi / 2,
                                                        rel=1e-15)
    assert signed_area(P090, P000, PZ) == pytest.approx(-math.pi / 2,
                                                        rel=1e-15)
    assert signed_area(P000, P045, P090) == 0


def test_stable_angle_matches_naive_in_easy_regime():
    rng = np.random.RandomState(3)
    for _ in range(200):
        a = _n(*rng.randn(3))
        b = _n(*rng.randn(3))
        naive = math.atan2(float(np.linalg.norm(np.cross(a, b))),
                           float(np.dot(a, b)))
        assert stable_angle(a, b) == pytest.approx(naive, abs=1e-14)


# --------------------------------------------------------------------------
# s2centroids_test.cc
# --------------------------------------------------------------------------

def test_planar_centroid_semi_equator():
    # s2centroids_test.cc:33-43
    a = np.array([0.0, -1.0, 0.0])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([0.0, 1.0, 0.0])
    cen = planar_centroid(a, b, c)
    assert np.allclose(cen / np.linalg.norm(cen), b, atol=1e-15)
    assert float(np.linalg.norm(cen)) == pytest.approx(1 / 3.0, rel=1e-15)


def test_triangle_true_centroid_small_triangles():
    # s2centroids_test.cc:45-65: nearly planar triangles — centroid at
    # the intersection of the medians.
    rng = np.random.RandomState(11)
    for _ in range(100):
        p = _n(*rng.randn(3))
        x, y = tangent_frame(p)
        x, y = x[0], y[0]
        d = 10.0 ** rng.uniform(-8, -4)
        p0 = _n(*(p - d * x))
        p1 = _n(*(p + d * x))
        p2 = _n(*(p + 3 * d * y))
        cen = true_centroid_triangle(p0, p1, p2)
        cen = cen / np.linalg.norm(cen)
        expected = _n(*(p + d * y))
        ang = math.atan2(float(np.linalg.norm(np.cross(cen, expected))),
                         float(np.dot(cen, expected)))
        assert ang <= 2e-8


def test_edge_true_centroid_semi_equator():
    # s2centroids_test.cc:67-76
    a = np.array([0.0, -1.0, 0.0])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([0.0, 1.0, 0.0])
    cen = true_centroid_edge(a, b) + true_centroid_edge(b, c)
    assert np.allclose(cen / np.linalg.norm(cen), b, atol=1e-15)
    assert float(np.linalg.norm(cen)) == pytest.approx(2.0, rel=1e-15)


def test_edge_true_centroid_great_circles():
    # s2centroids_test.cc:78-106: a closed great circle's accumulated
    # edge centroid is the sphere center regardless of segmentation.
    rng = np.random.RandomState(13)
    for _ in range(100):
        z = _n(*rng.randn(3))
        x, y = tangent_frame(z)
        x, y = x[0], y[0]
        centroid = np.zeros(3)
        v0 = x.copy()
        theta = 0.0
        while True:
            theta += rng.uniform(0, 1) ** 10
            if theta >= 2 * math.pi:
                break
            v1 = math.cos(theta) * x + math.sin(theta) * y
            centroid += true_centroid_edge(v0, v1)
            v0 = v1
        centroid += true_centroid_edge(v0, x)
        assert float(np.linalg.norm(centroid)) <= 2e-14
