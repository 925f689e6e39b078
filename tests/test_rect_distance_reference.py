"""S2LatLngRect GetDistance / GetDirectedHausdorffDistance parity
against the reference's own verifiers (s2latlng_rect_test.cc:688-1010):
the brute-force distance checker (16 point-vs-lat-edge + 16
point-vs-lng-edge tests), the grid-sampling Hausdorff bound, and the
fixed fixture cases, quoted verbatim; random sweeps use a fixed numpy
seed instead of the reference's tagged bitgen."""

import math

import numpy as np

from s2spark.kernels.region import (LatLngRect, R1Interval, S1Interval,
                                    _edge_angle_distance, latlng_to_point,
                                    point_angle)

RAD = math.radians


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    return LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def _norm_lng(lng_deg):
    return math.remainder(lng_deg, 360.0)


def point_rect_deg(lat, lng):
    return LatLngRect.from_point(RAD(lat), RAD(_norm_lng(lng)))


def _latlng_angle(lat1, lng1, lat2, lng2):
    return point_angle(latlng_to_point(lat1, lng1),
                       latlng_to_point(lat2, lng2))


def _lat_edge_distance(lat_p, lng_p, lat_edge, interval: S1Interval):
    # test helper GetDistance(x, lat, interval)
    # (s2latlng_rect_test.cc:689-702)
    if interval.contains(lng_p):
        return abs(lat_p - lat_edge)
    return min(_latlng_angle(lat_p, lng_p, lat_edge, interval.lo),
               _latlng_angle(lat_p, lng_p, lat_edge, interval.hi))


def brute_distance(a: LatLngRect, b: LatLngRect) -> float:
    # BruteForceDistance (s2latlng_rect_test.cc:704-751)
    if a.intersects_rect(b):
        return 0.0
    pnt_a = [(a.lat.lo, a.lng.lo), (a.lat.lo, a.lng.hi),
             (a.lat.hi, a.lng.hi), (a.lat.hi, a.lng.lo)]
    pnt_b = [(b.lat.lo, b.lng.lo), (b.lat.lo, b.lng.hi),
             (b.lat.hi, b.lng.hi), (b.lat.hi, b.lng.lo)]
    lat_a, lat_b = (a.lat.lo, a.lat.hi), (b.lat.lo, b.lat.hi)
    lng_edge_a = [(latlng_to_point(*pnt_a[0]), latlng_to_point(*pnt_a[3])),
                  (latlng_to_point(*pnt_a[1]), latlng_to_point(*pnt_a[2]))]
    lng_edge_b = [(latlng_to_point(*pnt_b[0]), latlng_to_point(*pnt_b[3])),
                  (latlng_to_point(*pnt_b[1]), latlng_to_point(*pnt_b[2]))]
    best = math.pi
    for i in range(4):
        ca, cb = pnt_a[i], pnt_b[i]
        for j in range(2):
            best = min(
                best,
                _lat_edge_distance(ca[0], ca[1], lat_b[j], b.lng),
                _lat_edge_distance(cb[0], cb[1], lat_a[j], a.lng),
                _edge_angle_distance(latlng_to_point(*ca),
                                     *lng_edge_b[j]),
                _edge_angle_distance(latlng_to_point(*cb),
                                     *lng_edge_a[j]))
    return best


def brute_rect_point_distance(a: LatLngRect, lat: float, lng: float
                              ) -> float:
    # BruteForceRectPointDistance (s2latlng_rect_test.cc:753-768)
    if a.contains_latlng(lat, lng):
        return 0.0
    p = latlng_to_point(lat, lng)
    return min(
        _lat_edge_distance(lat, lng, a.lat.lo, a.lng),
        _lat_edge_distance(lat, lng, a.lat.hi, a.lng),
        _edge_angle_distance(p, latlng_to_point(a.lat.lo, a.lng.lo),
                             latlng_to_point(a.lat.hi, a.lng.lo)),
        _edge_angle_distance(p, latlng_to_point(a.lat.lo, a.lng.hi),
                             latlng_to_point(a.lat.hi, a.lng.hi)))


def verify_distance(a: LatLngRect, b: LatLngRect):
    assert abs(brute_distance(a, b) - a.get_distance_rect(b)) < 1e-10


def verify_rect_point(a: LatLngRect, lat_deg, lng_deg):
    lat, lng = RAD(lat_deg), RAD(_norm_lng(lng_deg))
    got = a.get_distance_latlng(lat, lng)
    assert abs(brute_rect_point_distance(a, lat, lng) - got) < 1e-10


def verify_directed_hausdorff(a: LatLngRect, b: LatLngRect):
    # VerifyGetDirectedHausdorffDistance grid sampler
    # (s2latlng_rect_test.cc:896-930), resolution 0.1 rad
    h = a.get_directed_hausdorff(b)
    res = 0.1
    n_lat = int(a.lat.get_length() / res) + 1
    n_lng = int(a.lng.get_length() / res) + 1
    d_lat = a.lat.get_length() / n_lat
    d_lng = a.lng.get_length() / n_lng
    max_distance = 0.0
    for i in range(n_lng + 1):
        lng = a.lng.lo + i * d_lng
        lng = math.remainder(lng, 2 * math.pi)
        for j in range(n_lat + 1):
            lat = min(math.pi / 2, max(-math.pi / 2,
                                       a.lat.lo + j * d_lat))
            max_distance = max(max_distance,
                               b.get_distance_latlng(lat, lng))
    assert max_distance <= h + 1e-10
    assert max_distance >= h - res


# --- GetDistance fixed cases -----------------------------------------

def test_distance_overlapping():
    # s2latlng_rect_test.cc:797-811
    a = rect_deg(0, 0, 2, 2)
    assert a.get_distance_rect(a) == 0.0
    assert a.get_distance_rect(point_rect_deg(0, 2)) == 0.0
    assert point_rect_deg(0, 2).get_distance_rect(
        point_rect_deg(0, 2)) == 0.0
    assert a.get_distance_latlng(RAD(0), RAD(0)) == 0.0
    for r in ((0, 1, 2, 3), (0, 2, 2, 4), (1, 0, 3, 2), (2, 0, 4, 2),
              (1, 1, 3, 3), (2, 2, 4, 4)):
        assert a.get_distance_rect(rect_deg(*r)) == 0.0


def test_distance_rect_vs_point():
    # s2latlng_rect_test.cc:813-845
    a = rect_deg(-1, -1, 2, 1)
    for lat, lng in ((-2, -1), (1, 2)):
        verify_distance(a, point_rect_deg(lat, lng))
        verify_distance(point_rect_deg(lat, lng), a)
        verify_rect_point(a, lat, lng)
    b = point_rect_deg(90, 0)
    cases = ((87, 3), (87, -1), (89, 1), (89, 181), (85, 1),
             (85, 181), (90, 0))
    for lat, lng in cases:
        verify_distance(point_rect_deg(lat, lng), b)
        verify_rect_point(b, lat, lng)
    c = rect_deg(88, 0, 90, 2)
    for lat, lng in ((89, 3), (89, 90), (89, 181)):
        verify_distance(c, point_rect_deg(lat, lng))
        verify_distance(point_rect_deg(lat, lng), c)


def test_distance_rect_vs_rect():
    # s2latlng_rect_test.cc:847-861
    a = rect_deg(-1, -1, 2, 1)
    verify_distance(a, rect_deg(0, 2, 1, 3))
    verify_distance(a, rect_deg(-2, -3, -1, -2))
    b = rect_deg(-87, 0, -85, 3)
    for r in ((-89, 1, -88, 2), (-84, 1, -83, 2), (-88, 90, -86, 91),
              (-84, -91, -83, -90), (-90, 181, -89, 182),
              (-84, 181, -83, 182)):
        lat_lo, lng_lo, lat_hi, lng_hi = r
        verify_distance(b, rect_deg(lat_lo, _norm_lng(lng_lo),
                                    lat_hi, _norm_lng(lng_hi)))


def test_distance_random_pairs():
    # GetDistanceRandomPairs with a fixed numpy seed
    rng = np.random.default_rng(20260820)
    for _ in range(400):
        lats = rng.uniform(-math.pi / 2, math.pi / 2, 4)
        lngs = rng.uniform(-math.pi, math.pi, 4)
        a = LatLngRect.from_point_pair(lats[0], lngs[0], lats[1], lngs[1])
        b = LatLngRect.from_point_pair(lats[2], lngs[2], lats[3], lngs[3])
        verify_distance(a, b)
        lat, lng = rng.uniform(-math.pi / 2, math.pi / 2), \
            rng.uniform(-math.pi, math.pi)
        got = a.get_distance_latlng(lat, lng)
        assert abs(brute_rect_point_distance(a, lat, lng) - got) < 1e-10


# --- Hausdorff fixed cases --------------------------------------------

def test_hausdorff_contained():
    # s2latlng_rect_test.cc:958-969
    a = rect_deg(-10, 20, -5, 90)
    for r in ((-10, 20, -5, 90), (-10, 19, -5, 91), (-11, 20, -4, 90),
              (-11, 19, -4, 91)):
        assert a.get_directed_hausdorff(rect_deg(*r)) == 0.0


def _double_eq(x, y):
    # gtest EXPECT_DOUBLE_EQ: equal to within 4 ulps
    assert abs(x - y) <= 4 * np.spacing(max(abs(x), abs(y))), (x, y)


def test_hausdorff_point_to_rect():
    # s2latlng_rect_test.cc:971-995: from a point rect, directed
    # Hausdorff == distance (reference asserts EXPECT_DOUBLE_EQ —
    # the two code paths differ by ulps, there as here)
    a1 = point_rect_deg(5, 8)
    a2 = point_rect_deg(90, 10)
    for r in ((-85, -50, -80, 10), (4, -10, 80, 10),
              (70, 170, 80, -170)):
        b = LatLngRect(R1Interval(RAD(r[0]), RAD(r[2])),
                       S1Interval.from_bounds(RAD(r[1]), RAD(r[3])))
        _double_eq(a1.get_directed_hausdorff(b),
                   a1.get_distance_rect(b))
        _double_eq(a2.get_directed_hausdorff(b),
                   a2.get_distance_rect(b))


def test_hausdorff_rect_to_point_and_pole():
    # s2latlng_rect_test.cc:997-1010
    a = rect_deg(1, -8, 10, 20)
    for lat, lng in ((5, 8), (-6, -100), (-90, -20), (90, 0)):
        verify_directed_hausdorff(a, point_rect_deg(lat, lng))
    b = rect_deg(-87, 0, -85, 3)
    for r in ((-89, 1, -88, 2), (-84, 1, -83, 2)):
        verify_directed_hausdorff(b, rect_deg(*r))


def test_hausdorff_random_pairs():
    # GetDirectedHausdorffDistanceRandomPairs: point-pair rects and
    # their lng-complements, fixed seed
    rng = np.random.default_rng(8675309)
    for _ in range(150):
        lats = rng.uniform(-math.pi / 2, math.pi / 2, 4)
        lngs = rng.uniform(-math.pi, math.pi, 4)
        a = LatLngRect.from_point_pair(lats[0], lngs[0], lats[1], lngs[1])
        b = LatLngRect.from_point_pair(lats[2], lngs[2], lats[3], lngs[3])
        a2 = LatLngRect(a.lat, a.lng.complement())
        b2 = LatLngRect(b.lat, b.lng.complement())
        verify_directed_hausdorff(a, b)
        verify_directed_hausdorff(a, b2)
        verify_directed_hausdorff(a2, b)
        verify_directed_hausdorff(a2, b2)


def test_hausdorff_symmetric_wrapper():
    a = rect_deg(1, -8, 10, 20)
    b = rect_deg(-87, 0, -85, 3)
    assert a.get_hausdorff(b) == max(a.get_directed_hausdorff(b),
                                     b.get_directed_hausdorff(a))
    assert a.get_hausdorff(b) == b.get_hausdorff(a)
