"""S2Cap / S2LatLngRect op parity against the reference's own test
batteries (s2cap_test.cc Basic/AddCap/GetRectBound/Expanded/Union;
s2latlng_rect_test.cc IntervalOps/AddPoint): fixture values and
expected verdicts quoted verbatim."""

import math

import numpy as np

from s2spark.kernels.region import (Cap, LatLngRect, R1Interval,
                                    S1Interval, latlng_to_point)


def _pt(lat_deg, lng_deg):
    return latlng_to_point(math.radians(lat_deg), math.radians(lng_deg))


def _norm(v):
    v = np.asarray(v, dtype=np.float64)
    return tuple(v / np.linalg.norm(v))


DEG = math.degrees


# --- S2Cap ------------------------------------------------------------

def test_cap_basic_relations():
    # s2cap_test.cc:54-90
    empty, full = Cap.empty(), Cap.full()
    assert empty.is_empty() and empty.complement().is_full()
    assert full.is_full() and full.complement().is_empty()
    assert abs(DEG(full.get_radius_rad()) - 180.0) < 1e-12
    assert empty.contains_cap(empty)
    assert full.contains_cap(empty)
    assert full.contains_cap(full)
    assert not empty.interior_intersects_cap(empty)
    assert full.interior_intersects_cap(full)
    assert not full.interior_intersects_cap(empty)

    xaxis = Cap.from_point((1.0, 0.0, 0.0))
    yaxis = Cap.from_point((0.0, 1.0, 0.0))
    assert xaxis.contains_point((1.0, 0.0, 0.0))
    assert not xaxis.contains_point((1.0, 1e-20, 0.0))
    assert xaxis.get_radius_rad() == 0.0
    assert not yaxis.contains_point(xaxis.center)
    xcomp = xaxis.complement()
    assert xcomp.is_full() and xcomp.contains_point(xaxis.center)
    assert xcomp.complement().is_empty()

    # tiny cap containment along a tangent (s2cap_test.cc:116-122)
    k_tiny = 1e-10
    c = _norm((1.0, 2.0, 3.0))
    tiny = Cap.from_point_angle(c, k_tiny)
    tangent = _norm(np.cross(c, (3.0, 2.0, 1.0)))
    assert tiny.contains_point(tuple(np.array(c)
                                     + 0.99 * k_tiny * np.array(tangent)))
    assert not tiny.contains_point(tuple(np.array(c) + 1.01 * k_tiny
                                         * np.array(tangent)))

    # hemispherical cap (FromCenterHeight h=1 -> radius2 = 2h = 2)
    hemi = Cap(_norm((1.0, 0.0, 1.0)), 2.0)
    comp = hemi.complement()
    assert np.allclose(comp.center, tuple(-x for x in hemi.center))
    assert abs(comp.radius2 - 2.0) < 1e-15
    assert hemi.contains_point((1.0, 0.0, 0.0))
    assert not comp.contains_point((1.0, 0.0, 0.0))


def test_cap_add_cap():
    # s2cap_test.cc:171-183: adding empty leaves the area unchanged;
    # adding to empty copies the other cap
    non_empty = Cap.from_point_angle((1.0, 0.0, 0.0), math.radians(10))
    assert (non_empty.add_cap(Cap.empty()).get_area()
            == non_empty.get_area())
    assert (Cap.empty().add_cap(non_empty).get_area()
            == non_empty.get_area())


def test_cap_get_rect_bound():
    # s2cap_test.cc:185-233 (kDegreeEps = 1e-13)
    eps = 1e-13
    assert Cap.empty().get_rect_bound().is_empty()
    full_rect = Cap.full().get_rect_bound()
    assert full_rect.lat.lo == -math.pi / 2 \
        and full_rect.lat.hi == math.pi / 2 \
        and full_rect.lng.is_full()

    # cap including the south pole
    r = Cap.from_point_angle(_pt(-45, 57),
                             math.radians(50)).get_rect_bound()
    assert abs(DEG(r.lat.lo) - -90) < eps
    assert abs(DEG(r.lat.hi) - 5) < eps
    assert r.lng.is_full()

    # cap tangent to the north pole
    r = Cap.from_point_angle(_norm((1.0, 0.0, 1.0)),
                             math.pi / 4 + 1e-16).get_rect_bound()
    assert abs(r.lat.lo) < 1e-14 and abs(r.lat.hi - math.pi / 2) < 1e-14
    assert r.lng.is_full()
    r = Cap.from_point_angle(_norm((1.0, 0.0, 1.0)),
                             math.radians(45 + 5e-15)).get_rect_bound()
    assert abs(DEG(r.lat.lo)) < eps and abs(DEG(r.lat.hi) - 90) < eps
    assert r.lng.is_full()

    # the eastern hemisphere
    r = Cap.from_point_angle((0.0, 1.0, 0.0),
                             math.pi / 2 + 2e-16).get_rect_bound()
    assert abs(DEG(r.lat.lo) + 90) < eps and abs(DEG(r.lat.hi) - 90) < eps
    assert r.lng.is_full()

    # a cap centered on the equator
    r = Cap.from_point_angle(_pt(0, 50), math.radians(20)).get_rect_bound()
    assert abs(DEG(r.lat.lo) + 20) < eps and abs(DEG(r.lat.hi) - 20) < eps
    assert abs(DEG(r.lng.lo) - 30) < eps and abs(DEG(r.lng.hi) - 70) < eps

    # a cap centered on the north pole
    r = Cap.from_point_angle(_pt(90, 123), math.radians(10)).get_rect_bound()
    assert abs(DEG(r.lat.lo) - 80) < eps and abs(DEG(r.lat.hi) - 90) < eps
    assert r.lng.is_full()


def test_cap_expanded():
    # s2cap_test.cc:313-322
    assert Cap.empty().expanded(2.0).is_empty()
    assert Cap.full().expanded(2.0).is_full()
    cap50 = Cap.from_point_angle((1.0, 0.0, 0.0), math.radians(50))
    cap51 = Cap.from_point_angle((1.0, 0.0, 0.0), math.radians(51))
    assert cap50.expanded(0.0).approx_equals(cap50)
    assert cap50.expanded(math.radians(1)).approx_equals(cap51)
    assert not cap50.expanded(math.radians(129.99)).is_full()
    assert cap50.expanded(math.radians(130.01)).is_full()


def test_cap_union():
    # s2cap_test.cc:342-390
    a = Cap.from_point_angle(_pt(50.0, 10.0), math.radians(0.2))
    b = Cap.from_point_angle(_pt(50.0, 10.0), math.radians(0.3))
    assert b.contains_cap(a)
    assert a.union(b).approx_equals(b)

    assert a.union(Cap.full()).is_full()
    assert a.union(Cap.empty()).approx_equals(a)

    c = Cap.from_point_angle(_pt(51.0, 11.0), math.radians(1.5))
    assert c.contains_cap(a)
    assert np.allclose(a.union(c).center, c.center)
    assert abs(a.union(c).get_radius_rad() - c.get_radius_rad()) < 1e-15

    d = Cap.from_point_angle(_pt(51.0, 11.0), math.radians(0.1))
    assert not d.contains_cap(a)
    assert not d.intersects_cap(a)
    assert a.union(d).approx_equals(d.union(a), 1e-12)
    u = a.union(d)
    assert abs(DEG(math.asin(u.center[2])) - 50.4588) < 0.001
    assert abs(DEG(math.atan2(u.center[1], u.center[0])) - 10.4525) < 0.001
    assert abs(DEG(u.get_radius_rad()) - 0.7425) < 0.001

    e = Cap.from_point_angle(_pt(50.3, 10.3), math.radians(0.2))
    assert not e.contains_cap(a)
    assert e.intersects_cap(a)
    assert a.union(e).approx_equals(e.union(a), 1e-12)
    u = a.union(e)
    assert abs(DEG(math.asin(u.center[2])) - 50.1500) < 0.001
    assert abs(DEG(math.atan2(u.center[1], u.center[0])) - 10.1495) < 0.001
    assert abs(DEG(u.get_radius_rad()) - 0.3781) < 0.001

    # radius sum > 180 degrees, centers not antipodal -> full
    f = Cap.from_point_angle((0.0, 0.0, 1.0), math.radians(150))
    g = Cap.from_point_angle((0.0, 1.0, 0.0), math.radians(150))
    assert f.union(g).is_full()

    # hemisphere union its complement -> full
    hemi = Cap((0.0, 0.0, 1.0), 2.0)
    assert hemi.union(hemi.complement()).is_full()


# --- S2LatLngRect -----------------------------------------------------

def _rect(lat_lo, lng_lo, lat_hi, lng_hi):
    return LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def _rect_eq(a: LatLngRect, b: LatLngRect) -> bool:
    if a.is_empty() or b.is_empty():
        return a.is_empty() and b.is_empty()
    return a.approx_equals(b, 1e-14)


def _interval_ops(x, y, rel: str, want_union, want_inter):
    # TestIntervalOps, s2latlng_rect_test.cc:146-168
    assert x.contains_rect(y) == (rel[0] == "T")
    assert x.interior_contains_rect(y) == (rel[1] == "T")
    assert x.intersects_rect(y) == (rel[2] == "T")
    assert x.interior_intersects_rect(y) == (rel[3] == "T")
    assert x.contains_rect(y) == _rect_eq(x.union(y), x)
    assert x.intersects_rect(y) == (not x.intersection(y).is_empty())
    assert _rect_eq(x.union(y), want_union)
    assert _rect_eq(x.intersection(y), want_inter)


def test_rect_interval_ops():
    # s2latlng_rect_test.cc:226-274, rows verbatim
    r1 = _rect(0, -180, 90, 0)

    r1_mid = _rect(45, -90, 45, -90)
    _interval_ops(r1, r1_mid, "TTTT", r1, r1_mid)

    req_m180 = _rect(0, -180, 0, -180)
    _interval_ops(r1, req_m180, "TFTF", r1, req_m180)

    rnorth_pole = _rect(90, 0, 90, 0)
    _interval_ops(r1, rnorth_pole, "TFTF", r1, rnorth_pole)

    _interval_ops(r1, _rect(-10, -1, 1, 20), "FFTT",
                  _rect(-10, 180, 90, 20), _rect(0, -1, 1, 0))
    _interval_ops(r1, _rect(-10, -1, 0, 20), "FFTF",
                  _rect(-10, 180, 90, 20), _rect(0, -1, 0, 0))
    _interval_ops(r1, _rect(-10, 0, 1, 20), "FFTF",
                  _rect(-10, 180, 90, 20), _rect(0, 0, 1, 0))

    _interval_ops(_rect(-15, -160, -15, -150), _rect(20, 145, 25, 155),
                  "FFFF", _rect(-15, 145, 25, -150), LatLngRect.empty())
    _interval_ops(_rect(70, -10, 90, -140), _rect(60, 175, 80, 5),
                  "FFTT", _rect(60, -180, 90, 180), _rect(70, 175, 80, 5))

    # lat-overlap-only and lng-overlap-only intersections are empty
    _interval_ops(_rect(12, 30, 60, 60), _rect(0, 0, 30, 18),
                  "FFFF", _rect(0, 0, 60, 60), LatLngRect.empty())
    _interval_ops(_rect(0, 0, 18, 42), _rect(30, 12, 42, 60),
                  "FFFF", _rect(0, 0, 42, 60), LatLngRect.empty())


def test_rect_contains():
    # s2latlng_rect_test.cc:181-197 (r1 = [eq_m180, north_pole])
    r1 = _rect(0, -180, 90, 0)
    rad = math.radians
    assert r1.contains_latlng(rad(30), rad(-45))
    assert r1.interior_contains_latlng(rad(30), rad(-45))
    assert not r1.contains_latlng(rad(30), rad(45))
    assert not r1.interior_contains_latlng(rad(30), rad(45))
    assert r1.contains_latlng(0.0, -math.pi)
    assert not r1.interior_contains_latlng(0.0, -math.pi)
    assert r1.contains_latlng(math.pi / 2, 0.0)
    assert not r1.interior_contains_latlng(math.pi / 2, 0.0)
    assert r1.contains_point(_norm((0.5, -0.3, 0.1)))
    assert not r1.contains_point(_norm((0.5, 0.2, 0.1)))


def test_rect_add_point():
    # s2latlng_rect_test.cc:350-359
    p = LatLngRect.empty()
    p = p.add_point(_pt(0, 0))
    assert p.lat.lo == p.lat.hi and p.lng.lo == p.lng.hi
    p = p.add_point(latlng_to_point(0.0, -math.pi / 2))
    assert not (p.lat.lo == p.lat.hi and p.lng.lo == p.lng.hi)
    p = p.add_point(latlng_to_point(math.pi / 4, -math.pi))
    p = p.add_point((0.0, 0.0, 1.0))
    assert _rect_eq(p, _rect(0, -180, 90, 0))
