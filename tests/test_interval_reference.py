"""Reference batteries for R1Interval (r1interval_test.cc:48-200) and
S1Interval (s1interval_test.cc:30-478) — the interval algebra under
LatLngRect/Cap/R2Rect, including the wrapping S1 semantics."""
import math

import pytest

from s2spark.kernels.region import R1Interval, S1Interval

PI = math.pi
PI_2 = math.pi / 2
DBL_EPS = 2.220446049250313e-16


# ---------------------------------------------------------------------------
# R1Interval
# ---------------------------------------------------------------------------

def _r1_ops(x, y, expected):
    assert x.contains_interval(y) == (expected[0] == "T")
    assert x.interior_contains_interval(y) == (expected[1] == "T")
    assert x.intersects(y) == (expected[2] == "T")
    assert x.interior_intersects(y) == (expected[3] == "T")


def test_r1_basic():
    unit = R1Interval(0, 1)
    negunit = R1Interval(-1, 0)
    assert unit.lo == 0 and unit.hi == 1

    half = R1Interval(0.5, 0.5)
    assert not unit.is_empty()
    assert not half.is_empty()
    empty = R1Interval.empty()
    assert empty.is_empty()

    assert empty == empty
    assert unit == unit
    assert unit != empty
    assert R1Interval(1, 2) != R1Interval(1, 3)

    assert unit.get_center() == 0.5
    assert half.get_center() == 0.5
    assert negunit.get_length() == 1.0
    assert half.get_length() == 0
    assert empty.get_length() < 0

    assert unit.contains(0.5) and unit.interior_contains(0.5)
    assert unit.contains(0) and not unit.interior_contains(0)
    assert unit.contains(1) and not unit.interior_contains(1)

    _r1_ops(empty, empty, "TTFF")
    _r1_ops(empty, unit, "FFFF")
    _r1_ops(unit, half, "TTTT")
    _r1_ops(unit, unit, "TFTT")
    _r1_ops(unit, empty, "TTFF")
    _r1_ops(unit, negunit, "FFTF")
    _r1_ops(unit, R1Interval(0, 0.5), "TFTT")
    _r1_ops(half, R1Interval(0, 0.5), "FFTF")

    r = empty.add_point(5)
    assert r.lo == 5 and r.hi == 5
    r = r.add_point(-1)
    assert r.lo == -1 and r.hi == 5
    r = r.add_point(0)
    assert r.lo == -1 and r.hi == 5

    assert R1Interval(0.1, 0.4).project(0.3) == 0.3
    assert R1Interval(0.1, 0.4).project(-7.0) == 0.1
    assert R1Interval(0.1, 0.4).project(0.6) == 0.4

    assert R1Interval.from_point_pair(4, 4) == R1Interval(4, 4)
    assert R1Interval.from_point_pair(-1, -2) == R1Interval(-2, -1)
    assert R1Interval.from_point_pair(-5, 3) == R1Interval(-5, 3)

    assert empty.expanded(0.45).is_empty()
    assert unit.expanded(0.5) == R1Interval(-0.5, 1.5)
    assert unit.expanded(-0.5) == R1Interval(0.5, 0.5)
    assert unit.expanded(-0.51).is_empty()

    assert R1Interval(99, 100).union(empty) == R1Interval(99, 100)
    assert empty.union(R1Interval(99, 100)) == R1Interval(99, 100)
    assert R1Interval(5, 3).union(R1Interval(0, -2)).is_empty()
    assert R1Interval(0, -2).union(R1Interval(5, 3)).is_empty()
    assert unit.union(unit) == unit
    assert unit.union(negunit) == R1Interval(-1, 1)
    assert negunit.union(unit) == R1Interval(-1, 1)
    assert half.union(unit) == unit
    assert unit.intersection(half) == half
    assert unit.intersection(negunit) == R1Interval(0, 0)
    assert negunit.intersection(half).is_empty()
    assert unit.intersection(empty).is_empty()
    assert empty.intersection(unit).is_empty()


def test_r1_approx_equals():
    k_lo = 4 * DBL_EPS  # < default max_error
    k_hi = 6 * DBL_EPS  # > default max_error
    empty = R1Interval.empty()
    assert empty.approx_equals(empty)
    assert R1Interval(0, 0).approx_equals(empty)
    assert empty.approx_equals(R1Interval(0, 0))
    assert R1Interval(1, 1).approx_equals(empty)
    assert empty.approx_equals(R1Interval(1, 1))
    assert not empty.approx_equals(R1Interval(0, 1))
    assert empty.approx_equals(R1Interval(1, 1 + 2 * k_lo))
    assert not empty.approx_equals(R1Interval(1, 1 + 2 * k_hi))

    assert R1Interval(1, 1).approx_equals(R1Interval(1, 1))
    assert R1Interval(1, 1).approx_equals(R1Interval(1 - k_lo, 1 - k_lo))
    assert R1Interval(1, 1).approx_equals(R1Interval(1 + k_lo, 1 + k_lo))
    assert not R1Interval(1, 1).approx_equals(R1Interval(1 - k_hi, 1))
    assert not R1Interval(1, 1).approx_equals(R1Interval(1, 1 + k_hi))
    assert R1Interval(1, 1).approx_equals(R1Interval(1 - k_lo, 1 + k_lo))
    assert not R1Interval(0, 0).approx_equals(R1Interval(1, 1))

    assert R1Interval(1 - k_lo, 2 + k_lo).approx_equals(R1Interval(1, 2))
    assert R1Interval(1 + k_lo, 2 - k_lo).approx_equals(R1Interval(1, 2))
    assert not R1Interval(1 - k_hi, 2 + k_lo).approx_equals(R1Interval(1, 2))
    assert not R1Interval(1 + k_hi, 2 - k_lo).approx_equals(R1Interval(1, 2))
    assert not R1Interval(1 - k_lo, 2 + k_hi).approx_equals(R1Interval(1, 2))
    assert not R1Interval(1 + k_lo, 2 - k_hi).approx_equals(R1Interval(1, 2))


# ---------------------------------------------------------------------------
# S1Interval — fixture intervals from s1interval_test.cc:30-78
# ---------------------------------------------------------------------------

def _si(lo, hi):
    return S1Interval.from_bounds(lo, hi)


empty = S1Interval.empty()
full = S1Interval.full()
zero = _si(0, 0)
pi2 = _si(PI_2, PI_2)
pi = _si(PI, PI)
mipi = _si(-PI, -PI)       # normalizes to (pi, pi)
mipi2 = _si(-PI_2, -PI_2)
quad1 = _si(0, PI_2)
quad2 = _si(PI_2, -PI)
quad3 = _si(PI, -PI_2)
quad4 = _si(-PI_2, 0)
quad12 = _si(0, -PI)
quad23 = _si(PI_2, -PI_2)
quad34 = _si(-PI, 0)
quad41 = _si(-PI_2, PI_2)
quad123 = _si(0, -PI_2)
quad234 = _si(PI_2, 0)
quad341 = _si(PI, PI_2)
quad412 = _si(-PI_2, -PI)
mid12 = _si(PI_2 - 0.01, PI_2 + 0.02)
mid23 = _si(PI - 0.01, -PI + 0.02)
mid34 = _si(-PI_2 - 0.01, -PI_2 + 0.02)
mid41 = _si(-0.01, 0.02)


def test_s1_constructors_and_accessors():
    assert quad12.lo == 0 and quad12.hi == PI
    assert quad34.lo == PI and quad34.hi == 0
    assert pi.lo == PI and pi.hi == PI
    # [-pi, -pi] normalizes to [pi, pi]
    assert mipi.lo == PI and mipi.hi == PI
    assert quad23.lo == PI_2 and quad23.hi == -PI_2


def test_s1_simple_predicates():
    assert zero.is_valid() and not zero.is_empty() and not zero.is_full()
    assert empty.is_valid() and empty.is_empty() and not empty.is_full()
    assert empty.is_inverted()
    assert full.is_valid() and not full.is_empty() and full.is_full()
    assert not quad12.is_empty() and not quad12.is_full() \
        and not quad12.is_inverted()
    assert not quad23.is_empty() and not quad23.is_full() \
        and quad23.is_inverted()
    assert pi.is_valid() and not pi.is_empty() and not pi.is_inverted()
    assert mipi.is_valid() and not mipi.is_empty() \
        and not mipi.is_inverted()


def test_s1_almost_empty_or_full():
    almost_pi = PI - 2 * DBL_EPS
    assert not S1Interval(-almost_pi, PI).is_full()
    assert not S1Interval(-PI, almost_pi).is_full()
    assert not S1Interval(PI, -almost_pi).is_empty()
    assert not S1Interval(almost_pi, -PI).is_empty()


def test_s1_get_center():
    assert quad12.get_center() == PI_2
    assert _si(3.1, 2.9).get_center() == pytest.approx(3.0 - PI)
    assert _si(-2.9, -3.1).get_center() == pytest.approx(PI - 3.0)
    assert _si(2.1, -2.1).get_center() == pytest.approx(PI)
    assert pi.get_center() == PI
    assert mipi.get_center() == PI
    assert abs(quad23.get_center()) == PI
    assert quad123.get_center() == pytest.approx(0.75 * PI)


def test_s1_get_length():
    assert quad12.get_length() == PI
    assert pi.get_length() == 0
    assert mipi.get_length() == 0
    assert quad123.get_length() == pytest.approx(1.5 * PI)
    assert abs(quad23.get_length()) == PI
    assert full.get_length() == 2 * PI
    assert empty.get_length() < 0


def test_s1_complement():
    assert empty.complement().is_full()
    assert full.complement().is_empty()
    assert pi.complement().is_full()
    assert mipi.complement().is_full()
    assert zero.complement().is_full()
    assert quad12.complement().approx_equals(quad34)
    assert quad34.complement().approx_equals(quad12)
    assert quad123.complement().approx_equals(quad4)


def test_s1_contains():
    assert not empty.contains(0) and not empty.contains(PI) \
        and not empty.contains(-PI)
    assert not empty.interior_contains(PI) \
        and not empty.interior_contains(-PI)
    assert full.contains(0) and full.contains(PI) and full.contains(-PI)
    assert full.interior_contains(PI) and full.interior_contains(-PI)
    assert quad12.contains(0) and quad12.contains(PI) \
        and quad12.contains(-PI)
    assert quad12.interior_contains(PI_2) \
        and not quad12.interior_contains(0)
    assert not quad12.interior_contains(PI) \
        and not quad12.interior_contains(-PI)
    assert quad23.contains(PI_2) and quad23.contains(-PI_2)
    assert quad23.contains(PI) and quad23.contains(-PI)
    assert not quad23.contains(0)
    assert not quad23.interior_contains(PI_2) \
        and not quad23.interior_contains(-PI_2)
    assert quad23.interior_contains(PI) \
        and quad23.interior_contains(-PI)
    assert not quad23.interior_contains(0)
    assert pi.contains(PI) and pi.contains(-PI) and not pi.contains(0)
    assert not pi.interior_contains(PI) and not pi.interior_contains(-PI)
    assert mipi.contains(PI) and mipi.contains(-PI) \
        and not mipi.contains(0)
    assert not mipi.interior_contains(PI) \
        and not mipi.interior_contains(-PI)
    assert zero.contains(0) and not zero.interior_contains(0)


def _s1_ops(x, y, expected, expected_union, expected_intersection):
    """TestIntervalOps (s1interval_test.cc:185-213)."""
    assert x.contains_interval(y) == (expected[0] == "T")
    assert x.interior_contains_interval(y) == (expected[1] == "T")
    assert x.intersects(y) == (expected[2] == "T")
    assert x.interior_intersects(y) == (expected[3] == "T")

    u = x.union(y)
    n = x.intersection(y)
    assert (u.lo, u.hi) == (expected_union.lo, expected_union.hi)
    assert (n.lo, n.hi) == (expected_intersection.lo,
                            expected_intersection.hi)
    assert x.contains_interval(y) == (u == x)
    assert x.intersects(y) == (not n.is_empty())
    if y.lo == y.hi:
        r = x.add_point(y.lo)
        assert (r.lo, r.hi) == (expected_union.lo, expected_union.hi)


def test_s1_interval_ops():
    _s1_ops(empty, empty, "TTFF", empty, empty)
    _s1_ops(empty, full, "FFFF", full, empty)
    _s1_ops(empty, zero, "FFFF", zero, empty)
    _s1_ops(empty, pi, "FFFF", pi, empty)
    _s1_ops(empty, mipi, "FFFF", mipi, empty)

    _s1_ops(full, empty, "TTFF", full, empty)
    _s1_ops(full, full, "TTTT", full, full)
    _s1_ops(full, zero, "TTTT", full, zero)
    _s1_ops(full, pi, "TTTT", full, pi)
    _s1_ops(full, mipi, "TTTT", full, mipi)
    _s1_ops(full, quad12, "TTTT", full, quad12)
    _s1_ops(full, quad23, "TTTT", full, quad23)

    _s1_ops(zero, empty, "TTFF", zero, empty)
    _s1_ops(zero, full, "FFTF", full, zero)
    _s1_ops(zero, zero, "TFTF", zero, zero)
    _s1_ops(zero, pi, "FFFF", _si(0, PI), empty)
    _s1_ops(zero, pi2, "FFFF", quad1, empty)
    _s1_ops(zero, mipi, "FFFF", quad12, empty)
    _s1_ops(zero, mipi2, "FFFF", quad4, empty)
    _s1_ops(zero, quad12, "FFTF", quad12, zero)
    _s1_ops(zero, quad23, "FFFF", quad123, empty)

    _s1_ops(pi2, empty, "TTFF", pi2, empty)
    _s1_ops(pi2, full, "FFTF", full, pi2)
    _s1_ops(pi2, zero, "FFFF", quad1, empty)
    _s1_ops(pi2, pi, "FFFF", _si(PI_2, PI), empty)
    _s1_ops(pi2, pi2, "TFTF", pi2, pi2)
    _s1_ops(pi2, mipi, "FFFF", quad2, empty)
    _s1_ops(pi2, mipi2, "FFFF", quad23, empty)
    _s1_ops(pi2, quad12, "FFTF", quad12, pi2)
    _s1_ops(pi2, quad23, "FFTF", quad23, pi2)

    _s1_ops(pi, empty, "TTFF", pi, empty)
    _s1_ops(pi, full, "FFTF", full, pi)
    _s1_ops(pi, zero, "FFFF", _si(PI, 0), empty)
    _s1_ops(pi, pi, "TFTF", pi, pi)
    _s1_ops(pi, pi2, "FFFF", _si(PI_2, PI), empty)
    _s1_ops(pi, mipi, "TFTF", pi, pi)
    _s1_ops(pi, mipi2, "FFFF", quad3, empty)
    _s1_ops(pi, quad12, "FFTF", _si(0, PI), pi)
    _s1_ops(pi, quad23, "FFTF", quad23, pi)

    _s1_ops(mipi, empty, "TTFF", mipi, empty)
    _s1_ops(mipi, full, "FFTF", full, mipi)
    _s1_ops(mipi, zero, "FFFF", quad34, empty)
    _s1_ops(mipi, pi, "TFTF", mipi, mipi)
    _s1_ops(mipi, pi2, "FFFF", quad2, empty)
    _s1_ops(mipi, mipi, "TFTF", mipi, mipi)
    _s1_ops(mipi, mipi2, "FFFF", _si(-PI, -PI_2), empty)
    _s1_ops(mipi, quad12, "FFTF", quad12, mipi)
    _s1_ops(mipi, quad23, "FFTF", quad23, mipi)

    _s1_ops(quad12, empty, "TTFF", quad12, empty)
    _s1_ops(quad12, full, "FFTT", full, quad12)
    _s1_ops(quad12, zero, "TFTF", quad12, zero)
    _s1_ops(quad12, pi, "TFTF", quad12, pi)
    _s1_ops(quad12, mipi, "TFTF", quad12, mipi)
    _s1_ops(quad12, quad12, "TFTT", quad12, quad12)
    _s1_ops(quad12, quad23, "FFTT", quad123, quad2)
    _s1_ops(quad12, quad34, "FFTF", full, quad12)

    _s1_ops(quad23, empty, "TTFF", quad23, empty)
    _s1_ops(quad23, full, "FFTT", full, quad23)
    _s1_ops(quad23, zero, "FFFF", quad234, empty)
    _s1_ops(quad23, pi, "TTTT", quad23, pi)
    _s1_ops(quad23, mipi, "TTTT", quad23, mipi)
    _s1_ops(quad23, quad12, "FFTT", quad123, quad2)
    _s1_ops(quad23, quad23, "TFTT", quad23, quad23)
    _s1_ops(quad23, quad34, "FFTT", quad234, _si(-PI, -PI_2))

    _s1_ops(quad1, quad23, "FFTF", quad123, _si(PI_2, PI_2))
    _s1_ops(quad2, quad3, "FFTF", quad23, mipi)
    _s1_ops(quad3, quad2, "FFTF", quad23, pi)
    _s1_ops(quad2, pi, "TFTF", quad2, pi)
    _s1_ops(quad2, mipi, "TFTF", quad2, mipi)
    _s1_ops(quad3, pi, "TFTF", quad3, pi)
    _s1_ops(quad3, mipi, "TFTF", quad3, mipi)

    _s1_ops(quad12, mid12, "TTTT", quad12, mid12)
    _s1_ops(mid12, quad12, "FFTT", quad12, mid12)

    quad12eps = _si(quad12.lo, mid23.hi)
    quad2hi = _si(mid23.lo, quad12.hi)
    _s1_ops(quad12, mid23, "FFTT", quad12eps, quad2hi)
    _s1_ops(mid23, quad12, "FFTT", quad12eps, quad2hi)

    # union of disjoint intervals = smallest containing interval
    quad412eps = _si(mid34.lo, quad12.hi)
    _s1_ops(quad12, mid34, "FFFF", quad412eps, empty)
    _s1_ops(mid34, quad12, "FFFF", quad412eps, empty)

    quadeps12 = _si(mid41.lo, quad12.hi)
    quad1lo = _si(quad12.lo, mid41.hi)
    _s1_ops(quad12, mid41, "FFTT", quadeps12, quad1lo)
    _s1_ops(mid41, quad12, "FFTT", quadeps12, quad1lo)

    quad2lo = _si(quad23.lo, mid12.hi)
    quad3hi = _si(mid34.lo, quad23.hi)
    quadeps23 = _si(mid12.lo, quad23.hi)
    quad23eps = _si(quad23.lo, mid34.hi)
    quadeps123 = _si(mid41.lo, quad23.hi)
    _s1_ops(quad23, mid12, "FFTT", quadeps23, quad2lo)
    _s1_ops(mid12, quad23, "FFTT", quadeps23, quad2lo)
    _s1_ops(quad23, mid23, "TTTT", quad23, mid23)
    _s1_ops(mid23, quad23, "FFTT", quad23, mid23)
    _s1_ops(quad23, mid34, "FFTT", quad23eps, quad3hi)
    _s1_ops(mid34, quad23, "FFTT", quad23eps, quad3hi)
    _s1_ops(quad23, mid41, "FFFF", quadeps123, empty)
    _s1_ops(mid41, quad23, "FFFF", quadeps123, empty)


def test_s1_add_point():
    assert empty.add_point(0) == zero
    assert empty.add_point(PI) == pi
    assert empty.add_point(-PI) == mipi
    assert empty.add_point(PI).add_point(-PI) == pi
    assert empty.add_point(-PI).add_point(PI) == mipi
    assert empty.add_point(mid12.lo).add_point(mid12.hi) == mid12
    assert empty.add_point(mid23.lo).add_point(mid23.hi) == mid23
    assert quad1.add_point(-0.9 * PI).add_point(-PI_2) == quad123
    assert full.add_point(0).is_full()
    assert full.add_point(PI).is_full()
    assert full.add_point(-PI).is_full()


def test_s1_project():
    r = S1Interval.from_bounds(-PI, -PI)
    assert r.project(-PI) == PI
    assert r.project(0) == PI
    r = _si(0, PI)
    assert r.project(0.1) == 0.1
    assert r.project(-PI_2 + 1e-15) == 0
    assert r.project(-PI_2 - 1e-15) == PI
    r = _si(PI - 0.1, -PI + 0.1)
    assert r.project(PI) == PI
    assert r.project(1e-15) == PI - 0.1
    assert r.project(-1e-15) == -PI + 0.1
    assert full.project(0) == 0
    assert full.project(PI) == PI
    assert full.project(-PI) == PI


def test_s1_from_point_pair():
    assert S1Interval.from_point_pair(-PI, PI) == pi
    assert S1Interval.from_point_pair(PI, -PI) == pi
    assert S1Interval.from_point_pair(mid34.hi, mid34.lo) == mid34
    assert S1Interval.from_point_pair(mid23.lo, mid23.hi) == mid23


def test_s1_expanded():
    assert empty.expanded(1) == empty
    assert full.expanded(1) == full
    assert zero.expanded(1) == _si(-1, 1)
    assert mipi.expanded(0.01) == _si(PI - 0.01, -PI + 0.01)
    assert pi.expanded(27) == full
    assert pi.expanded(PI_2) == quad23
    assert pi2.expanded(PI_2) == quad12
    assert mipi2.expanded(PI_2) == quad34

    assert empty.expanded(-1) == empty
    assert full.expanded(-1) == full
    assert quad123.expanded(-27) == empty
    assert quad234.expanded(-27) == empty
    assert quad123.expanded(-PI_2) == quad2
    assert quad341.expanded(-PI_2) == quad4
    assert quad412.expanded(-PI_2) == quad1


def test_s1_approx_equals():
    k_lo = 4 * DBL_EPS
    k_hi = 6 * DBL_EPS

    assert empty.approx_equals(empty)
    assert zero.approx_equals(empty) and empty.approx_equals(zero)
    assert pi.approx_equals(empty) and empty.approx_equals(pi)
    assert mipi.approx_equals(empty) and empty.approx_equals(mipi)
    assert not empty.approx_equals(full)
    assert empty.approx_equals(S1Interval(1, 1 + 2 * k_lo))
    assert not empty.approx_equals(S1Interval(1, 1 + 2 * k_hi))
    assert S1Interval(PI - k_lo, -PI + k_lo).approx_equals(empty)

    assert full.approx_equals(full)
    assert not full.approx_equals(empty)
    assert not full.approx_equals(zero)
    assert not full.approx_equals(pi)
    assert full.approx_equals(S1Interval(k_lo, -k_lo))
    assert not full.approx_equals(S1Interval(2 * k_hi, 0))
    assert S1Interval(-PI + k_lo, PI - k_lo).approx_equals(full)
    assert not S1Interval(-PI, PI - 2 * k_hi).approx_equals(full)

    assert pi.approx_equals(pi) and mipi.approx_equals(pi)
    assert pi.approx_equals(S1Interval(PI - k_lo, PI - k_lo))
    assert not pi.approx_equals(S1Interval(PI - k_hi, PI - k_hi))
    assert pi.approx_equals(S1Interval(PI - k_lo, -PI + k_lo))
    assert not pi.approx_equals(S1Interval(PI - k_hi, -PI))
    assert not zero.approx_equals(pi)
    assert pi.union(mid12).union(zero).approx_equals(quad12)
    assert quad2.intersection(quad3).approx_equals(pi)
    assert quad3.intersection(quad2).approx_equals(pi)

    # nearly-equal endpoints in opposite order (inverted) do NOT match
    assert not S1Interval(0, k_lo).approx_equals(S1Interval(k_lo, 0))
    assert not S1Interval(PI - 0.5 * k_lo, -PI + 0.5 * k_lo).approx_equals(
        S1Interval(-PI + 0.5 * k_lo, PI - 0.5 * k_lo))

    assert S1Interval(1 - k_lo, 2 + k_lo).approx_equals(S1Interval(1, 2))
    assert S1Interval(1 + k_lo, 2 - k_lo).approx_equals(S1Interval(1, 2))
    assert S1Interval(2 - k_lo, 1 + k_lo).approx_equals(S1Interval(2, 1))
    assert S1Interval(2 + k_lo, 1 - k_lo).approx_equals(S1Interval(2, 1))
    assert not S1Interval(1 - k_hi, 2 + k_lo).approx_equals(S1Interval(1, 2))
    assert not S1Interval(1 + k_hi, 2 - k_lo).approx_equals(S1Interval(1, 2))
    assert not S1Interval(2 - k_hi, 1 + k_lo).approx_equals(S1Interval(2, 1))
    assert not S1Interval(2 + k_hi, 1 - k_lo).approx_equals(S1Interval(2, 1))
    assert not S1Interval(1 - k_lo, 2 + k_hi).approx_equals(S1Interval(1, 2))
    assert not S1Interval(1 + k_lo, 2 - k_hi).approx_equals(S1Interval(1, 2))
    assert not S1Interval(2 - k_lo, 1 + k_hi).approx_equals(S1Interval(2, 1))
    assert not S1Interval(2 + k_lo, 1 - k_hi).approx_equals(S1Interval(2, 1))


def test_s1_operator_equals():
    assert empty == empty
    assert full == full
    assert full != empty


def test_s1_directed_hausdorff():
    assert empty.directed_hausdorff(empty) == pytest.approx(0.0)
    assert empty.directed_hausdorff(mid12) == pytest.approx(0.0)
    assert mid12.directed_hausdorff(empty) == pytest.approx(PI)

    assert quad12.directed_hausdorff(quad123) == 0.0
    inv = _si(3.0, -3.0)  # complement center is 0
    assert _si(-0.1, 0.2).directed_hausdorff(inv) == pytest.approx(3.0)
    assert _si(0.1, 0.2).directed_hausdorff(inv) == pytest.approx(3.0 - 0.1)
    assert _si(-0.2, -0.1).directed_hausdorff(inv) == pytest.approx(3.0 - 0.1)
