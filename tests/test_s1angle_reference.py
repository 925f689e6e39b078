"""The reference's S1Angle battery (s1angle_test.cc:35-230): exact
degree/radian identities, E5/E6/E7 representations (signed and
unsigned), normalization, algebra, trig dispatch, wire format."""

import math

import numpy as np
import pytest

from s2spark.kernels.s1angle import S1Angle

A = S1Angle  # shorthand


def test_default_zero_infinity():
    assert A().rad() == 0
    assert A.radians(1e30) < A.infinity()
    assert -A.infinity() < A.zero()
    assert A.infinity() == A.infinity()
    assert A.radians(0) == A.zero()


def test_pi_radians_exactly_180_degrees():
    assert A.radians(math.pi).rad() == math.pi
    assert A.radians(math.pi).deg() == 180.0
    assert A.degrees(180).rad() == math.pi
    assert A.degrees(180).deg() == 180.0
    assert A.radians(math.pi / 2).deg() == 90.0
    assert A.radians(-math.pi / 2).deg() == -90.0
    assert A.degrees(-45).rad() == -math.pi / 4


def test_e5_e6_e7_representations():
    assert A.degrees(-45).rad() == pytest.approx(
        A.e5(-4500000).rad(), abs=0, rel=1e-15)
    assert A.degrees(-60).rad() == pytest.approx(
        A.e6(-60000000).rad(), abs=0, rel=1e-15)
    assert A.degrees(75).rad() == pytest.approx(
        A.e7(750000000).rad(), abs=0, rel=1e-15)
    assert A.degrees(-172.56123).get_e5() == -17256123
    assert A.degrees(12.345678).get_e6() == 12345678
    assert A.degrees(-12.3456789).get_e7() == -123456789


def test_e6_e7_representations_unsigned():
    assert A.unsigned_e6(60000000).rad() == pytest.approx(
        A.degrees(60).rad(), abs=0, rel=1e-15)
    assert A.unsigned_e6((-60000000) & 0xFFFFFFFF).rad() == \
        pytest.approx(A.degrees(-60).rad(), abs=0, rel=1e-15)
    assert A.unsigned_e7(750000000).rad() == pytest.approx(
        A.degrees(75).rad(), abs=0, rel=1e-15)
    assert A.unsigned_e7((-750000000) & 0xFFFFFFFF).rad() == \
        pytest.approx(A.degrees(-75).rad(), abs=0, rel=1e-15)


def test_normalize_canonicalizes():
    assert A.degrees(360.0).normalized().deg() == pytest.approx(0.0)
    assert A.degrees(-90.0).normalized().deg() == pytest.approx(-90.0)
    assert A.degrees(-180.0).normalized().deg() == pytest.approx(180.0)
    assert A.degrees(180.0).normalized().deg() == pytest.approx(180.0)
    assert A.degrees(540.0).normalized().deg() == pytest.approx(180.0)
    assert A.degrees(-270.0).normalized().deg() == pytest.approx(90.0)


def test_arithmetic():
    assert abs(A.radians(-0.3)).rad() == pytest.approx(0.3)
    assert (-A.radians(0.1)).rad() == pytest.approx(-0.1)
    assert (A.radians(0.1) + A.radians(0.3)).rad() == pytest.approx(0.4)
    assert (A.radians(0.1) - A.radians(0.3)).rad() == \
        pytest.approx(-0.2)
    assert (2 * A.radians(0.3)).rad() == pytest.approx(0.6)
    assert (A.radians(0.3) * 2).rad() == pytest.approx(0.6)
    assert (A.radians(0.3) / 2).rad() == pytest.approx(0.15)
    assert (A.radians(0.3) / A.radians(0.6)) == pytest.approx(0.5)
    tmp = A.radians(1.0)
    tmp = tmp + A.radians(0.5)
    assert tmp.rad() == pytest.approx(1.5)
    tmp = tmp - A.radians(1.0)
    assert tmp.rad() == pytest.approx(0.5)
    tmp = tmp * 5
    assert tmp.rad() == pytest.approx(2.5)
    tmp = tmp / 2
    assert tmp.rad() == pytest.approx(1.25)


def test_trigonometry():
    assert A.degrees(0).cos() == pytest.approx(1)
    assert A.degrees(90).sin() == pytest.approx(1)
    assert A.degrees(45).tan() == pytest.approx(1)


def test_constructors_that_measure_angles():
    assert A.between_points((1, 0, 0), (0, 0, 2)).rad() == \
        pytest.approx(math.pi / 2)
    assert A.between_points((1, 0, 0), (1, 0, 0)).rad() == 0.0
    d = A.between_latlngs(math.radians(20), math.radians(20),
                          math.radians(70), math.radians(20))
    assert abs(d.deg() - 50.0) < 1e-13


def test_formatting():
    assert str(A.degrees(180.0)) == "180.0000000"


def test_wire_roundtrip():
    a = A.radians(4.4)
    assert A.decode(a.encode()) == a
    with pytest.raises(ValueError):
        A.decode(A.radians(1.1).encode()[:-2])


def test_degrees_vs_e6_e7_exact():
    for i in range(0, 181):
        assert A.degrees(i) == A.e6(1000000 * i)
        assert A.degrees(i) == A.e7(10000000 * i)
    rng = np.random.default_rng(3)
    for i in rng.integers(0, 180000000, size=1000):
        assert A.e6(int(i)) == A.e7(10 * int(i))


def test_degrees_vs_radians_exact():
    for k in range(-8, 9):
        assert A.degrees(45 * k) == A.radians(k * math.pi / 4)
        assert A.degrees(45 * k).deg() == 45 * k
    for k in range(0, 31):
        n = 1 << k
        assert A.degrees(180.0 / n) == A.radians(math.pi / n)
        assert A.degrees(60.0 / n) == A.radians(math.pi / (3.0 * n))
        assert A.degrees(36.0 / n) == A.radians(math.pi / (5.0 * n))
        assert A.degrees(20.0 / n) == A.radians(math.pi / (9.0 * n))
        assert A.degrees(4.0 / n) == A.radians(math.pi / (45.0 * n))
    assert A.degrees(3) != A.radians(math.pi / 60)
    assert A.degrees(60).deg() != 60
