"""Reference battery for the S1ChordAngle algebra
(s1chord_angle_test.cc:35-275) over the engine's raw-chord^2
convention in kernels/region.py."""
import math

import numpy as np
import pytest

from s2spark.kernels import predicates
from s2spark.kernels.region import (CHORD2_INFINITY, CHORD2_NEGATIVE,
                                    CHORD2_STRAIGHT, angle_to_chord2, chord2,
                                    chord2_add,
                                    chord2_angle_constructor_max_error,
                                    chord2_cos, chord2_fast_upper_bound,
                                    chord2_from_length2, chord2_is_special,
                                    chord2_plus_error,
                                    chord2_point_constructor_max_error,
                                    chord2_predecessor, chord2_sin,
                                    chord2_sin2, chord2_successor, chord2_sub,
                                    chord2_tan, chord2_to_angle)

PI = math.pi
DBL_EPS = 2.220446049250313e-16


def _deg(c2: float) -> float:
    return math.degrees(chord2_to_angle(c2))


def _from_deg(d: float) -> float:
    return angle_to_chord2(math.radians(d))


def test_constants_and_predicates():
    right = chord2_from_length2(2)
    assert right == 2
    assert chord2_fast_upper_bound(1.0) == 1.0
    assert chord2_to_angle(chord2_fast_upper_bound(1.0)) >= 1.0

    assert not chord2_is_special(0.0)
    assert not chord2_is_special(CHORD2_STRAIGHT)
    assert chord2_is_special(CHORD2_NEGATIVE)
    assert chord2_is_special(CHORD2_INFINITY)
    assert CHORD2_NEGATIVE < 0.0
    assert CHORD2_STRAIGHT < CHORD2_INFINITY


def test_two_point_constructor():
    """chord2(x, y) agrees with the analytic angles on a random
    orthonormal frame (s1chord_angle_test.cc:72-85)."""
    from s2spark.kernels.pointutil import get_frame

    rng = np.random.default_rng(42)
    for _ in range(50):
        z = rng.normal(size=3)
        z /= np.linalg.norm(z)
        f = get_frame(z)[0]  # (3, 3) columns = (x, y, z)
        x, y, z = (tuple(f[:, k]) for k in range(3))
        assert chord2_to_angle(chord2(z, z)) == 0.0
        assert chord2_to_angle(
            chord2(tuple(-c for c in z), z)) == pytest.approx(PI, abs=1e-7)
        assert chord2_to_angle(chord2(x, z)) == pytest.approx(PI / 2)
        w = np.asarray(y) + np.asarray(z)
        w = tuple(w / np.linalg.norm(w))
        assert chord2_to_angle(chord2(w, z)) == pytest.approx(PI / 4)


def test_from_length2():
    assert _deg(chord2_from_length2(0)) == 0
    assert _deg(chord2_from_length2(1)) == pytest.approx(60)
    assert _deg(chord2_from_length2(2)) == pytest.approx(90)
    assert _deg(chord2_from_length2(4)) == 180
    assert _deg(chord2_from_length2(5)) == 180


def test_to_from_angle():
    assert chord2_to_angle(angle_to_chord2(0.0)) == 0
    assert angle_to_chord2(PI) == 4
    assert chord2_to_angle(angle_to_chord2(PI)) == PI
    assert angle_to_chord2(math.inf) == math.inf
    assert angle_to_chord2(-1.0) < 0
    assert chord2_to_angle(angle_to_chord2(1.0)) == pytest.approx(1.0)


def test_successor():
    assert chord2_successor(CHORD2_NEGATIVE) == 0.0
    assert chord2_successor(CHORD2_STRAIGHT) == CHORD2_INFINITY
    assert chord2_successor(CHORD2_INFINITY) == CHORD2_INFINITY
    x = CHORD2_NEGATIVE
    for _ in range(10):
        assert x < chord2_successor(x)
        x = chord2_successor(x)


def test_predecessor():
    assert chord2_predecessor(CHORD2_INFINITY) == CHORD2_STRAIGHT
    assert chord2_predecessor(0.0) == CHORD2_NEGATIVE
    assert chord2_predecessor(CHORD2_NEGATIVE) == CHORD2_NEGATIVE
    x = CHORD2_INFINITY
    for _ in range(10):
        assert x > chord2_predecessor(x)
        x = chord2_predecessor(x)


def test_arithmetic():
    zero = 0.0
    d30 = _from_deg(30)
    d60 = _from_deg(60)
    d90 = _from_deg(90)
    d120 = _from_deg(120)
    d180 = CHORD2_STRAIGHT
    assert _deg(chord2_add(zero, zero)) == 0
    assert _deg(chord2_sub(zero, zero)) == 0
    assert _deg(chord2_sub(d60, d60)) == 0
    assert _deg(chord2_sub(d180, d180)) == 0
    assert _deg(chord2_sub(zero, d60)) == 0
    assert _deg(chord2_sub(d30, d90)) == 0
    assert _deg(chord2_add(d60, zero)) == pytest.approx(60)
    assert _deg(chord2_sub(d60, zero)) == pytest.approx(60)
    assert _deg(chord2_add(zero, d60)) == pytest.approx(60)
    assert _deg(chord2_add(d30, d60)) == pytest.approx(90)
    assert _deg(chord2_add(d60, d30)) == pytest.approx(90)
    assert _deg(chord2_sub(d90, d30)) == pytest.approx(60)
    assert _deg(chord2_sub(d90, d60)) == pytest.approx(30)
    assert _deg(chord2_add(d180, zero)) == 180
    assert _deg(chord2_sub(d180, zero)) == 180
    assert _deg(chord2_add(d90, d90)) == 180
    assert _deg(chord2_add(d120, d90)) == 180
    assert _deg(chord2_add(d120, d120)) == 180
    assert _deg(chord2_add(d30, d180)) == 180
    assert _deg(chord2_add(d180, d180)) == 180


def test_arithmetic_precision():
    """Adding/subtracting tiny angles near pi/2 stays accurate to
    ~2 eps (s1chord_angle_test.cc:197-211)."""
    eps = angle_to_chord2(1e-15)
    k90 = chord2_from_length2(2)
    k90_minus = chord2_sub(k90, eps)
    k90_plus = chord2_add(k90, eps)
    max_err = 2 * DBL_EPS
    assert chord2_to_angle(k90_minus) == pytest.approx(
        PI / 2 - 1e-15, abs=max_err)
    assert chord2_to_angle(k90_plus) == pytest.approx(
        PI / 2 + 1e-15, abs=max_err)
    assert chord2_to_angle(chord2_sub(k90, k90_minus)) == pytest.approx(
        1e-15, abs=max_err)
    assert chord2_to_angle(chord2_sub(k90_plus, k90)) == pytest.approx(
        1e-15, abs=max_err)
    assert chord2_to_angle(chord2_add(k90_minus, eps)) == pytest.approx(
        PI / 2, abs=max_err)


def test_trigonometry():
    for it in range(21):
        radians = PI * it / 20
        c2 = angle_to_chord2(radians)
        assert chord2_sin(c2) == pytest.approx(math.sin(radians), abs=1e-15)
        assert chord2_cos(c2) == pytest.approx(math.cos(radians), abs=1e-15)
        assert math.atan(chord2_tan(c2)) == pytest.approx(
            math.atan(math.tan(radians)), abs=1e-15)

    # 90 and 180 degrees are exact in chord^2 space
    a90 = chord2_from_length2(2)
    a180 = chord2_from_length2(4)
    assert chord2_sin(a90) == 1
    assert chord2_cos(a90) == 0
    assert chord2_tan(a90) == math.inf
    assert chord2_sin(a180) == 0
    assert chord2_cos(a180) == -1
    assert chord2_tan(a180) == 0


def test_plus_error():
    assert chord2_plus_error(CHORD2_NEGATIVE, 5) == CHORD2_NEGATIVE
    assert chord2_plus_error(CHORD2_INFINITY, -5) == CHORD2_INFINITY
    assert chord2_plus_error(CHORD2_STRAIGHT, 5) == CHORD2_STRAIGHT
    assert chord2_plus_error(0.0, -5) == 0.0
    assert chord2_plus_error(chord2_from_length2(1), 0.25) == \
        chord2_from_length2(1.25)
    assert chord2_plus_error(chord2_from_length2(1), -0.25) == \
        chord2_from_length2(0.75)


def test_point_constructor_max_error():
    """The error bound covers the true chord^2 of random point pairs,
    checked with the exact-arithmetic distance comparison
    (s1chord_angle_test.cc:258-275)."""
    from fractions import Fraction

    rng = np.random.default_rng(77)
    for _ in range(2000):
        x = rng.normal(size=3)
        x /= np.linalg.norm(x)
        y = rng.normal(size=3)
        y /= np.linalg.norm(y)
        if rng.random() < 0.1:
            # nearly identical or antipodal pair
            y = x + 1e-15 * rng.random() * (y - x)
            y /= np.linalg.norm(y)
            if rng.random() < 0.5:
                y = -y
        d2 = chord2(tuple(x), tuple(y))
        err = chord2_point_constructor_max_error(d2)
        # exact squared chord of the stored doubles
        ex = [Fraction(float(a)) for a in x]
        ey = [Fraction(float(b)) for b in y]
        exact = sum((a - b) * (a - b) for a, b in zip(ex, ey))
        # normalize by the exact squared norms (points are ~unit)
        nx = sum(a * a for a in ex)
        ny = sum(b * b for b in ey)
        # exact chord^2 between the *normalized* points is
        # |x/|x| - y/|y||^2 = 2 - 2 <x,y>/(|x||y|); bound it via
        # the unnormalized value and the norm error instead of
        # taking exact square roots: the reference's claim is
        # chord2 + err >= true chord2, with |x|,|y| within 2eps of 1.
        approx_true = float(exact) / math.sqrt(float(nx) * float(ny))
        assert d2 + err >= min(4.0, approx_true) - 4 * DBL_EPS
    # a couple of deterministic sanity points
    assert chord2_point_constructor_max_error(4.0) >= 4.5 * DBL_EPS * 4.0
    assert chord2_angle_constructor_max_error(4.0) == 1.5 * DBL_EPS * 4.0
