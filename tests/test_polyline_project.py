"""S2Polyline Project / UnInterpolate / GetSuffix parity
(s2polyline_test.cc:195-300 fixture tables)."""

import numpy as np
import pytest

from s2spark.kernels.edges import (polyline_get_suffix,
                                   polyline_project,
                                   polyline_uninterpolate)
from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.region import latlng_to_point


def ll(lat, lng):
    return np.asarray(latlng_to_point(np.radians(lat),
                                      np.radians(lng)))


def approx_eq(p, q, tol=1e-11):
    return float(np.linalg.norm(np.asarray(p) - np.asarray(q))) < tol


LINE = parse_vertices("0:0, 0:1, 0:2, 1:2")


@pytest.mark.parametrize("probe,expect,expect_next", [
    ((0.5, -0.5), (0, 0), 1),
    ((0.5, 0.5), (0, 0.5), 1),
    ((0.5, 1), (0, 1), 2),
    ((-0.5, 2.5), (0, 2), 3),
    ((2, 2), (1, 2), 4),
])
def test_project_reference_table(probe, expect, expect_next):
    closest, nxt = polyline_project(LINE, ll(*probe))
    assert approx_eq(closest, ll(*expect), tol=1e-9)
    assert nxt == expect_next


def test_project_single_vertex():
    single = parse_vertices("1:1")
    for probe in ((2, 2), (-1, 0)):
        closest, nxt = polyline_project(single, ll(*probe))
        assert approx_eq(closest, ll(1, 1))
        assert nxt == 1


def test_uninterpolate_reference_table():
    point_line = np.asarray([[1.0, 0.0, 0.0]])
    assert polyline_uninterpolate(point_line,
                                  np.array([0.0, 1.0, 0.0]), 1) == 0.0
    v = np.asarray([[1, 0, 0], [0, 1, 0],
                    np.array([0, 1, 1]) / np.sqrt(2), [0, 0, 1]],
                   dtype=np.float64)
    for frac, want in ((-0.1, 0.0), (0.0, 0.0), (0.5, 0.5),
                       (0.75, 0.75), (1.1, 1.0)):
        p, nxt = polyline_get_suffix(v, frac)
        got = polyline_uninterpolate(v, p, nxt)
        assert got == pytest.approx(want, abs=1e-15)
    # clamped to 1.0 for a point "past" the end
    assert polyline_uninterpolate(v, np.array([0.0, 1.0, 0.0]),
                                  len(v)) == 1.0


def test_get_suffix_interpolate_table():
    # s2polyline_test.cc:195-225 Interpolate semantics through
    # GetSuffix: fractions land at arc-length positions
    v = np.asarray([[1, 0, 0], [0, 1, 0],
                    np.array([0, 1, 1]) / np.sqrt(2), [0, 0, 1]],
                   dtype=np.float64)
    p, nxt = polyline_get_suffix(v, 0.0)
    assert approx_eq(p, v[0]) and nxt == 1
    # total length = 90 + 45 + 45 = 180 deg; fraction 0.5 -> the
    # 90-deg mark = second vertex
    p, nxt = polyline_get_suffix(v, 0.5)
    assert approx_eq(p, v[1], tol=1e-12)
    p, nxt = polyline_get_suffix(v, 1.0)
    assert approx_eq(p, v[-1]) and nxt == len(v)
    p, nxt = polyline_get_suffix(v, 0.25)
    want = np.array([np.cos(np.radians(45)), np.sin(np.radians(45)),
                     0.0])
    assert approx_eq(p, want, tol=1e-12)


def test_project_then_uninterpolate_roundtrip():
    rng = np.random.default_rng(11)
    for _ in range(20):
        f = float(rng.uniform(0, 1))
        p, nxt = polyline_get_suffix(LINE, f)
        closest, nxt2 = polyline_project(LINE, p)
        assert approx_eq(closest, p, tol=1e-12)
        got = polyline_uninterpolate(LINE, closest, nxt2)
        assert got == pytest.approx(f, abs=1e-9)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
