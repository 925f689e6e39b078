"""Polyline alignment parity (kernels/alignment.py) against the
reference's own fixtures (s2polyline_alignment_test.cc): window
construction/upsample/dilate private-API expected strings, the header-
file DTW example's exact warp path, brute-force cost equality, FastDTW
approx-vs-exact bounds, and the medoid/consensus fixture tables."""

import math

import numpy as np
import pytest

from s2spark.kernels import alignment as al
from s2spark.kernels.loops import parse_vertices as pv
from s2spark.kernels.region import _latitude, _longitude


def test_window_from_strides_and_warp_path():
    w = al.Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
    assert w.stride(0) == (0, 3) and w.stride(4) == (4, 6)
    path = [(0, 0), (1, 0), (1, 1), (2, 1), (3, 1),
            (3, 2), (3, 3), (4, 4), (4, 5)]
    w2 = al.Window.from_warp_path(path)
    assert [w2.stride(i) for i in range(5)] \
        == [(0, 1), (0, 2), (1, 2), (1, 4), (4, 6)]


def test_window_upsample_golden():
    w = al.Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
    assert w.upsample(10, 12).debug_string() == (
        " * * * * * * . . . . . .\n"
        " * * * * * * . . . . . .\n"
        " . . * * * * * * . . . .\n"
        " . . * * * * * * . . . .\n"
        " . . . . * * * * . . . .\n"
        " . . . . * * * * . . . .\n"
        " . . . . . . * * * * * *\n"
        " . . . . . . * * * * * *\n"
        " . . . . . . . . * * * *\n"
        " . . . . . . . . * * * *\n")


def test_window_dilate_goldens():
    w = al.Window([(0, 3), (2, 3), (2, 3), (2, 4), (3, 6)])
    assert w.dilate(0).debug_string() == (
        " * * * . . .\n . . * . . .\n . . * . . .\n"
        " . . * * . .\n . . . * * *\n")
    assert w.dilate(1).debug_string() == (
        " * * * * . .\n * * * * . .\n . * * * * .\n"
        " . * * * * *\n . * * * * *\n")
    assert w.dilate(2).debug_string() == (
        " * * * * * .\n * * * * * *\n * * * * * *\n"
        " * * * * * *\n * * * * * *\n")
    assert w.dilate(100).debug_string() == (
        " * * * * * *\n" * 5)


def test_exact_header_file_example():
    a = pv("1:0, 5:0, 6:0, 9:0")
    b = pv("2:0, 7:0, 8:0")
    cost, path = al.exact_vertex_alignment(a, b)
    assert path == [(0, 0), (1, 1), (2, 1), (3, 2)]
    want = sum(float(np.linalg.norm(a[i] - b[j])) for i, j in path)
    assert cost == pytest.approx(want, abs=1e-15)


def _brute_cost(a, b, i, j, memo=None):
    if memo is None:
        memo = {}
    if (i, j) in memo:
        return memo[(i, j)]
    d = float(np.linalg.norm(a[i] - b[j]))
    if i == 0 and j == 0:
        r = d
    elif i == 0:
        r = _brute_cost(a, b, i, j - 1, memo) + d
    elif j == 0:
        r = _brute_cost(a, b, i - 1, j, memo) + d
    else:
        r = min(_brute_cost(a, b, i - 1, j - 1, memo),
                _brute_cost(a, b, i - 1, j, memo),
                _brute_cost(a, b, i, j - 1, memo)) + d
    memo[(i, j)] = r
    return r


def test_exact_matches_brute_force():
    rng = np.random.default_rng(9)
    for _ in range(20):
        na, nb = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        A = rng.normal(size=(na, 3))
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B = rng.normal(size=(nb, 3))
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        assert al.exact_vertex_alignment_cost(A, B) \
            == pytest.approx(_brute_cost(A, B, na - 1, nb - 1),
                             rel=1e-12)


def _correlated_pair(rng, n):
    t = np.linspace(0, 1, n)
    out = []
    for _ in range(2):
        lat = 5 * np.sin(6 * t) + rng.normal(0, 0.2, n)
        lng = 10 * t + rng.normal(0, 0.2, n)
        out.append(np.stack(
            [np.cos(np.radians(lng)) * np.cos(np.radians(lat)),
             np.sin(np.radians(lng)) * np.cos(np.radians(lat)),
             np.sin(np.radians(lat))], axis=1))
    return out


def test_approx_bounds_exact():
    """FastDTW cost is an upper bound on the exact cost and close for
    correlated sequences (the reference's FewLargePolylines usage)."""
    rng = np.random.default_rng(5)
    for _ in range(6):
        A, B = _correlated_pair(rng, 80)
        ec = al.exact_vertex_alignment_cost(A, B)
        ac, path = al.approx_vertex_alignment(A, B, radius=2)
        assert ac >= ec - 1e-12
        assert ac <= 1.3 * ec
        assert path[0] == (0, 0) and path[-1] == (79, 79)


def test_medoid_fixtures():
    assert al.medoid_polyline([pv("5:0, 5:1, 5:2")]) == 0
    # two polylines always tie -> lowest index
    assert al.medoid_polyline([pv("5:0, 5:1, 5:2"),
                               pv("1:0, 1:1, 1:2")]) == 0
    assert al.medoid_polyline([pv("5:0, 5:1, 5:2"),
                               pv("3:0, 3:1, 3:2"),
                               pv("1:0, 1:1, 1:2")]) == 1
    assert al.medoid_polyline([pv("1:0, 1:1, 1:2"),
                               pv("1:0, 1:1, 1:2")]) == 0
    assert al.medoid_polyline(
        [pv("5:0, 5:1, 5:2"), pv("3:0, 3:0.5, 3:1, 3:2"),
         pv("1:0, 1:0.5, 1:1, 1:1.5, 1:2")]) == 1
    # exact and approx agree on these small fixtures
    assert al.medoid_polyline([pv("5:0, 5:1, 5:2"),
                               pv("3:0, 3:1, 3:2"),
                               pv("1:0, 1:1, 1:2")], approx=False) == 1


def _latlng(c):
    return [(round(math.degrees(_latitude(p)), 4),
             round(math.degrees(_longitude(p)), 4)) for p in c]


def test_consensus_fixtures():
    res = al.consensus_polyline([pv("3:0, 3:1, 3:2"),
                                 pv("1:0, 1:1, 1:2")])
    assert _latlng(res) == [(2.0, 0.0), (2.0, 1.0), (2.0, 2.0)]
    res = al.consensus_polyline([pv("1:0, 1:1, 1:2"),
                                 pv("1:0, 1:1, 1:2")])
    assert _latlng(res) == [(1.0, 0.0), (1.0, 1.0), (1.0, 2.0)]
    res = al.consensus_polyline([pv("3:0, 3:1, 3:2")])
    assert _latlng(res) == [(3.0, 0.0), (3.0, 1.0), (3.0, 2.0)]
