"""Convex hull kernel vs the reference's fixture suite
(s2convex_hull_query_test.cc:48-230, re-expressed)."""

import numpy as np
import pytest

from s2spark.kernels import hull as hk
from s2spark.kernels.loops import Loop, parse_vertices


def _cyclic_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """BoundaryEquals: same cyclic vertex sequence."""
    if len(a) != len(b):
        return False
    n = len(a)
    for r in range(n):
        if all(np.array_equal(a[(r + i) % n], b[i]) for i in range(n)):
            return True
    return False


def test_no_points():
    assert len(hk.convex_hull(np.zeros((0, 3)))) == 0


def test_one_point_and_duplicates():
    p = np.array([[0.0, 0.0, 1.0]])
    assert np.array_equal(hk.convex_hull(p), p)
    dup = np.repeat(p, 3, axis=0)
    assert np.array_equal(hk.convex_hull(dup), p)


def test_two_antipodal_points_full():
    pts = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    assert hk.convex_hull(pts) is None  # full sphere


def test_non_convex_points_full():
    """The six face centers span the sphere
    (s2convex_hull_query_test.cc:128-139)."""
    from s2spark.kernels import cellid
    from s2spark.kernels.region import Cell
    pts = np.array([Cell(int(cellid.from_face(np.array([f]))[0]))
                    .get_center() for f in range(6)])
    assert hk.convex_hull(pts) is None


def test_simple_polyline_fixture():
    """Exact hull of the reference's polyline fixture
    (s2convex_hull_query_test.cc:141-152)."""
    pts = parse_vertices(
        "0:1, 0:9, 1:6, 2:6, 3:10, 4:10, 5:5, 4:0, 3:0, 2:5, 1:5")
    want = parse_vertices("0:1, 0:9, 3:10, 4:10, 5:5, 4:0, 3:0")
    got = hk.convex_hull(pts)
    assert _cyclic_equal(got, want)


def _regular_loop(radius_rad: float, n: int) -> np.ndarray:
    """Regular loop around the north pole (S2Loop::MakeRegularLoop)."""
    ang = 2 * np.pi * np.arange(n) / n
    s, c = np.sin(radius_rad), np.cos(radius_rad)
    return np.stack([s * np.cos(ang), s * np.sin(ang),
                     np.full(n, c)], axis=1)


@pytest.mark.parametrize("deg,n", [(1, 3), (89, 3), (10, 100),
                                   (89, 1000)])
def test_north_pole_loops_self_hull(deg, n):
    pts = _regular_loop(np.radians(deg), n)
    got = hk.convex_hull_of_loop(Loop(pts))
    assert got is not None
    assert _cyclic_equal(got, pts)


@pytest.mark.parametrize("deg", [91, 179])
def test_north_pole_loops_past_hemisphere_full(deg):
    """AddLoop semantics: the hull contains the loop INTERIOR, which
    here wraps a pole and crosses the equator -> full sphere
    (s2convex_hull_query_test.cc:184-196)."""
    pts = _regular_loop(np.radians(deg), 3)
    assert hk.convex_hull_of_loop(Loop(pts)) is None


def test_points_inside_hull_invariant():
    """Adding points inside the hull must not change it
    (s2convex_hull_query_test.cc:197-230, deterministic variant)."""
    rng = np.random.default_rng(7)
    for _ in range(25):
        center = rng.normal(size=3)
        center /= np.linalg.norm(center)
        r = rng.uniform(0.05, 1.0)
        # tangent basis
        ref = np.array([0.0, 0.0, 1.0]) if abs(center[2]) < 0.9 \
            else np.array([1.0, 0.0, 0.0])
        u = np.cross(center, ref)
        u /= np.linalg.norm(u)
        v = np.cross(center, u)
        ang = rng.uniform(0, 2 * np.pi, size=40)
        rad = r * np.sqrt(rng.uniform(0, 1, size=40))
        pts = (np.cos(rad)[:, None] * center
               + np.sin(rad)[:, None] * (np.cos(ang)[:, None] * u
                                         + np.sin(ang)[:, None] * v))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        hull1 = hk.convex_hull(pts)
        assert hull1 is not None
        # every input point must be inside (or on) the hull loop
        loop = Loop(hull1)
        onhull = {tuple(p) for p in hull1}
        inside = loop.contains_points(pts)
        for i, p in enumerate(pts):
            if tuple(p) not in onhull:
                assert inside[i], i
        # re-running with interior points added keeps the hull
        mid = pts.mean(axis=0)
        mid /= np.linalg.norm(mid)
        pts2 = np.vstack([pts, mid[None, :]])
        hull2 = hk.convex_hull(pts2)
        assert _cyclic_equal(hull1, hull2)


def test_hull_operator_distributed(spark):
    """convex_hull_by_group agrees with the driver-side kernel."""
    from s2spark.ops import hull as hops
    from s2spark.sources import geo
    import pandas as pd
    keys = np.arange(200, dtype=np.int64)
    xs, ys, zs = geo.xyz_np(keys)
    pdf = pd.DataFrame({"grp": keys % 5, "pkey": keys,
                        "x": xs, "y": ys, "z": zs})
    df = spark.createDataFrame(pdf)
    got = {}
    for r in hops.convex_hull_by_group(df, "grp", "pkey").collect():
        got.setdefault(r["grp"], []).append((r["seq"], r["point_key"]))
    for g in range(5):
        sub = pdf[pdf["grp"] == g].sort_values("pkey",
                                               ignore_index=True)
        idx = hk.hull_indices(sub[["x", "y", "z"]].to_numpy(np.float64))
        want = [(i, int(sub["pkey"][j])) for i, j in enumerate(idx)] \
            if idx is not None else [(-1, -1)]
        assert sorted(got[g]) == sorted(want)
