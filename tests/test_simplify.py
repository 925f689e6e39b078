"""SubsampleVertices vs the reference's fixture table
(s2polyline_test.cc:404-454), plus the distributed track-simplify op
and DTW alignment."""

import math

import numpy as np
import pytest

from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.simplify import subsample_vertices


def check(poly_str: str, tolerance_deg: float, expected: str):
    v = parse_vertices(poly_str) if poly_str else np.zeros((0, 3))
    got = subsample_vertices(v, math.radians(tolerance_deg))
    want = [int(s) for s in expected.split(",")] if expected else []
    assert got == want, (got, want)


def test_trivial_inputs():
    check("", 1.0, "")
    check("0:1", 1.0, "0")
    check("10:10, 11:11", 5.0, "0,1")
    check("-1:0, 0:0, 1:0", 1e-15 * 180 / math.pi * math.pi / 180, "0,2")
    check("0:0, 1:1, 0:1", 0.0, "0,1,2")


def test_simple_example():
    poly = "0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4"
    check(poly, 3.0, "0,9")
    check(poly, 2.0, "0,6,9")
    check(poly, 0.9, "0,2,6,9")
    check(poly, 0.4, "0,1,2,3,4,6,9")
    check(poly, 0.0, "0,1,2,3,4,5,6,7,8,9")


def test_guarantees():
    # no duplicate vertices
    check("10:10, 12:12, 10:10", 5.0, "0")
    check("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, "0,3,4")
    # >90-degree segment handling
    check("90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0",
          5.0, "0,2,4,5,6,7")
    # parametric equivalence (backtracking preserved)
    check("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, "0,2,3,4")
    check("10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0, "0,2,3,5")
    check("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, "0,4")


def test_tolerance_guarantee_property():
    """Every dropped vertex stays within tolerance of the simplified
    polyline (the documented guarantee)."""
    from s2spark.kernels import edges as ek
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = 30
        lat = np.cumsum(rng.normal(0, 1.0, n))
        lng = np.cumsum(rng.normal(0, 1.0, n))
        txt = ", ".join(f"{la:.6f}:{ln:.6f}" for la, ln in zip(lat, lng))
        v = parse_vertices(txt)
        tol = 0.02
        kept = subsample_vertices(v, tol)
        kv = v[kept]
        # chord distance bound equivalent of the angular tolerance
        chord_tol = (2 * math.sin(tol / 2)) ** 2
        for p in v:
            if len(kv) == 1:
                d2 = float(((p - kv[0]) ** 2).sum())
            else:
                a = kv[:-1]
                b = kv[1:]
                pp = np.broadcast_to(p, a.shape)
                d2 = float(ek.point_segment_chord2(pp, a, b).min())
            assert d2 <= chord_tol * (1 + 1e-9), d2


def test_simplify_track_operator(spark):
    """Distributed per-entity simplify agrees with the kernel."""
    import pandas as pd
    from s2spark.ops import measures
    rng = np.random.default_rng(11)
    frames = []
    for uid in range(4):
        n = 25
        lat = np.cumsum(rng.normal(0, 0.5, n))
        lng = np.cumsum(rng.normal(0, 0.5, n))
        txt = ", ".join(f"{la:.6f}:{ln:.6f}" for la, ln in zip(lat, lng))
        v = parse_vertices(txt)
        frames.append(pd.DataFrame({
            "user_id": uid, "ts": range(n), "event_id": range(n),
            "x": v[:, 0], "y": v[:, 1], "z": v[:, 2]}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    got = {}
    for r in measures.simplify_track(df, "user_id",
                                     ["ts", "event_id"],
                                     0.01).collect():
        got.setdefault(r["user_id"], []).append(r["kept_seq"])
    for uid in range(4):
        sub = pdf[pdf["user_id"] == uid].sort_values("ts")
        v = sub[["x", "y", "z"]].to_numpy(np.float64)
        want = subsample_vertices(v, 0.01)
        assert sorted(got[uid]) == want


def test_dtw_alignment_vs_brute(spark):
    """Pairwise DTW track alignment agrees with the quadratic DP."""
    import pandas as pd
    from s2spark.kernels.simplify import dtw_cost
    from s2spark.ops import measures
    rng = np.random.default_rng(13)
    frames = []
    for uid in range(3):
        n = 15
        lat = 10 * uid + np.cumsum(rng.normal(0, 0.3, n))
        lng = np.cumsum(rng.normal(0, 0.3, n))
        txt = ", ".join(f"{la:.6f}:{ln:.6f}" for la, ln in zip(lat, lng))
        v = parse_vertices(txt)
        frames.append(pd.DataFrame({
            "user_id": uid, "ts": range(n), "event_id": range(n),
            "x": v[:, 0], "y": v[:, 1], "z": v[:, 2]}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    pairs = [(0, 1), (0, 2), (1, 2)]
    got = {(r["id_a"], r["id_b"]): r["dtw_cost"]
           for r in measures.track_alignment(df, "user_id",
                                             ["ts", "event_id"],
                                             pairs).collect()}
    for a, b in pairs:
        va = pdf[pdf["user_id"] == a].sort_values("ts")[
            ["x", "y", "z"]].to_numpy(np.float64)
        vb = pdf[pdf["user_id"] == b].sort_values("ts")[
            ["x", "y", "z"]].to_numpy(np.float64)
        assert got[(a, b)] == pytest.approx(dtw_cost(va, vb), rel=0,
                                            abs=0)
