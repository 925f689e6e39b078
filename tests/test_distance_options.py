"""S2ClosestEdgeQuery Options parity (s2closest_edge_query.h:75-135):
include_interiors / max_distance / max_error on both the brute and
the expanding-ring plans (s2closest_edge_query_test.cc
TargetPointInsideIndexedPolygon + MaxDistance families)."""

import math

import numpy as np
import pandas as pd
import pytest

from s2spark.kernels import cellid as ck
from s2spark.kernels.loops import Loop
from s2spark.ops import edges as eops
from s2spark.ops import pip


def _points_df(spark, latlngs):
    rows = []
    for i, (lat, lng) in enumerate(latlngs):
        from s2spark.kernels.region import latlng_to_point
        p = latlng_to_point(math.radians(lat), math.radians(lng))
        leaf = int(ck.as_i64(ck.from_xyz(*[np.array([v])
                                           for v in p]))[0])
        rows.append((i, leaf, p[0], p[1], p[2]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["point_id", "cell_id",
                                    "x", "y", "z"]))


def test_target_point_inside_indexed_polygon(spark):
    """The reference fixture: a point in a polygon's interior with
    include_interiors + max_distance(1 deg) returns EXACTLY one
    result — (distance 0, edge_id -1); the other polygon (>1 deg
    away) contributes nothing."""
    loops = {0: Loop.from_text("0:0, 0:5, 5:5, 5:0"),
             1: Loop.from_text("0:10, 0:15, 5:15, 5:10")}
    pts = _points_df(spark, [(2.0, 12.0)])
    out = eops.closest_edge_join(
        pts, spark, loops, include_interiors=True,
        max_distance=math.radians(1.0)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["poly_id"] == 1 and r["edge_id"] == -1
    assert r["dist2"] == 0.0 and r["rank"] == 1


def test_max_distance_excludes_far_points(spark):
    loops = {0: Loop.from_text("0:0, 0:5, 5:5, 5:0")}
    # one point ~1 deg from the boundary, one ~40 deg away
    pts = _points_df(spark, [(6.0, 2.0), (45.0, 2.0)])
    out = eops.closest_edge_join(
        pts, spark, loops,
        max_distance=math.radians(5.0)).toPandas()
    assert set(out["point_id"]) == {0}


def test_ring_plan_options_match_brute(spark):
    """Force the expanding-ring plan (brute_threshold=0) and check it
    agrees with the brute sweep under max_distance, including points
    whose result set is empty or smaller than k."""
    loops = pip.synth_loops(15)
    rng = np.random.default_rng(23)
    v = rng.normal(size=(60, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(i, int(ck.as_i64(ck.from_xyz(*[np.array([c])
                                            for c in p]))[0]),
             p[0], p[1], p[2]) for i, p in enumerate(v)]
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["point_id", "cell_id",
                                    "x", "y", "z"]))
    maxd = 0.25
    ring = eops.closest_edge_join(
        pts, spark, loops, k=3, brute_threshold=0,
        max_distance=maxd).toPandas()
    brute = eops.closest_edge_join_brute(
        pts, spark, loops, k=3,
        max_dist2=eops._angle_chord2(maxd)).toPandas()
    key = ["point_id", "rank"]
    ring = ring.sort_values(key, ignore_index=True)
    brute = brute.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(
        ring[["point_id", "poly_id", "edge_id", "dist2"]],
        brute[["point_id", "poly_id", "edge_id", "dist2"]])
    # max_distance honoured and some point must have < k results
    assert (ring["dist2"] <= eops._angle_chord2(maxd)).all()
    counts = ring.groupby("point_id").size()
    assert (counts < 3).any() or len(counts) < 60


def test_max_error_still_returns_qualifying_result(spark):
    """max_error relaxes WHICH near-tie wins, never the distance
    values: with a huge max_error every returned distance must still
    be within max_error of the true minimum."""
    loops = pip.synth_loops(15)
    rng = np.random.default_rng(29)
    v = rng.normal(size=(40, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(i, int(ck.as_i64(ck.from_xyz(*[np.array([c])
                                            for c in p]))[0]),
             p[0], p[1], p[2]) for i, p in enumerate(v)]
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["point_id", "cell_id",
                                    "x", "y", "z"]))
    err = 0.05
    approx = eops.closest_edge_join(
        pts, spark, loops, k=1, brute_threshold=0,
        max_error=err).toPandas().set_index("point_id")
    exact = eops.closest_edge_join_brute(
        pts, spark, loops, k=1).toPandas().set_index("point_id")
    for pid in exact.index:
        d_true = math.asin(min(math.sqrt(
            float(exact.loc[pid, "dist2"])) / 2.0, 1.0)) * 2.0
        d_got = math.asin(min(math.sqrt(
            float(approx.loc[pid, "dist2"])) / 2.0, 1.0)) * 2.0
        assert d_got <= d_true + err + 1e-12


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
