"""Snap-to-cell-center (InitToSnapped analogue, s2polyline_test.cc
InitToSnapped semantics)."""

import math

import numpy as np

from s2spark import dataset
from s2spark.kernels import cellid
from s2spark.ops import snap
from tests.conftest import SF_DIR


def test_snap_at_max_level_approx_equals(spark):
    """Leaf-level snapping moves each vertex by at most the leaf cell
    diagonal (~1e-7 degrees — the reference's ApproxEquals(E7)
    guarantee)."""
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .where("event_id < 200") \
        .select("event_id", "cell_id", "x", "y", "z")
    got = snap.snap_points(ev, 30, with_xyz=True) \
        .select("x", "y", "z", "sx", "sy", "sz").toPandas()
    d = np.sqrt(((got[["x", "y", "z"]].to_numpy()
                  - got[["sx", "sy", "sz"]].to_numpy()) ** 2).sum(1))
    assert d.max() <= math.radians(2e-7)


def test_snap_centers_reencode_to_their_cell(spark):
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .where("event_id < 100").select("cell_id")
    rows = snap.snap_points(ev, 12, with_xyz=True) \
        .select("snap_cell", "sx", "sy", "sz").collect()
    from s2spark.kernels import coords
    for r in rows:
        f, u, v = coords.xyz_to_face_uv(
            np.array([r["sx"]]), np.array([r["sy"]]),
            np.array([r["sz"]]))
        i = coords.st_to_ij(coords.uv_to_st(u))
        j = coords.st_to_ij(coords.uv_to_st(v))
        leaf = cellid.from_face_ij(f, i, j)
        anc = cellid.parent(leaf.view(np.uint64), np.int64(12))
        assert int(cellid.as_i64(anc)[0]) == r["snap_cell"]


def test_snap_track_dedups_consecutive(spark):
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .select("event_id", "user_id", "ts", "cell_id")
    full = ev.count()
    coarse = snap.snap_track(ev, "user_id", ["ts", "event_id"],
                             2).count()
    fine = snap.snap_track(ev, "user_id", ["ts", "event_id"],
                           30).count()
    assert coarse < full  # coarse snapping collapses runs
    assert fine == full   # leaf snapping collapses nothing (distinct)
    # seq_out is dense 1..n per user
    import pandas as pd
    pdf = snap.snap_track(ev, "user_id", ["ts", "event_id"], 2) \
        .toPandas()
    for uid, grp in pdf.groupby("user_id"):
        assert sorted(grp["seq_out"]) == list(range(1, len(grp) + 1))
