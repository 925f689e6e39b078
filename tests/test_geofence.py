"""Streaming geofence: enter/exit transitions with checkpoint
restart, verified against brute-force containment."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2spark.ops import pip
from s2spark.sources import geo
from s2spark.streaming import geofence


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="s2spark_geo_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _pick_keys(loop, want_inside: bool, n: int,
               lo: int = 0, hi: int = 200_000) -> list[int]:
    """Deterministic keys whose geo position is (not) inside loop."""
    keys = np.arange(lo, hi, dtype=np.int64)
    xs, ys, zs = geo.xyz_np(keys)
    pts = np.stack([xs, ys, zs], axis=1)
    inside = loop.contains_points(pts)
    sel = keys[inside == want_inside]
    assert len(sel) >= n, (want_inside, len(sel))
    return [int(v) for v in sel[:n]]


def _write_chunk(spark, rows, path):
    pdf = pd.DataFrame(rows, columns=["entity", "seq", "event_id"])
    df = spark.createDataFrame(pdf)
    stage = path + "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(stage, f), path)
    shutil.rmtree(stage)


def test_point_fences_matches_pip_join(spark):
    loops = pip.synth_loops(6)
    from s2spark import dataset
    from tests.conftest import SF_DIR
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .select("event_id", "cell_id", "x", "y", "z")
    index, levels = geofence.packed_edge_index(spark, loops)
    got = {(r["event_id"], r["poly_id"]) for r in
           geofence.point_fences(ev, index, levels,
                                 point_id="event_id").collect()}
    want = {(r["event_id"], r["poly_id"]) for r in
            pip.pip_join(ev, spark, loops,
                         point_id="event_id").collect()}
    assert got == want
    assert len(want) > 0


def test_stream_geofence_transitions_with_restart(spark, tmpd):
    loops = {0: pip.synth_loops(4)[0], 1: pip.synth_loops(4)[1]}
    in0 = _pick_keys(loops[0], True, 4)
    in1 = _pick_keys(loops[1], True, 2)
    out_k = _pick_keys(loops[0], False, 6)
    out_k = [k for k in out_k
             if not loops[1].contains_points(
                 np.stack(geo.xyz_np(np.array([k], dtype=np.int64)),
                          axis=1))[0]][:4]

    src = f"{tmpd}/src"
    os.makedirs(src)
    # batch 1: entity 7 walks outside -> inside fence 0;
    #          entity 8 stays outside
    _write_chunk(spark, [(7, 0, out_k[0]), (7, 1, in0[0]),
                         (8, 0, out_k[1])], f"{src}/c0.parquet")
    geofence.stream_geofence(spark, src, f"{tmpd}/ckpt",
                             f"{tmpd}/out", loops)
    ev1 = spark.read.parquet(f"{tmpd}/out") \
        .select("entity", "seq", "fence_id", "event").collect()
    got1 = {(r["entity"], r["seq"], r["fence_id"], r["event"])
            for r in ev1}
    assert got1 == {(7, 1, 0, "enter")}

    # batch 2 (same checkpoint): entity 7 exits fence 0 and enters
    # fence 1; entity 8 enters fence 0
    _write_chunk(spark, [(7, 2, in1[0]), (8, 1, in0[1]),
                         (8, 2, out_k[2])], f"{src}/c1.parquet")
    geofence.stream_geofence(spark, src, f"{tmpd}/ckpt",
                             f"{tmpd}/out", loops)
    ev2 = spark.read.parquet(f"{tmpd}/out") \
        .select("entity", "seq", "fence_id", "event").collect()
    got2 = {(r["entity"], r["seq"], r["fence_id"], r["event"])
            for r in ev2}
    assert got2 == {(7, 1, 0, "enter"),
                    (7, 2, 0, "exit"), (7, 2, 1, "enter"),
                    (8, 1, 0, "enter"), (8, 2, 0, "exit")}
