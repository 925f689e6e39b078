"""Streaming ingest (checkpointed, incremental) + batch resume with
per-partition lineage."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from s2spark import dataset, lineage
from s2spark.streaming import ingest
from tests.conftest import SF_DIR


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="s2spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _split_events(spark, src_dir, n_splits=2):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    parts = []
    for i in range(n_splits):
        p = f"{src_dir}/chunk{i}"
        ev.where(F.col("event_id") % n_splits == i) \
          .coalesce(1).write.mode("overwrite").parquet(p)
        parts.append(p)
    return parts


def test_stream_ingest_incremental(spark, tmpd):
    src = f"{tmpd}/src"
    os.makedirs(src)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_total = ev.count()
    half = ev.where(F.col("event_id") % 2 == 0)
    n_half = half.count()
    half.coalesce(1).write.parquet(f"{src}/batch0.parquet")
    # hack: file-source streams read a directory of same-schema files
    # — write chunks as sibling parquet dirs' files
    for f in os.listdir(f"{src}/batch0.parquet"):
        if f.endswith(".parquet"):
            shutil.move(f"{src}/batch0.parquet/{f}", f"{src}/c0.parquet")
    shutil.rmtree(f"{src}/batch0.parquet")

    q = ingest.stream_ingest(spark, src, f"{tmpd}/out", f"{tmpd}/ckpt")
    q.awaitTermination(120)
    got1 = spark.read.parquet(f"{tmpd}/out/data")
    assert got1.count() == n_half
    assert "tile" in got1.columns and "cell_id" in got1.columns

    # second chunk appears; SAME checkpoint -> only new file processed
    rest = ev.where(F.col("event_id") % 2 == 1)
    rest.coalesce(1).write.parquet(f"{tmpd}/stage")
    for f in os.listdir(f"{tmpd}/stage"):
        if f.endswith(".parquet"):
            shutil.move(f"{tmpd}/stage/{f}", f"{src}/c1.parquet")
    q2 = ingest.stream_ingest(spark, src, f"{tmpd}/out", f"{tmpd}/ckpt")
    q2.awaitTermination(120)
    got2 = spark.read.parquet(f"{tmpd}/out/data")
    assert got2.count() == n_total
    # exactly-once: no duplicates
    assert got2.select("event_id").distinct().count() == n_total
    # metrics table has one row per non-empty micro-batch
    m = spark.read.parquet(f"{tmpd}/out/metrics")
    assert m.count() >= 2
    assert m.agg(F.sum("n_rows")).collect()[0][0] == n_total


def test_stream_tile_counts_watermark(spark, tmpd):
    src = f"{tmpd}/src"
    os.makedirs(src)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{tmpd}/stage")
    for f in os.listdir(f"{tmpd}/stage"):
        if f.endswith(".parquet"):
            shutil.move(f"{tmpd}/stage/{f}", f"{src}/c0.parquet")
    q = ingest.stream_tile_counts(spark, src, f"{tmpd}/ckpt")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM tile_counts")
    # append mode emits only watermark-finalized windows; with
    # availableNow the final watermark closes all-but-the-latest
    assert out.count() > 0
    assert set(out.columns) == {"window", "tile", "n"}


def test_lineage_resume(spark, tmpd):
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .select("event_id", "cell_id")
    job = lineage.new_job_id()

    calls = {"n": 0}

    def flaky(bucket_df):
        calls["n"] += 1
        if calls["n"] == 3:  # fail on the third processed bucket
            raise RuntimeError("injected")
        return bucket_df.groupBy("cell_id").count()

    r1 = lineage.run_partitioned(spark, ev, flaky, job,
                                 f"{tmpd}/state", f"{tmpd}/out")
    assert len(r1["failed"]) == 1
    assert len(r1["ran"]) == 7

    def ok(bucket_df):
        return bucket_df.groupBy("cell_id").count()

    r2 = lineage.run_partitioned(spark, ev, ok, job,
                                 f"{tmpd}/state", f"{tmpd}/out")
    assert r2["ran"] == r1["failed"]          # ONLY the failed bucket
    assert set(r2["skipped"]) == set(r1["ran"])
    assert not r2["failed"]

    total = spark.read.parquet(f"{tmpd}/out") \
        .agg(F.sum("count")).collect()[0][0]
    assert total == ev.count()
    lin = spark.read.parquet(f"{tmpd}/state/lineage")
    assert lin.where(F.col("status") == "ok").count() == 8
    assert lin.where(F.col("status") != "ok").count() == 1


def test_stateful_tile_counts_across_restarts(spark, tmpd):
    """applyInPandasWithState: running totals survive a checkpointed
    restart and absorb only the new files."""
    from s2spark import dataset
    from s2spark.functions import prefix_col
    from s2spark.streaming import stateful
    src = f"{tmpd}/src"
    os.makedirs(src)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for i, pred in ((0, F.col("event_id") % 2 == 0),
                    (1, F.col("event_id") % 2 == 1)):
        ev.where(pred).coalesce(1).write.mode("overwrite") \
          .parquet(f"{tmpd}/stage{i}")

    def move(i):
        for f in os.listdir(f"{tmpd}/stage{i}"):
            if f.endswith(".parquet"):
                shutil.move(f"{tmpd}/stage{i}/{f}", f"{src}/c{i}.parquet")

    move(0)
    q = stateful.stream_tile_state(spark, src, f"{tmpd}/ckpt",
                                   f"{tmpd}/out")
    q.awaitTermination(120)
    out1 = spark.read.parquet(f"{tmpd}/out")
    first = {r["tile"]: r["n_total"] for r in out1.collect()}
    assert sum(first.values()) == ev.where(F.col("event_id") % 2 == 0) \
        .count()

    move(1)
    q2 = stateful.stream_tile_state(spark, src, f"{tmpd}/ckpt",
                                    f"{tmpd}/out")
    q2.awaitTermination(120)
    out2 = spark.read.parquet(f"{tmpd}/out")
    # ground truth totals per tile over the WHOLE table
    truth = {r["tile"]: r["cnt"] for r in
             dataset.geotagged_events(spark, SF_DIR)
             .groupBy(prefix_col(F.col("cell_id"), 4).alias("tile"))
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # rows emitted in the second batch must be CUMULATIVE: exactly the
    # ground-truth totals (state restored from the checkpoint)
    second = {r["tile"]: r["n_total"]
              for r in out2.where(F.col("batch_id") > 0).collect()}
    assert len(second) > 0
    for t, n in second.items():
        assert n == truth[t], (t, n, truth[t])
    # and strictly greater than batch-1 for tiles present in both
    grew = [t for t in second if t in first and second[t] > first[t]]
    assert grew, "no tile shows cumulative growth"
