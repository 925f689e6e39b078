"""Streaming exact dedup: dropDuplicatesWithinWatermark over the
document fingerprint, including state survival across a checkpointed
restart (a re-crawl arriving in a later run is still dropped)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from s2spark.streaming import dedup
from tests.conftest import SF_DIR


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="s2spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_chunk(df, src, name):
    stage = f"{src}/_stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.move(f"{stage}/{f}", f"{src}/{name}.parquet")
    shutil.rmtree(stage)


def test_stream_dedup_within_and_across_batches(spark, tmpd):
    src = f"{tmpd}/src"
    os.makedirs(src)
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(200)
            .withColumn("ts", F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("doc_id"))))
    n = docs.count()

    # chunk 0: every document twice (intra-run duplicates)
    _write_chunk(docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)),
        src, "c0")
    q = dedup.stream_dedup(spark, src, f"{tmpd}/out", f"{tmpd}/ckpt",
                           text_col="text")
    q.awaitTermination(120)
    got1 = spark.read.parquet(f"{tmpd}/out/data")
    assert got1.count() == n
    assert got1.select("fp").distinct().count() == n

    # chunk 1: re-crawls of half the corpus (same text, new ids,
    # slightly later event time) + genuinely new docs — a NEW run on
    # the SAME checkpoint must drop the re-crawls from restored state
    half = docs.where(F.col("doc_id") % 2 == 0)
    n_half = half.count()
    recrawl = (half.withColumn("doc_id", F.col("doc_id") + 2_000_000)
               .withColumn("ts", F.col("ts") + F.expr(
                   "INTERVAL 10 MINUTES")))
    fresh = (docs.where(F.col("doc_id") % 2 == 1)
             .withColumn("doc_id", F.col("doc_id") + 3_000_000)
             .withColumn("text", F.concat(F.col("text"),
                                          F.lit(" [v2 update]"))))
    n_fresh = fresh.count()
    _write_chunk(recrawl.unionByName(fresh), src, "c1")
    q2 = dedup.stream_dedup(spark, src, f"{tmpd}/out", f"{tmpd}/ckpt",
                            text_col="text")
    q2.awaitTermination(120)
    got2 = spark.read.parquet(f"{tmpd}/out/data")
    assert got2.count() == n + n_fresh
    assert got2.select("fp").distinct().count() == n + n_fresh
    assert n_half > 0 and n_fresh > 0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), (" HELLO\tWORLD ",),
         ("hello worlds",)], "text string")
    fps = [r[0] for r in df.select(
        dedup.fingerprint_col(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]
