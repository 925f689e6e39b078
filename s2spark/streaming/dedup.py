"""Streaming exact dedup — the Structured-Streaming face of the
LLM-pipeline dedup ops (ops/text.py dedup_exact / doc_fingerprint).

A training-data ingest pipeline receives document batches continuously
and must drop exact re-crawls before they reach storage.  Batch-side
that is a hash groupBy; stream-side the engine uses Spark's
`dropDuplicatesWithinWatermark`: state holds one entry per fingerprint
and is evicted once the watermark passes, so state size is bounded by
the dedup horizon instead of the corpus (the property that makes this
run forever on an unbounded crawl — a plain dropDuplicates would grow
state without bound).

The fingerprint is xxhash64 of the whitespace-normalized lowercased
body — a deliberately tolerant exact-dup key (re-crawls differing only
in whitespace/case collapse).  NOTE: it is NOT the same key as the
batch `dedup_exact` oracle (md5 of the RAW text) or the shingle-based
`doc_fingerprint`; pipelines mixing streaming admission with batch
backfills should pick ONE key (jobs/dedup_corpus.py uses this one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["fingerprint_col", "stream_dedup"]


def fingerprint_col(text_col):
    """64-bit content fingerprint as a Column — xxhash64 of the
    whitespace-normalized lowercased body (the cheap exact-dup key;
    the rolling-hash shingle fingerprint in ops/text.py is the
    near-dup variant)."""
    norm = F.lower(F.regexp_replace(text_col, r"\s+", " "))
    return F.xxhash64(F.trim(norm))


def stream_dedup(spark: SparkSession, source_dir: str, out_dir: str,
                 checkpoint_dir: str, text_col: str = "body",
                 ts_col: str = "ts", watermark: str = "2 hours"):
    """Start an availableNow dedup pass over parquet files appearing
    in `source_dir`: rows whose fingerprint was already seen within
    the watermark horizon are dropped; survivors append to
    `out_dir/data` with their fingerprint column.  Returns the
    StreamingQuery.

    State: one row per distinct fingerprint inside the horizon
    (dropDuplicatesWithinWatermark), evicted by event time — bounded
    by (dedup horizon × ingest rate), independent of corpus size.
    The driver tables' timestamps are timestamp_ntz; watermarks need
    timestamp, so the column is cast (CLAUDE.md round-2 note)."""
    schema = spark.read.parquet(source_dir).schema
    src = spark.readStream.schema(schema).parquet(source_dir)
    deduped = (src
               .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
               .withColumn("fp", fingerprint_col(F.col(text_col)))
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["fp"]))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent per-batch path: foreachBatch is at-least-once —
        # a replay after a crash overwrites the same directory instead
        # of appending duplicate rows
        (batch_df.write.mode("overwrite")
         .parquet(f"{out_dir}/data/batch={int(batch_id)}"))

    return (deduped.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
