"""Checkpoint-resumable batch jobs with per-partition lineage + metrics
(north rule: "resumable from checkpoint with per-partition lineage and
metrics tables").

Work is split into deterministic cell buckets (hash of the Hilbert
prefix — the same sharding S2RegionSharder performs by covering
weight, s2region_sharder.cc:114-136).  Each bucket's completion is
recorded in a lineage table; a resumed run recomputes ONLY buckets
without a success record.  On Iceberg the lineage table would be a
real table with atomic appends; here it is a parquet directory with
one file per bucket attempt (append-safe without a catalog).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import functions as s2f

LINEAGE_SCHEMA = ("job_id string, bucket int, n_rows long, wall_s double, "
                  "status string, ts double")


def bucket_col(cell, level: int, n_buckets: int):
    return F.pmod(F.xxhash64(s2f.prefix_col(cell, level)),
                  F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, state_dir: str,
                      job_id: str) -> set[int]:
    path = f"{state_dir}/lineage"
    if not os.path.exists(path):
        return set()
    df = spark.read.parquet(path)
    return {r["bucket"] for r in
            df.where((F.col("job_id") == job_id)
                     & (F.col("status") == "ok"))
            .select("bucket").distinct().collect()}


def record(spark: SparkSession, state_dir: str, job_id: str, bucket: int,
           n_rows: int, wall_s: float, status: str) -> None:
    (spark.createDataFrame(
        [(job_id, bucket, n_rows, wall_s, status, float(time.time()))],
        LINEAGE_SCHEMA)
     .coalesce(1).write.mode("append").parquet(f"{state_dir}/lineage"))


def run_partitioned(spark: SparkSession, df: DataFrame, process,
                    job_id: str, state_dir: str, out_dir: str,
                    cell_col: str = "cell_id", level: int = 4,
                    n_buckets: int = 8, bucket_expr=None) -> dict:
    """Process `df` bucket-by-bucket with resume.

    `process(bucket_df) -> DataFrame` is the per-bucket transformation;
    its result is appended under out_dir/bucket=<b>.  A bucket is
    skipped iff a prior attempt recorded status='ok'.  Returns a
    summary dict (buckets run / skipped / failed).

    Scale note: bucketing by hashed cell prefix keeps each run a
    partition-pruned scan (with Hilbert-sorted storage the bucket
    predicate prunes row groups); the lineage write is tiny and
    per-bucket, so a crash loses at most one bucket of work.

    `bucket_expr` overrides the cell-prefix bucketing with any int
    Column in [0, n_buckets) — e.g. a fingerprint hash, so dedup
    groups co-locate (jobs/dedup_corpus.py).
    """
    work = df.withColumn(
        "_bucket", bucket_expr if bucket_expr is not None
        else bucket_col(F.col(cell_col), level, n_buckets))
    done = completed_buckets(spark, state_dir, job_id)
    ran, failed = [], []
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        try:
            out = process(work.where(F.col("_bucket") == b)
                          .drop("_bucket"))
            # write first, then read the committed row count from the
            # parquet footers — one execution of process() per bucket,
            # not two (count-then-write re-runs the whole plan)
            out.write.mode("overwrite").parquet(f"{out_dir}/bucket={b}")
            n = _written_rows(f"{out_dir}/bucket={b}")
            record(spark, state_dir, job_id, b, n, time.time() - t0, "ok")
            ran.append(b)
        except Exception as exc:  # noqa: BLE001 — lineage must record
            record(spark, state_dir, job_id, b, -1, time.time() - t0,
                   f"error: {type(exc).__name__}")
            failed.append(b)
    return {"ran": ran, "skipped": sorted(done), "failed": failed}


def _written_rows(path: str) -> int:
    """Row count of a just-committed parquet dir from file footers
    (driver-side metadata read — no Spark job, no recompute)."""
    import pyarrow.parquet as pq
    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(path, name)) \
                .metadata.num_rows
    return total


def new_job_id() -> str:
    return uuid.uuid4().hex[:12]
