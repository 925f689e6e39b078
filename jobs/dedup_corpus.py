#!/usr/bin/env python
"""spark-submit entry point: resumable exact-dedup pass over a
document corpus (the batch face of the LLM-pipeline dedup ops;
streaming face = s2spark/streaming/dedup.py).

    spark-submit --py-files s2spark.zip jobs/dedup_corpus.py \
        --input /data/documents.parquet --text-col text \
        --output /out/dedup --state-dir /out/state --n-buckets 8

Documents are fingerprinted (same 64-bit key the streaming dedup and
the `doc_fingerprint` oracle use) and bucketed BY FINGERPRINT HASH, so
every duplicate group lands in one bucket and per-bucket
deduplication is globally exact — no cross-bucket shuffle, and the
lineage table makes a re-run skip completed buckets (a crash loses at
most one bucket).  At 100 TB each bucket is an independent
hash-pruned scan; n_buckets scales with the cluster, and the
min(doc_id)-keeps-first rule is deterministic under retries.
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--output", required=True)
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--job-id", default=None)
    ap.add_argument("--n-buckets", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window, functions as F

    from s2spark import lineage
    from s2spark.streaming.dedup import fingerprint_col

    spark = SparkSession.builder.appName("s2spark-dedup-corpus") \
        .getOrCreate()
    job_id = args.job_id or lineage.new_job_id()

    docs = (spark.read.parquet(args.input)
            .withColumn("fp", fingerprint_col(F.col(args.text_col)))
            .withColumn("_bucket",
                        F.pmod(F.xxhash64("fp"),
                               F.lit(args.n_buckets)).cast("int")))

    done = lineage.completed_buckets(spark, args.state_dir, job_id)
    ran, failed = [], []
    for b in range(args.n_buckets):
        if b in done:
            continue
        t0 = time.time()
        try:
            bucket = docs.where(F.col("_bucket") == b).drop("_bucket")
            # keep the lowest doc id of each fingerprint group —
            # deterministic winner, exact dedup within the bucket ==
            # exact globally (fp-hash bucketing co-locates groups)
            w = Window.partitionBy("fp").orderBy(F.col(args.id_col))
            out = (bucket
                   .withColumn("_rn", F.row_number().over(w))
                   .where(F.col("_rn") == 1).drop("_rn"))
            out.write.mode("overwrite").parquet(
                f"{args.output}/bucket={b}")
            n = lineage._written_rows(f"{args.output}/bucket={b}")
            lineage.record(spark, args.state_dir, job_id, b, n,
                           time.time() - t0, "ok")
            ran.append(b)
        except Exception as exc:  # noqa: BLE001 — lineage must record
            lineage.record(spark, args.state_dir, job_id, b, -1,
                           time.time() - t0,
                           f"error: {type(exc).__name__}")
            failed.append(b)

    print({"job_id": job_id, "ran": ran, "skipped": sorted(done),
           "failed": failed})
    spark.stop()


if __name__ == "__main__":
    main()
