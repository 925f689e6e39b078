#!/usr/bin/env python
"""spark-submit entry point: resumable exact-dedup pass over a
document corpus (the batch face of the LLM-pipeline dedup ops;
streaming face = s2spark/streaming/dedup.py).

    spark-submit --py-files s2spark.zip jobs/dedup_corpus.py \
        --input /data/documents.parquet --text-col text \
        --output /out/dedup --state-dir /out/state --n-buckets 8

Documents are fingerprinted (the streaming dedup's normalized
xxhash64 key) and bucketed BY FINGERPRINT HASH through
lineage.run_partitioned's bucket_expr, so every duplicate group lands
in one bucket and per-bucket deduplication is globally exact — no
cross-bucket shuffle.  The default job id is a deterministic hash of
(input, output), so a plain re-run of the same command RESUMES from
the lineage table (a crash loses at most one bucket); pass --job-id
to force a fresh pass.  The min(doc_id)-keeps-first rule is
deterministic under retries.  At 100 TB each bucket is an independent
hash-pruned scan and n_buckets scales with the cluster.
"""

from __future__ import annotations

import argparse
import hashlib


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
    # deterministic default job id -> re-running the same command
    # resumes instead of silently starting over
    job_id = args.job_id or "dedup-" + hashlib.md5(
        f"{args.input}|{args.output}".encode()).hexdigest()[:12]

    docs = (spark.read.parquet(args.input)
            .withColumn("fp", fingerprint_col(F.col(args.text_col))))

    def process(bucket_df):
        # keep the lowest doc id of each fingerprint group —
        # deterministic winner; exact within the bucket == exact
        # globally (fp-hash bucketing co-locates groups)
        w = Window.partitionBy("fp").orderBy(F.col(args.id_col))
        return (bucket_df
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn"))

    summary = lineage.run_partitioned(
        spark, docs, process, job_id, args.state_dir, args.output,
        n_buckets=args.n_buckets,
        bucket_expr=F.pmod(F.xxhash64("fp"),
                           F.lit(args.n_buckets)).cast("int"))

    print({"job_id": job_id, **summary})
    spark.stop()


if __name__ == "__main__":
    main()
