#!/usr/bin/env python
"""spark-submit entry point: geotag + multi-level tile assignment with
per-partition lineage (north rule: "run via spark-submit --py-files",
"resumable from checkpoint with per-partition lineage + metrics").

    spark-submit --py-files s2spark.zip jobs/tile_assign.py \
        --input  /data/events.parquet  --key-col event_id \
        --output /out/tiles --state-dir /out/state --levels 4,8,12

Re-running with the same --state-dir and --job-id resumes: buckets with
a success record in the lineage table are skipped.

Output layout: Hilbert-sorted parquet under <output>/bucket=<b> with
(key, cell_id, tile_l{L}...) — the engine's storage contract (sort
order = cell_id ≙ Iceberg sort order; bucket ≙ bucket(cell_id)).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path, or synth:N for the image table")
    ap.add_argument("--key-col", default="event_id")
    ap.add_argument("--output", required=True)
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--levels", default="4,8,12")
    ap.add_argument("--job-id", default=None)
    ap.add_argument("--n-buckets", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from s2spark import dataset, functions as s2f, lineage

    spark = SparkSession.builder.appName("s2spark-tile-assign") \
        .getOrCreate()
    levels = [int(x) for x in args.levels.split(",")]

    if args.input.startswith("synth:"):
        df = dataset.synth_images(spark, int(args.input[6:]))
        key = "image_id"
    else:
        df = dataset.geotag(spark.read.parquet(args.input), args.key_col,
                            "events")
        key = args.key_col

    job_id = args.job_id or lineage.new_job_id()

    def assign(bucket_df):
        out = bucket_df.select(key, "cell_id", *[
            s2f.parent_col(F.col("cell_id"), lv).alias(f"tile_l{lv}")
            for lv in levels])
        return out.sortWithinPartitions("cell_id")

    summary = lineage.run_partitioned(
        spark, df, assign, job_id, args.state_dir, args.output,
        n_buckets=args.n_buckets)
    print({"job_id": job_id, **summary})
    spark.stop()


if __name__ == "__main__":
    main()
