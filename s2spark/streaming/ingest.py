"""Structured Streaming ingest: the engine's incremental index
maintenance (SURVEY.md §2.8).

The reference's MutableS2ShapeIndex applies batched insertions lazily
(mutable_s2shape_index.h:456-457); the Spark-native equivalent is a
stream of new rows flowing into the cell-bucketed table.  Cell
assignment is a pure function of the row, so late data needs no
special handling for the index itself; event-time windowed tile
counts use a watermark like any Spark aggregation.

- `stream_ingest`      : readStream -> geotag -> foreachBatch append
  into tile-partitioned parquet + a metrics row per micro-batch.
  Checkpointed: restarting with the same checkpoint dir processes
  only files not seen before (exactly-once per input file).
- `stream_tile_counts` : watermarked sliding-window tile counts
  (event-time), append mode.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import functions as s2f
from ..sources import geo


def stream_ingest(spark: SparkSession, source_dir: str, out_dir: str,
                  checkpoint_dir: str, key_col: str = "event_id",
                  tile_level: int = 6):
    """Start an availableNow ingest of parquet files appearing in
    `source_dir`; returns the StreamingQuery.  Output is appended to
    `out_dir/data` partitioned by tile, with per-batch metrics rows in
    `out_dir/metrics`."""
    schema = spark.read.parquet(source_dir).schema
    src = spark.readStream.schema(schema).parquet(source_dir)
    g = geo.geo_struct_udf()(F.col(key_col)).alias("_g")
    enriched = (src.select("*", g)
                .select("*", F.col("_g.*")).drop("_g")
                .withColumn("tile",
                            s2f.prefix_col(F.col("cell_id"), tile_level)))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        n = batch_df.count()
        (batch_df.write.mode("append").partitionBy("tile")
         .parquet(f"{out_dir}/data"))
        spark_l = batch_df.sparkSession
        (spark_l.createDataFrame(
            [(int(batch_id), n, float(time.time() - t0),
              float(time.time()))],
            "batch_id long, n_rows long, wall_s double, ts double")
         .write.mode("append").parquet(f"{out_dir}/metrics"))

    return (enriched.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_tile_counts(spark: SparkSession, source_dir: str,
                       checkpoint_dir: str, key_col: str = "event_id",
                       ts_col: str = "ts", tile_level: int = 4,
                       window: str = "1 hour",
                       watermark: str = "2 hours"):
    """Watermarked event-time tile counts -> in-memory table
    'tile_counts' (append mode: windows finalize once the watermark
    passes)."""
    schema = spark.read.parquet(source_dir).schema
    src = spark.readStream.schema(schema).parquet(source_dir)
    g = geo.geo_struct_udf()(F.col(key_col)).alias("_g")
    enriched = (src.select(F.col(ts_col).cast("timestamp").alias(ts_col),
                           g)
                .select(ts_col, F.col("_g.cell_id").alias("cell_id"))
                .withColumn("tile",
                            s2f.prefix_col(F.col("cell_id"), tile_level)))
    agg = (enriched
           .withWatermark(ts_col, watermark)
           .groupBy(F.window(F.col(ts_col), window), F.col("tile"))
           .agg(F.count(F.lit(1)).alias("n")))
    return (agg.writeStream.outputMode("append")
            .format("memory").queryName("tile_counts")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
