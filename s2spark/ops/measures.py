"""Distance/measure operators: Hausdorff + polyline running windows.

- hausdorff2: directed discrete Hausdorff (squared chord) between two
  point sets — max over A of min over B (S2HausdorffDistanceQuery
  semantics, s2hausdorff_distance_query.h:16-25) as a max-of-min
  aggregation.  min/max of doubles involve no accumulation, so the
  result is bit-exact vs the oracle regardless of partitioning.
  The brute pairing here broadcasts the smaller side; for two large
  sets, substitute ops.knn.knn_join(k=1) for the inner min — same
  aggregation shape.

- track_segments: per-entity polyline segments via a LAG window over
  event time (the S2ChainInterpolationQuery / polyline-measure
  analogue, SURVEY.md §2.7): emits per-segment chord² rather than a
  float running sum, so output is order-insensitive and exactly
  reproducible (float += across partitions is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import functions as s2f


def hausdorff2(a: DataFrame, b: DataFrame, a_id: str) -> DataFrame:
    """Directed Hausdorff² from A to B.  a/b: (id, x, y, z)."""
    bb = F.broadcast(b.select(F.col("x").alias("_bx"),
                              F.col("y").alias("_by"),
                              F.col("z").alias("_bz")))
    d2 = s2f.chord2_col(F.col("x"), F.col("y"), F.col("z"),
                        F.col("_bx"), F.col("_by"), F.col("_bz"))
    per_a = (a.crossJoin(bb)
             .groupBy(a_id)
             .agg(F.min(d2).alias("_min_d2")))
    return per_a.agg(F.max("_min_d2").alias("hausdorff2"))


def chain_midpoint(events: DataFrame, entity: str, order_cols: list[str]
                   ) -> DataFrame:
    """S2ChainInterpolationQuery analogue (s2chain_interpolation_query
    .h:16-26): running chord² length along each entity's ordered chain,
    then the first vertex at/after the 50% point.

    Determinism: segment lengths are quantized to integer units
    (floor(dist2 * 1e15)) before the running sum — float window
    aggregation orders differ across engines (Spark folds the frame
    sequentially, DuckDB uses a pairwise segment tree), but integer
    sums are order-free and exact.
    """
    seg = track_segments(events, entity, order_cols) \
        .withColumn("qdist",
                    F.floor(F.col("dist2") * F.lit(1.0e15)).cast("long"))
    w = Window.partitionBy(entity).orderBy("seq")
    cum = F.sum("qdist").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy(entity)
    c = seg.withColumn("cum", cum) \
           .withColumn("total", F.max(F.col("cum")).over(wall))
    hit = c.where(F.col("cum") * 2 >= F.col("total"))
    first = (hit.groupBy(entity)
             .agg(F.min("seq").alias("mid_seq")))
    return (hit.join(first, [entity])
            .where(F.col("seq") == F.col("mid_seq"))
            .select(entity, F.col("mid_seq").cast("int").alias("mid_seq"),
                    F.col("cum").alias("cum_units"),
                    F.col("total").alias("total_units")))


def track_segments(events: DataFrame, entity: str, order_cols: list[str]
                   ) -> DataFrame:
    """(entity, seq, dist2) — chord² between consecutive points of each
    entity's track, ordered by `order_cols` (must be a total order,
    e.g. [ts, event_id])."""
    w = Window.partitionBy(entity).orderBy(*order_cols)
    px, py, pz = (F.lag("x").over(w), F.lag("y").over(w),
                  F.lag("z").over(w))
    d2 = s2f.chord2_col(F.col("x"), F.col("y"), F.col("z"), px, py, pz)
    return (events
            .withColumn("seq", F.row_number().over(w))
            .withColumn("dist2", d2)
            .where(F.col("dist2").isNotNull())
            .select(F.col(entity), "seq", "dist2"))
