"""Tile assignment & hierarchical rollups — the engine's GROUP BY plane.

The reference's hierarchy (parent/child over the Hilbert order,
s2cell_id.h:650-702) becomes pure int64 bit math in Spark SQL, so tile
aggregation is a single hash-aggregate with map-side partial combine —
no UDF, no extra shuffle beyond the one the aggregation needs.

Scale: at 10^12 rows the only shuffle is the final agg exchange keyed by
the tile id; cardinality is bounded by 6*4^level so AQE coalesces the
post-shuffle partitions.  Multi-level rollups explode k level values
*after* map-side pre-aggregation at the finest level, shrinking shuffle
volume by the fan-in of the finest tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as s2f


def tile_counts(df: DataFrame, level: int, cell_col: str = "cell_id",
                out_col: str = "tile") -> DataFrame:
    """Per-tile row counts at one level (SURVEY.md §7.4 flagship)."""
    return (df.groupBy(s2f.parent_col(F.col(cell_col), level).alias(out_col))
              .agg(F.count(F.lit(1)).alias("n")))


def tile_rollup(df: DataFrame, levels: list[int],
                cell_col: str = "cell_id") -> DataFrame:
    """Counts at several levels in one pass.

    Two-phase: pre-aggregate at the finest level (big shuffle shrinks to
    <=6*4^max_level rows), then explode the level list over the compact
    intermediate and re-aggregate — the classic rollup trick; Spark's
    GROUPING SETS would rescan the raw input per grouping instead.
    """
    finest = max(levels)
    pre = tile_counts(df, finest, cell_col, out_col="fine")
    lv = F.explode(F.array(*[F.lit(x) for x in levels])).alias("level")
    return (pre.select("fine", "n", lv)
               .groupBy("level",
                        s2f.parent_dyn_col(F.col("fine"),
                                           F.col("level")).alias("tile"))
               .agg(F.sum("n").alias("n")))
