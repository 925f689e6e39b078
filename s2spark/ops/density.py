"""Data-driven cell density tree (S2DensityTree analogue,
s2density_tree.h:16-40): adaptive cell weights for partitioning.

The reference's density tree stores weights for a subdivision that
stops where cells fall under a weight threshold; shard planners then
cut the tree into ~equal-weight ranges.  Spark-first construction:

1. ONE scan aggregates weights at the finest level (map-side combine).
2. Coarser levels roll up from the finer aggregate (each a tiny
   shuffle over the already-reduced frame — never a second scan).
3. The tree = cells whose every ancestor exceeds the threshold
   (visited), flagged leaf where the cell itself is under the
   threshold or at max_level — derived with per-level semi-joins on
   the small aggregates.

`partition_plan` turns the leaves into an explicit scan/shuffle
partitioning: split factor ceil(weight / target) per leaf — this is
how salting factors and bucket splits come from DATA rather than the
fixed hot_threshold of ops.joins.salt_hot_cells.

Every step is integer relational algebra -> the DuckDB oracle
re-derives the whole tree (driver query `density_tree`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import functions as s2f


def cell_weights(df: DataFrame, cell_col: str, max_level: int,
                 weight_col: str | None = None) -> dict[int, DataFrame]:
    """Per-level weight frames {level: (cell, weight)}; one scan of
    `df`, then rollups of the reduced frame."""
    w = (F.sum(weight_col) if weight_col
         else F.count(F.lit(1))).alias("weight")
    # materialize the finest aggregate: every coarser level and every
    # visited-chain branch derives from it, and Spark does NOT share
    # common subplans across union branches — without this the base
    # table is re-scanned once per tree level (measured 15 scans)
    finest = (df.select(s2f.prefix_col(F.col(cell_col), max_level)
                        .alias("cell"))
              .groupBy("cell").agg(w)
              .localCheckpoint(eager=True))
    out = {max_level: finest}
    cur = finest
    for lv in range(max_level - 1, -1, -1):
        # cells here are SHIFTED prefixes: one level coarser = >> 2
        cur = (cur.select(
            F.shiftrightunsigned(F.col("cell"), 2).alias("cell"),
            "weight")
            .groupBy("cell").agg(F.sum("weight").alias("weight")))
        out[lv] = cur
    return out


def density_tree(df: DataFrame, cell_col: str, threshold: int,
                 max_level: int,
                 weight_col: str | None = None) -> DataFrame:
    """(level, cell, weight, is_leaf) for every visited tree cell."""
    weights = cell_weights(df, cell_col, max_level, weight_col)
    levels = []
    visited = weights[0]  # all roots are visited
    for lv in range(0, max_level + 1):
        is_leaf = (F.col("weight") <= threshold) | (lv == max_level)
        levels.append(visited.select(
            F.lit(lv).cast("int").alias("level"), "cell", "weight",
            is_leaf.alias("is_leaf")))
        if lv == max_level:
            break
        parents_over = visited.where(F.col("weight") > threshold) \
            .select(F.col("cell").alias("_pc"))
        nxt = weights[lv + 1].withColumn(
            "_pc", F.shiftrightunsigned(F.col("cell"), 2))
        visited = nxt.join(parents_over, "_pc", "left_semi") \
            .drop("_pc")
    out = levels[0]
    for frame in levels[1:]:
        out = out.unionByName(frame)
    return out


def partition_plan(tree: DataFrame, target: int) -> DataFrame:
    """Leaves -> (cell, level, weight, n_splits): the data-derived
    bucket/salting plan (ceil(weight / target) ways per leaf)."""
    return (tree.where("is_leaf")
            .select("cell", "level", "weight",
                    F.ceil(F.col("weight") / F.lit(target))
                    .cast("int").alias("n_splits")))
