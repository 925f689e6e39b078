"""Streaming geofencing: enter/exit events for entities moving
through a polygon set (the classic S2 streaming workload — PIP as a
stream operator + transition state).

Structured-Streaming constraints shape the plan:

1. The PIP verdict must be AGGREGATION-FREE (a streaming aggregation
   before applyInPandasWithState would chain two stateful operators).
   The edge-cell index is PACKED: each (icell, poly_id) row carries
   its <= max_edges_per_cell edges as array columns, and index cells
   are disjoint per loop, so a point matches at most ONE index row
   per polygon — the crossing-parity verdict (contains_center XOR
   parity of cc->p crossings against the packed edges) completes
   per-row inside one Arrow UDF.  No shuffle-side aggregation.
2. The stream side joins the (small, broadcast) static index on the
   same per-level prefix keys as batch pip_join; the distinct level
   list comes from the driver-built index, not a stream action.
3. Transitions are the single stateful operator: state per entity =
   the fence-id set after its last processed point; each micro-batch
   emits (entity, seq, fence_id, 'enter'|'exit') for every set
   change along the entity's ordered points.  Checkpointed state
   survives restarts (tests drop files in two runs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, LongType, StringType,
                               StructField, StructType)

from .. import functions as s2f
from ..kernels import cellid
from ..kernels.loops import Loop
from ..ops import pip


def packed_edge_index(spark: SparkSession, loops: dict[int, Loop]
                      ) -> tuple[DataFrame, list[int]]:
    """(icell, poly_id, contains_center, ccx..ccz, eax[]..ebz[]) — one
    row per index cell with its edges packed as arrays; plus the
    distinct icell levels (driver-known, so the stream plan needs no
    action on the static side)."""
    cells_pd, edges_pd = pip.build_edge_index(loops)
    if len(edges_pd):
        packed = (edges_pd
                  .groupby(["icell", "poly_id"])
                  .agg({c: list for c in ("ax", "ay", "az",
                                          "bx", "by", "bz")})
                  .rename(columns={c: "e" + c for c in
                                   ("ax", "ay", "az", "bx", "by", "bz")})
                  .reset_index())
        merged = cells_pd.merge(packed, on=["icell", "poly_id"],
                                how="left")
    else:
        merged = cells_pd.copy()
        for c in ("ax", "ay", "az", "bx", "by", "bz"):
            merged["e" + c] = [[] for _ in range(len(merged))]
    for c in ("eax", "eay", "eaz", "ebx", "eby", "ebz"):
        merged[c] = merged[c].apply(
            lambda v: v if isinstance(v, list) else [])
    levels = sorted({int(v) for v in
                     cellid.level(cells_pd["icell"].to_numpy(np.int64))})
    return spark.createDataFrame(merged), levels


@pandas_udf(BooleanType())
def _inside_udf(px, py, pz, ccx, ccy, ccz, cc_in,
                eax, eay, eaz, ebx, eby, ebz):
    from ..kernels import predicates
    out = []
    for k in range(len(px)):
        ax = eax.iloc[k]
        if ax is None or len(ax) == 0:
            out.append(bool(cc_in.iloc[k]))
            continue
        n = len(ax)
        a = np.broadcast_to([ccx.iloc[k], ccy.iloc[k], ccz.iloc[k]],
                            (n, 3))
        b = np.broadcast_to([px.iloc[k], py.iloc[k], pz.iloc[k]],
                            (n, 3))
        c = np.column_stack([np.asarray(ax), np.asarray(eay.iloc[k]),
                             np.asarray(eaz.iloc[k])])
        d = np.column_stack([np.asarray(ebx.iloc[k]),
                             np.asarray(eby.iloc[k]),
                             np.asarray(ebz.iloc[k])])
        par = int(predicates.edge_or_vertex_crossing(a, b, c, d).sum()) % 2
        out.append(bool(cc_in.iloc[k]) != (par == 1))
    return pd.Series(out)


def point_fences(points: DataFrame, index: DataFrame,
                 levels: list[int], point_id: str = "point_id",
                 extra_cols: tuple = (),
                 keep_misses: bool = False) -> DataFrame:
    """(point rows) -> (point_id, *extra_cols, poly_id) for each fence
    containing the point.  Aggregation-free; works on streams.

    keep_misses=True keeps every input point with a sentinel
    poly_id=-1 (per level branch) — the streaming mode: a stream-
    stream outer join back onto the source is not allowed, so misses
    ride along inside the single linear plan instead."""
    out = None
    idx = F.broadcast(index)
    how = "left" if keep_misses else "inner"
    for lv in levels:
        r = idx.where(s2f.level_col(F.col("icell")) == lv) \
               .withColumn("_jc", s2f.prefix_col(F.col("icell"), lv))
        p = points.withColumn("_jc",
                              s2f.prefix_col(F.col("cell_id"), lv))
        j = p.join(r, "_jc", how).drop("_jc")
        out = j if out is None else out.unionByName(j)
    inside = F.when(
        F.col("icell").isNotNull(),
        _inside_udf("x", "y", "z", "ccx", "ccy", "ccz",
                    "contains_center", "eax", "eay", "eaz",
                    "ebx", "eby", "ebz")).otherwise(F.lit(False))
    out = out.withColumn("_in", inside)
    if keep_misses:
        return out.select(
            point_id, *extra_cols,
            F.when(F.col("_in"), F.col("poly_id"))
            .otherwise(F.lit(-1)).cast("long").alias("poly_id"))
    return (out.where(F.col("_in"))
            .select(point_id, *extra_cols, "poly_id"))


TRANSITION_OUTPUT = StructType([
    StructField("entity", LongType()),
    StructField("seq", LongType()),
    StructField("fence_id", LongType()),
    StructField("event", StringType())])
TRANSITION_STATE = StructType([
    StructField("last_seq", LongType()),
    StructField("fences", StringType())])  # csv of fence ids


def _transitions(key, pdfs, state: GroupState):
    last_seq, fences = (state.get if state.exists else (-1, ""))
    cur = set(int(v) for v in fences.split(",") if v != "")
    rows = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # per (seq): full fence set at that position (poly_id -1 = none)
    by_seq = {}
    for r in batch.itertuples():
        s = int(r.seq)
        by_seq.setdefault(s, set())
        if int(r.poly_id) >= 0:
            by_seq[s].add(int(r.poly_id))
    for s in sorted(by_seq):
        if s <= last_seq:
            continue  # replayed row (at-least-once sink)
        nxt = by_seq[s]
        for fid in sorted(nxt - cur):
            rows.append((int(key[0]), s, fid, "enter"))
        for fid in sorted(cur - nxt):
            rows.append((int(key[0]), s, fid, "exit"))
        cur = nxt
        last_seq = s
    state.update((last_seq, ",".join(str(v) for v in sorted(cur))))
    yield pd.DataFrame(rows, columns=["entity", "seq", "fence_id",
                                      "event"])


def stream_geofence(spark: SparkSession, source_dir: str,
                    checkpoint_dir: str, out_dir: str,
                    loops: dict[int, Loop],
                    key_col: str = "event_id",
                    entity_col: str = "entity",
                    seq_col: str = "seq"):
    """availableNow stream of (entity, seq, key) rows -> enter/exit
    events appended under out_dir; restart with the same checkpoint
    resumes each entity's fence state and processes only new files."""
    from ..sources import geo
    index, levels = packed_edge_index(spark, loops)
    schema = spark.read.parquet(source_dir).schema
    src = spark.readStream.schema(schema).parquet(source_dir)
    g = geo.geo_struct_udf()(F.col(key_col)).alias("_g")
    pts = src.select(F.col(entity_col).alias("entity"),
                     F.col(seq_col).alias("seq"), g) \
        .select("entity", "seq", F.col("_g.cell_id").alias("cell_id"),
                F.col("_g.x").alias("x"), F.col("_g.y").alias("y"),
                F.col("_g.z").alias("z"))
    merged = point_fences(pts, index, levels, point_id="entity",
                          extra_cols=("seq",), keep_misses=True)
    out = (merged.groupBy("entity")
           .applyInPandasWithState(_transitions, TRANSITION_OUTPUT,
                                   TRANSITION_STATE, "append",
                                   GroupStateTimeout.NoTimeout))

    def sink(batch_df, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(out_dir))

    q = (out.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
