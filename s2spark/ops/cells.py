"""S2ClosestCellQuery analogue (s2closest_cell_query.h:16-24): per
query point, the k nearest (cell_id, label) entries of a cell index,
by chord² distance to the CELL (0 when the point is inside it).

Distance semantics (S2Cell::GetDistance): an S2 cell is geodesically
convex, so for an outside point the distance is the min over its four
boundary geodesics (kernels/edges.point_segment_chord2); containment
uses the leaf-range test (leaf(p) within [range_min, range_max] —
signed int64 compare, identical in Spark/DuckDB/NumPy since a cell's
range never crosses the sign boundary).

Plan (same shape as ops/edges.closest_edge_join):
- brute-below-threshold: tiny index -> one broadcast sweep
  (s2closest_point_query_base.h:534-537 regime);
- indexed: every index cell is keyed by its level-L prefix (L = the
  index's minimum level, so each cell gets exactly ONE key), query
  points equi-join expanding neighbor-ring prefixes, the Arrow UDF
  computes exact cell distances on survivors, a metric stop bound
  certifies finished points, stragglers fall back to brute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType

from .. import functions as s2f
from ..kernels import cellid
from ..kernels.edges import point_segment_chord2
from .edges import _covered_chord2


def cell_vertices(ids: np.ndarray) -> np.ndarray:
    """Vectorized S2Cell corner decode: (m,) ids -> (m,4,3) CCW unit
    vertices ((lo,lo),(hi,lo),(hi,hi),(lo,hi) in uv, matching
    Cell.get_vertex) — replaces the per-distinct-cell Python loop
    (VERDICT r3 plan-audit nit: ~0.55 ms/cell scalar overhead)."""
    from ..kernels import coords
    u64 = cellid.as_u64(np.atleast_1d(np.asarray(ids)))
    face, i, j = cellid.to_face_ij_orientation(u64)
    lev = cellid.level(u64)
    size = np.int64(1) << (np.int64(cellid.MAX_LEVEL) - lev)
    i_lo = i & ~(size - 1)
    j_lo = j & ~(size - 1)
    lim = float(coords.LIMIT_IJ)
    u_lo = coords.st_to_uv(i_lo.astype(np.float64) / lim)
    u_hi = coords.st_to_uv((i_lo + size).astype(np.float64) / lim)
    v_lo = coords.st_to_uv(j_lo.astype(np.float64) / lim)
    v_hi = coords.st_to_uv((j_lo + size).astype(np.float64) / lim)
    m = len(u64)
    out = np.empty((m, 4, 3), dtype=np.float64)
    face_i = face.astype(np.int64)
    for k, (uu, vv) in enumerate(((u_lo, v_lo), (u_hi, v_lo),
                                  (u_hi, v_hi), (u_lo, v_hi))):
        x, y, z = coords.normalize_xyz(
            *coords.face_uv_to_xyz(face_i, uu, vv))
        out[:, k, 0] = x
        out[:, k, 1] = y
        out[:, k, 2] = z
    return out


def point_cell_chord2(p: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """(n,3) unit points, (n,) int64 cell ids -> (n,) chord² to each
    cell (0 inside).  Vertices are decoded once per distinct cell."""
    p = np.asarray(p, dtype=np.float64)
    cells = np.asarray(cells, dtype=np.int64)
    n = cells.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    leaf = cellid.as_i64(cellid.from_xyz(p[:, 0], p[:, 1], p[:, 2]))
    u = cells.view(np.uint64)
    lo = cellid.as_i64(cellid.range_min(u))
    hi = cellid.as_i64(cellid.range_max(u))
    contained = (leaf >= lo) & (leaf <= hi)
    uniq, inv = np.unique(cells, return_inverse=True)
    verts = cell_vertices(uniq)               # (m,4,3), vectorized
    d2 = np.full(n, np.inf, dtype=np.float64)
    for k in range(4):
        a = verts[inv, k]
        b = verts[inv, (k + 1) % 4]
        d2 = np.minimum(d2, point_segment_chord2(p, a, b))
    return np.where(contained, 0.0, d2)


@pandas_udf(DoubleType())
def _point_cell_chord2_udf(px, py, pz, icell):
    p = np.column_stack([px, py, pz]).astype(np.float64)
    return pd.Series(point_cell_chord2(p, icell.to_numpy(np.int64)))


BRUTE_FORCE_CELL_THRESHOLD = 4096


def _rank_topk(cand: DataFrame, point_id: str, k: int) -> DataFrame:
    w = Window.partitionBy(point_id).orderBy(
        F.col("dist2"), F.col("label"), F.col("icell"))
    d2 = _point_cell_chord2_udf("x", "y", "z", "icell")
    return (cand.withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(point_id, "icell", "label", "dist2",
                    F.col("rank").cast("int").alias("rank")))


def closest_cell_join_brute(points: DataFrame, index: DataFrame,
                            point_id: str = "point_id",
                            k: int = 1) -> DataFrame:
    """(point_id, icell, label, dist2, rank) — broadcast sweep."""
    cand = s2f.spread(points.select(point_id, "x", "y", "z")) \
        .crossJoin(F.broadcast(index.select("icell", "label")))
    return _rank_topk(cand, point_id, k)


def closest_cell_join(points: DataFrame, index: DataFrame,
                      point_id: str = "point_id", k: int = 1,
                      n_index: int | None = None,
                      level: int | None = None, max_rounds: int = 3,
                      initial_rings: int = 2,
                      brute_threshold: int = BRUTE_FORCE_CELL_THRESHOLD
                      ) -> DataFrame:
    """k nearest index cells per point.

    points: (point_id, cell_id, x, y, z); index: (icell, label) at
    arbitrary levels >= the chosen ring level."""
    if n_index is None:
        n_index = index.count()
    if n_index <= brute_threshold:
        return closest_cell_join_brute(points, index, point_id, k)
    if level is None:
        level = int(index.agg(F.min(s2f.level_col(F.col("icell"))))
                    .collect()[0][0])
    idx = (index.select("icell", "label",
                        s2f.prefix_col(F.col("icell"), level)
                        .alias("_pcell"))
           .localCheckpoint(eager=True))

    remaining = points.select(point_id, "cell_id", "x", "y", "z")
    done = []
    rings = initial_rings
    w = Window.partitionBy(point_id).orderBy(
        F.col("dist2"), F.col("label"), F.col("icell"))
    for _ in range(max_rounds):
        cand = (remaining
                .select(point_id, "cell_id", "x", "y", "z",
                        F.explode(s2f.s2_disk_cells(
                            F.col("cell_id"), F.lit(level),
                            F.lit(rings))).alias("_rc"))
                .select(point_id, "x", "y", "z",
                        s2f.prefix_col(F.col("_rc"), level)
                        .alias("_pcell"))
                .join(idx, "_pcell")
                .dropDuplicates([point_id, "icell", "label"]))
        topk = _rank_topk(cand, point_id, k) \
            .localCheckpoint(eager=True)
        bound = _covered_chord2(level, rings)
        stats = (topk.groupBy(point_id)
                 .agg(F.max("dist2").alias("_kth"),
                      F.count(F.lit(1)).alias("_n")))
        ok_ids = stats.where((F.col("_n") == k)
                             & (F.col("_kth") < bound)) \
            .select(point_id)
        done.append(topk.join(ok_ids, point_id, "left_semi"))
        remaining = (remaining.join(ok_ids, point_id, "left_anti")
                     .localCheckpoint(eager=True))
        if remaining.isEmpty():
            break
        rings *= 2
    else:
        if not remaining.isEmpty():
            done.append(closest_cell_join_brute(remaining, idx,
                                                point_id, k))
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out
