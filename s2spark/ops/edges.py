"""Edge queries over the cell-indexed loop edges (SURVEY.md §2.3):

- closest_edge_join  : S2ClosestEdgeQuery analogue — per point, the
  k nearest polygon edges (distance + edge identity).  Indexed plan:
  the edge-cell index (pip.build_edge_index, forced to >= ring level)
  keys every edge at one fixed level; each point equi-joins expanding
  neighbor-ring cells against those keys exactly like point kNN
  (ops/knn.py), with the same metric stop bound and a brute-force
  fallback for stragglers — mirroring the reference's
  brute-force-below-threshold strategy
  (s2closest_edge_query.h:17-21, s2closest_point_query_base.h:534-537).
- crossing_edge_join : S2CrossingEdgeQuery analogue — all (query
  edge, indexed edge) crossing pairs.  Indexed plan: each query edge
  is covered with cells (kernels.edges.EdgeRegion + RegionCoverer,
  the same candidate scheme as s2crossing_edge_query.h:17-24), then
  two equi-joins implement "covering cell overlaps index cell"
  (ancestor-term duality: c ⊇ icell via icell's ancestor terms,
  icell ⊇ c via c's ancestor terms), then the robust CrossingSign
  kernel filters.

Both run the geometry in Arrow-batched kernels post-join; the joins
themselves are hash equi-joins (no cross join anywhere in the indexed
paths — asserted by tests/test_plans.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType

from .. import functions as s2f
from ..kernels import metrics
from ..kernels.loops import Loop
from . import pip

# fallback ring-key level for the indexed closest-edge search;
# normally picked adaptively from the edge count (pick_edge_level)
RING_LEVEL = 5


def pick_edge_level(n_edges: int, k: int) -> int:
    """Coarsest level where one 3x3 ring is expected to hold >= ~4k
    edges (the dual of knn.pick_level: the loop dict is driver-side,
    so this costs no Spark scan)."""
    want = max(4 * k, 8)
    lv = 0
    while lv < 10 and 9.0 * n_edges / (6.0 * 4.0 ** (lv + 1)) >= want:
        lv += 1
    return lv


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


def _indexed_edges(spark: SparkSession, loops: dict[int, Loop],
                   min_level: int = 0) -> tuple[DataFrame, pd.DataFrame]:
    """Edge-cell index as a Spark frame: (icell, poly_id, edge_id,
    ax..bz).  Driver-built for small loop dims; the distributed build
    (pip.build_edge_index_distributed) produces the same rows for
    large polygon tables."""
    _, edges_pd = pip.build_edge_index(loops, min_level=min_level)
    return spark.createDataFrame(edges_pd), edges_pd


def _covered_chord2(level: int, rings: int,
                    max_error: float = 0.0) -> float:
    """Chord² guaranteed-covered bound of a ring search, relaxed by
    `max_error` (s2closest_point_query_base.h:696-724: a result within
    max_error of the proven floor may be accepted early — any
    unexamined edge is farther than covered_ang >= found - max_error)."""
    import math
    ang = min(metrics.MIN_WIDTH.get_value(level) * rings
              + max(max_error, 0.0), math.pi)
    return (2.0 * math.sin(0.5 * ang)) ** 2


def _angle_chord2(ang: float) -> float:
    import math
    return (2.0 * math.sin(0.5 * min(max(ang, 0.0), math.pi))) ** 2


BRUTE_FORCE_EDGE_THRESHOLD = 2048
# above this many indexed edges the ring join must shuffle on the key
# instead of broadcasting the whole index (VERDICT r3 #2: a
# million-polygon edge set must never transit the driver)
BROADCAST_EDGE_LIMIT = 200_000


def closest_edge_join(points: DataFrame, spark: SparkSession,
                      loops: dict[int, Loop] | None = None,
                      point_id: str = "point_id",
                      k: int = 1, furthest: bool = False,
                      level: int | None = None, max_rounds: int = 3,
                      initial_rings: int = 2,
                      brute_threshold: int = BRUTE_FORCE_EDGE_THRESHOLD,
                      edge_index: DataFrame | None = None,
                      n_edges: int | None = None,
                      broadcast_edge_limit: int = BROADCAST_EDGE_LIMIT,
                      include_interiors: bool = False,
                      polygons: dict[int, list[Loop]] | None = None,
                      max_distance: float | None = None,
                      max_error: float = 0.0) -> DataFrame:
    """(point_id, poly_id, edge_id, dist2, rank): the k nearest (or,
    with furthest=True, furthest — S2FurthestEdgeQuery,
    s2furthest_edge_query.h:16-20) indexed edges per point.

    Options mirror S2ClosestEdgeQuery::Options
    (s2closest_edge_query.h:75-135):
    - include_interiors: a point inside a polygon's interior gets a
      distance-0 result with edge_id = -1 (the reference's
      is_interior() result; s2closest_edge_query_test.cc
      TargetPointInsideIndexedPolygon).  Interiors come from
      `polygons` (polygon_id -> even/odd loop list); with plain
      `loops` each loop is its own polygon.
    - max_distance (radians): only edges strictly within it are
      returned (the "all edges within radius" mode) — and the ring
      search STOPS expanding once the rings provably cover
      max_distance, even with < k results.
    - max_error (radians): early-stop slack — a k-th result within
      max_error of the proven covered bound is accepted without
      another ring round (the reference shrinks its search the same
      way, s2closest_point_query_base.h:696-724).  Results remain
      exact distances; only WHICH near-tie wins may differ.

    points: (point_id, cell_id, x, y, z).  Nearest uses the expanding
    -ring edge-cell index search; furthest keeps the broadcast sweep
    (a ring bound cannot prune for maxima — the reference's furthest
    query walks the whole index best-first too).

    The index side is EITHER a driver-side `loops` dict (small dims)
    OR a prebuilt distributed `edge_index` frame — the edges output of
    pip.build_edge_index_distributed (icell, poly_id, edge_id, ax..bz)
    — so a million-polygon edge set never materializes on the driver.
    A prebuilt index must have been built with min_level >= `level`
    (pass `level` explicitly to match).  The index is broadcast only
    below `broadcast_edge_limit` edges; above it the ring join
    shuffles on the prefix key and AQE picks the strategy.
    """
    if edge_index is None and loops is None:
        raise ValueError("need loops or edge_index")
    if include_interiors and furthest:
        raise ValueError("include_interiors is a min-distance option")
    maxd2 = (None if max_distance is None
             else _angle_chord2(max_distance))

    def finalize(edge_results: DataFrame) -> DataFrame:
        """Union interior hits (dist2=0, edge_id=-1) with the edge
        results and re-rank — at most one interior result per
        (point, polygon), like the reference's Result(s) set."""
        if not include_interiors:
            return edge_results
        polys = polygons
        if polys is None:
            if loops is None:
                raise ValueError("include_interiors needs loops or "
                                 "polygons")
            polys = {pid: [lp] for pid, lp in loops.items()}
        inter = (pip.polygon_pip_join(points, spark, polys,
                                      point_id=point_id)
                 .select(point_id,
                         F.col("polygon_id").alias("poly_id"),
                         F.lit(-1).cast("long").alias("edge_id"),
                         F.lit(0.0).alias("dist2")))
        allr = edge_results.select(point_id, "poly_id", "edge_id",
                                   "dist2").unionByName(inter)
        wf = Window.partitionBy(point_id).orderBy(
            F.col("dist2"), F.col("poly_id"), F.col("edge_id"))
        return (allr.withColumn("rank", F.row_number().over(wf))
                .where(F.col("rank") <= k)
                .select(point_id, "poly_id", "edge_id", "dist2",
                        F.col("rank").cast("int").alias("rank")))

    if n_edges is None:
        n_edges = (sum(lp.n for lp in loops.values())
                   if edge_index is None
                   else edge_index.select("poly_id", "edge_id")
                                  .distinct().count())
    if furthest:
        return closest_edge_join_brute(
            points, spark, loops, point_id, k, furthest=True,
            edge_index=edge_index,
            broadcast=n_edges <= broadcast_edge_limit)
    if n_edges <= brute_threshold:
        # the reference's brute-force-below-threshold regime
        # (s2closest_point_query_base.h:534-537): with a tiny edge dim
        # one broadcast sweep beats several ring-join rounds — the ring
        # plan only wins once the index itself is large
        return finalize(closest_edge_join_brute(
            points, spark, loops, point_id, k, edge_index=edge_index,
            max_dist2=maxd2))
    if level is None:
        level = pick_edge_level(n_edges, k)
    if edge_index is None:
        e, _ = _indexed_edges(spark, loops, min_level=level)
    else:
        e = edge_index
    # every edge-holding icell has level >= `level` -> one key each
    e = (e.withColumn("_pcell", s2f.prefix_col(F.col("icell"), level))
         .drop("icell")
         .dropDuplicates(["_pcell", "poly_id", "edge_id"]))
    if n_edges <= broadcast_edge_limit:
        e = F.broadcast(e)

    remaining = points.select(point_id, "cell_id", "x", "y", "z")
    done = []
    rings = initial_rings
    d2 = s2f.seg_chord2_col(
        F.col("x"), F.col("y"), F.col("z"),
        F.col("ax"), F.col("ay"), F.col("az"),
        F.col("bx"), F.col("by"), F.col("bz"))
    w = Window.partitionBy(point_id).orderBy(
        F.col("dist2"), F.col("poly_id"), F.col("edge_id"))
    for _ in range(max_rounds):
        cand = (remaining
                .select(point_id, "cell_id", "x", "y", "z",
                        F.explode(s2f.s2_disk_cells(
                            F.col("cell_id"), F.lit(level),
                            F.lit(rings))).alias("_rc"))
                .select(point_id, "x", "y", "z",
                        s2f.prefix_col(F.col("_rc"), level)
                        .alias("_pcell"))
                .join(e, "_pcell")
                # an edge can sit in several ring cells: dedup the
                # (point, edge) pair before ranking
                .dropDuplicates([point_id, "poly_id", "edge_id"]))
        cand = cand.withColumn("dist2", d2)
        if maxd2 is not None:
            # max_distance mode: rank only qualifying edges (the
            # "k closest up to a radius" contract)
            cand = cand.where(F.col("dist2") <= maxd2)
        topk = (cand.withColumn("rank", F.row_number().over(w))
                    .where(F.col("rank") <= k)
                    .localCheckpoint(eager=True))
        bound = _covered_chord2(level, rings, max_error)
        if maxd2 is not None and _covered_chord2(level, rings) >= maxd2:
            # the rings provably cover the whole max_distance ball:
            # every remaining point is done, however many results it
            # has (possibly zero)
            done.append(topk.select(
                point_id, "poly_id", "edge_id", "dist2",
                F.col("rank").cast("int").alias("rank")))
            remaining = None
            break
        stats = (topk.groupBy(point_id)
                     .agg(F.max("dist2").alias("_kth"),
                          F.count(F.lit(1)).alias("_n")))
        ok_ids = stats.where((F.col("_n") == k) & (F.col("_kth") < bound)) \
                      .select(point_id)
        done.append(topk.join(ok_ids, point_id, "left_semi")
                        .select(point_id, "poly_id", "edge_id", "dist2",
                                F.col("rank").cast("int").alias("rank")))
        remaining = (remaining.join(ok_ids, point_id, "left_anti")
                     .localCheckpoint(eager=True))
        if remaining.isEmpty():
            remaining = None
            break
        rings *= 2
    if remaining is not None:
        bf = closest_edge_join_brute(
            remaining.select(point_id, "x", "y", "z"), spark, loops,
            point_id, k, edge_index=edge_index,
            broadcast=n_edges <= broadcast_edge_limit,
            max_dist2=maxd2)
        done.append(bf)
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return finalize(out)


def closest_edge_join_brute(points: DataFrame, spark: SparkSession,
                            loops: dict[int, Loop] | None = None,
                            point_id: str = "point_id", k: int = 1,
                            furthest: bool = False,
                            edge_index: DataFrame | None = None,
                            broadcast: bool = True,
                            max_dist2: float | None = None) -> DataFrame:
    """Brute-force sweep (the reference's small-index regime); also
    the furthest-edge path.  With a prebuilt distributed edge_index
    the unique edge rows come from the frame (never the driver), and
    the broadcast hint is withheld for big indexes.  max_dist2 (chord²)
    filters BEFORE ranking — the k closest within the radius."""
    if edge_index is not None:
        edges = edge_index.drop("icell") \
            .dropDuplicates(["poly_id", "edge_id"])
    else:
        edges = _edge_table(spark, loops)
    if broadcast:
        edges = F.broadcast(edges)
    d2 = s2f.seg_chord2_col(
        F.col("x"), F.col("y"), F.col("z"),
        F.col("ax"), F.col("ay"), F.col("az"),
        F.col("bx"), F.col("by"), F.col("bz"))
    order = F.desc("dist2") if furthest else F.col("dist2")
    w = Window.partitionBy(point_id).orderBy(
        order, F.col("poly_id"), F.col("edge_id"))
    swept = (s2f.spread(points.select(point_id, "x", "y", "z"))
             .crossJoin(edges)
             .withColumn("dist2", d2))
    if max_dist2 is not None:
        swept = swept.where(F.col("dist2") <= max_dist2)
    return (swept
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(point_id, "poly_id", "edge_id", "dist2",
                    F.col("rank").cast("int").alias("rank")))


BROADCAST_TERM_LIMIT = 2_000_000


def crossing_edge_join(query_edges: DataFrame, spark: SparkSession,
                       loops: dict[int, Loop] | None = None,
                       edge_key: str = "qedge_id",
                       max_cells: int = 8,
                       broadcast_term_limit: int = BROADCAST_TERM_LIMIT,
                       edge_index: DataFrame | None = None,
                       crossing_type: str = "all") -> DataFrame:
    """All (query edge, indexed edge) pairs with CrossingSign >= 0
    (interior crossing or shared/touching vertex — the ALL mode of
    S2CrossingEdgeQuery, s2crossing_edge_query.h:17-24).
    crossing_type="interior" keeps only proper interior crossings
    (CrossingSign > 0 — the reference's CrossingType::INTERIOR).

    query_edges: (qedge_id, ax..az, bx..bz) unit endpoints.

    Plan: cover each query edge with <= max_cells cells (EdgeRegion
    coverer UDF), then match coverings against the edge-cell index by
    containment-either-way, expressed as two hash equi-joins:
      cand1: covering cell == an ancestor of icell   (c ⊇ icell)
      cand2: an ancestor of covering cell == icell   (icell ⊇ c)
    A crossing/touch point lies on both edges, hence in some index
    cell holding the indexed edge AND in some covering cell of the
    query edge; two overlapping cells always nest, so the union of the
    two joins is a complete candidate superset.  The robust
    CrossingSign kernel then decides pairs exactly.

    The index side is a driver-side `loops` dict OR a prebuilt
    distributed `edge_index` (pip.build_edge_index_distributed edges
    frame) for polygon tables too large for the driver.
    """
    if edge_index is None and loops is None:
        raise ValueError("need loops or edge_index")
    if edge_index is None:
        idx, edges_pd = _indexed_edges(spark, loops)
        from ..kernels import cellid as _ci
        if len(edges_pd):
            all_lv = _ci.level(edges_pd["icell"].to_numpy(np.int64))
            idx_levels = sorted({int(v) for v in np.unique(all_lv)})
            # per-ROW term count (the old unique-level sum undercounted
            # the ancestor table by the cells-per-level factor)
            n_terms = int(np.sum(all_lv.astype(np.int64) + 1))
        else:
            idx_levels, n_terms = [], 0
    else:
        idx = edge_index
        # tiny aggregates: distinct index levels + total ancestor terms
        stats = (idx.select(s2f.level_col(F.col("icell")).alias("_lv"))
                 .groupBy("_lv").count().collect())
        idx_levels = sorted(int(r["_lv"]) for r in stats)
        n_terms = int(sum((int(r["_lv"]) + 1) * int(r["count"])
                          for r in stats))
    ren = {"ax": "cx", "ay": "cy", "az": "cz",
           "bx": "dx", "by": "dy", "bz": "dz"}
    for old, new in ren.items():
        idx = idx.withColumnRenamed(old, new)
    # the ancestor-term table is |edge cells| x (level+1) rows; only
    # hint a broadcast while that fits comfortably in the driver —
    # above the limit the equi-join keys shuffle and AQE picks the
    # strategy (VERDICT r2 #3: an unconditional hint OOMs at scale)
    _bc = F.broadcast if n_terms <= broadcast_term_limit \
        else (lambda df: df)

    cov = s2f.make_edge_covering_udf(max_cells=max_cells,
                                     max_level=pip.MAX_INDEX_LEVEL)
    q = (query_edges
         .withColumn("_c", F.explode(cov("ax", "ay", "az",
                                         "bx", "by", "bz"))))

    # index-side ancestor terms at every level up to the icell's own
    anc = (idx.withColumn(
        "_lv", F.explode(F.sequence(F.lit(0),
                                    s2f.level_col(F.col("icell")))))
        .withColumn("_term", s2f.parent_dyn_col(F.col("icell"),
                                                F.col("_lv")))
        .drop("_lv", "icell"))
    cand1 = q.join(_bc(anc), q["_c"] == anc["_term"]) \
             .drop("_term", "_c")

    # query-side ancestor terms, only at levels the index contains
    lv_arr = F.array(*[F.lit(v) for v in idx_levels]) \
        if idx_levels else F.array(F.lit(0))
    qanc = (q.withColumn("_lv", F.explode(lv_arr))
            .where(F.col("_lv") <= s2f.level_col(F.col("_c")))
            .withColumn("_term", s2f.parent_dyn_col(F.col("_c"),
                                                    F.col("_lv")))
            .drop("_lv", "_c"))
    cand2 = qanc.join(_bc(idx),
                      qanc["_term"] == idx["icell"]) \
                .drop("_term", "icell")

    cand = (cand1.unionByName(cand2)
            .dropDuplicates([edge_key, "poly_id", "edge_id"]))
    sign = _crossing_sign_udf("ax", "ay", "az", "bx", "by", "bz",
                              "cx", "cy", "cz", "dx", "dy", "dz")
    min_sign = 1 if crossing_type == "interior" else 0
    return (cand.withColumn("crossing_sign", sign)
            .where(F.col("crossing_sign") >= min_sign)
            .select(edge_key, "poly_id", "edge_id",
                    F.col("crossing_sign").cast("int")
                    .alias("crossing_sign")))


def crossing_edge_join_brute(query_edges: DataFrame, spark: SparkSession,
                             loops: dict[int, Loop],
                             edge_key: str = "qedge_id") -> DataFrame:
    """Broadcast all-pairs sweep — small-N fallback / test oracle."""
    idx = F.broadcast(
        _edge_table(spark, loops)
        .withColumnRenamed("ax", "cx").withColumnRenamed("ay", "cy")
        .withColumnRenamed("az", "cz").withColumnRenamed("bx", "dx")
        .withColumnRenamed("by", "dy").withColumnRenamed("bz", "dz"))
    sign = _crossing_sign_udf("ax", "ay", "az", "bx", "by", "bz",
                              "cx", "cy", "cz", "dx", "dy", "dz")
    return (s2f.spread(query_edges).crossJoin(idx)
            .withColumn("crossing_sign", sign)
            .where(F.col("crossing_sign") >= 0)
            .select(edge_key, "poly_id", "edge_id",
                    F.col("crossing_sign").cast("int")
                    .alias("crossing_sign")))


def _icell_levels(edges_pd: pd.DataFrame) -> np.ndarray:
    from ..kernels import cellid
    return np.unique(cellid.level(
        edges_pd["icell"].to_numpy(np.int64)))


def track_edge_frame(events: DataFrame, entity: str,
                     order_cols: list[str]) -> DataFrame:
    """Distributed track-segment frame over per-entity polylines
    (poly_id = entity, edge_id = segment seq): each consecutive
    point pair becomes an edge row (poly_id, edge_id, ax..bz) —
    pure window functions, no driver-side geometry."""
    w = Window.partitionBy(entity).orderBy(*order_cols)
    return (events
            .withColumn("_bx", F.lead("x").over(w))
            .withColumn("_by", F.lead("y").over(w))
            .withColumn("_bz", F.lead("z").over(w))
            .withColumn("_seq",
                        F.row_number().over(w) - F.lit(1))
            .where(F.col("_bx").isNotNull())
            .select(F.col(entity).alias("poly_id"),
                    F.col("_seq").alias("edge_id"),
                    F.col("x").alias("ax"), F.col("y").alias("ay"),
                    F.col("z").alias("az"), F.col("_bx").alias("bx"),
                    F.col("_by").alias("by"),
                    F.col("_bz").alias("bz")))


def track_edge_index(events: DataFrame, entity: str,
                     order_cols: list[str], level: int) -> DataFrame:
    """track_edge_frame + per-edge cell covering at min_level=`level`
    — the (icell, poly_id, edge_id, ax..bz) contract of
    pip.build_edge_index_distributed, so closest_edge_join /
    crossing_edge_join consume it without driver-side geometry.
    NOTE: only worthwhile for spatially-LOCAL track edges; a
    globe-spanning edge intersects O(4^level) cells and the covering
    explodes — use track_project_join's brute regime for scattered
    tracks."""
    seg = track_edge_frame(events, entity, order_cols)
    cov = s2f.make_edge_covering_udf(min_level=level)
    return (seg.withColumn("_cells", cov(
        F.col("ax"), F.col("ay"), F.col("az"),
        F.col("bx"), F.col("by"), F.col("bz")))
        .select("poly_id", "edge_id", "ax", "ay", "az",
                "bx", "by", "bz",
                F.explode("_cells").alias("icell")))


def track_project_join(points: DataFrame, spark: SparkSession,
                       events: DataFrame, entity: str,
                       order_cols: list[str],
                       level: int | None = None,
                       point_id: str = "point_id",
                       n_edges: int | None = None,
                       broadcast_edge_limit: int = BROADCAST_EDGE_LIMIT
                       ) -> DataFrame:
    """S2Polyline::Project, distributed (s2polyline.cc:268-298):
    for each query point the globally nearest track segment — the
    winning track (poly_id = entity), its edge_id (next_vertex =
    edge_id + 1), and the chord^2 to it.

    Regime dispatch mirrors the reference's brute-below-threshold
    logic: with `level=None` (default) the sweep is the brute
    crossJoin over the DISTRIBUTED segment frame — the right plan
    when track edges are long/scattered (each would intersect
    O(4^level) index cells, so cell-covering costs more than it
    prunes); passing an explicit `level` opts into the ring-pruned
    closest_edge_join over a covered edge index for spatially-local
    tracks.  The projected POINT / UnInterpolate fraction kernels
    are pinned by tests/test_polyline_project.py — the join emits
    the discrete (segment, distance) outcome that is
    brute-SQL-checkable bit-exactly."""
    if level is None:
        seg = track_edge_frame(events, entity, order_cols)
        if n_edges is None:
            n_edges = seg.count()
        return closest_edge_join_brute(
            points, spark, point_id=point_id, k=1, edge_index=seg,
            broadcast=n_edges <= broadcast_edge_limit)
    idx = track_edge_index(events, entity, order_cols, level)
    return closest_edge_join(points, spark, point_id=point_id,
                             k=1, level=level, edge_index=idx,
                             n_edges=n_edges)


@pandas_udf(DoubleType())
def _edge_pair_min_chord2_udf(ax, ay, az, bx, by, bz,
                              cx, cy, cz, dx, dy, dz):
    from ..kernels import edges as ek
    a0 = np.column_stack([ax, ay, az]).astype(np.float64)
    a1 = np.column_stack([bx, by, bz]).astype(np.float64)
    b0 = np.column_stack([cx, cy, cz]).astype(np.float64)
    b1 = np.column_stack([dx, dy, dz]).astype(np.float64)
    return pd.Series(ek.edge_pair_min_chord2(a0, a1, b0, b1))


def edge_within_join(query_edges: DataFrame, spark: SparkSession,
                     loops: dict[int, Loop], radius_rad: float,
                     level: int | None = None,
                     query_cols: tuple[str, str] = ("poly_id",
                                                    "edge_id")
                     ) -> DataFrame:
    """All (query edge, indexed edge) pairs within `radius_rad` — the
    S2ClosestEdgeQuery edge-target regime (ShapeIndexTarget +
    max_distance, s2closest_edge_query.h:75-135, s2distance_target
    UpdateMinDistance over edges): geometry-to-geometry distance as a
    distributed join.

    query_edges: (query_cols..., ax..az, bx..bz) — e.g. the
    track_edge_frame contract.  `loops` is the indexed (broadcast)
    side; for a large indexed side feed track_edge_index's
    (icell, ...) frame to crossing/closest joins instead.

    Plan (no cross join): the indexed edges are covered driver-side
    at level L = disc_level(radius) and broadcast; each query edge's
    fixed-level covering cell is expanded by
    ceil(radius / kMinWidth(L)) neighbor rings (any point within
    `radius` of a covering cell lies within that many rings — the
    disc_join guarantee re-derived for edges: if dist(A,B) <= r then
    the level-L cells of the closest points p in A, q in B are
    covering members of each side and d(cell_p, cell_q) <= r).  The
    exact vectorized edge-pair chord² kernel
    (kernels.edges.edge_pair_min_chord2) filters candidates and a
    window ranks survivors per query edge."""
    import math

    from ..kernels import cellid as ck
    from ..kernels import edge_cover
    from .joins import disc_level

    r2 = _angle_chord2(radius_rad)
    lv = disc_level(radius_rad) if level is None else level
    rings = max(1, int(math.ceil(
        radius_rad / metrics.MIN_WIDTH.get_value(lv))))

    # indexed side: driver-side fixed-level covering, broadcast
    pa, pb, pid_l, eid_l = [], [], [], []
    for pid in sorted(loops):
        v = loops[pid].vertices
        for e in range(loops[pid].n):
            pa.append(v[e])
            pb.append(v[(e + 1) % loops[pid].n])
            pid_l.append(pid)
            eid_l.append(e)
    ta = np.asarray(pa, dtype=np.float64)
    tb = np.asarray(pb, dtype=np.float64)
    eidx, cells = edge_cover.edge_coverings_batch(ta, tb, level=lv)
    idx_pdf = pd.DataFrame({
        "icell": ck.as_i64(cells),
        "t_poly": np.asarray(pid_l, dtype=np.int64)[eidx],
        "t_edge": np.asarray(eid_l, dtype=np.int64)[eidx],
        "cx": ta[eidx, 0], "cy": ta[eidx, 1], "cz": ta[eidx, 2],
        "dx": tb[eidx, 0], "dy": tb[eidx, 1], "dz": tb[eidx, 2],
    })
    index_df = F.broadcast(spark.createDataFrame(idx_pdf))

    qp, qe = query_cols
    cov = s2f.make_edge_ring_covering_udf(lv, rings)
    cand_cells = (
        query_edges
        .withColumn("_cov", cov(F.col("ax"), F.col("ay"), F.col("az"),
                                F.col("bx"), F.col("by"), F.col("bz")))
        .withColumn("icell", F.explode("_cov"))
        .drop("_cov"))
    pairs = (cand_cells.join(index_df, "icell")
             .dropDuplicates([qp, qe, "t_poly", "t_edge"]))
    hits = (pairs
            .withColumn("dist2", _edge_pair_min_chord2_udf(
                F.col("ax"), F.col("ay"), F.col("az"),
                F.col("bx"), F.col("by"), F.col("bz"),
                F.col("cx"), F.col("cy"), F.col("cz"),
                F.col("dx"), F.col("dy"), F.col("dz")))
            .where(F.col("dist2") <= F.lit(r2)))
    w = Window.partitionBy(qp, qe).orderBy("dist2", "t_poly",
                                           "t_edge")
    return (hits.withColumn("rank", F.row_number().over(w))
            .select(qp, qe, "t_poly", "t_edge", "dist2", "rank"))
