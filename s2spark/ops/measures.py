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


BRUTE_HAUSDORFF_THRESHOLD = 100_000


def hausdorff2(a: DataFrame, b: DataFrame, a_id: str,
               b_id: str | None = None, n_b: int | None = None,
               brute_threshold: int = BRUTE_HAUSDORFF_THRESHOLD
               ) -> DataFrame:
    """Directed Hausdorff² from A to B with SIZE DISPATCH (the
    brute-below-threshold regime of ops/edges.py:127): when B fits a
    broadcast (n_b <= brute_threshold) the inner min is one broadcast
    sweep; above it — and when b_id names B's key so rows are
    identifiable — the k=1 expanding-ring kNN join takes over (both
    frames then need (id, cell_id, x, y, z)).  The two plans are
    bit-identical: min/max of doubles has no accumulation order."""
    if n_b is None:
        n_b = b.count()
    if b_id is not None and n_b > brute_threshold:
        return hausdorff2_knn(a, b, a_id, b_id, n_b=n_b)
    bb = F.broadcast(b.select(F.col("x").alias("_bx"),
                              F.col("y").alias("_by"),
                              F.col("z").alias("_bz")))
    d2 = s2f.chord2_col(F.col("x"), F.col("y"), F.col("z"),
                        F.col("_bx"), F.col("_by"), F.col("_bz"))
    per_a = (a.crossJoin(bb)
             .groupBy(a_id)
             .agg(F.min(d2).alias("_min_d2")))
    return per_a.agg(F.max("_min_d2").alias("hausdorff2"))


def hausdorff2_knn(a: DataFrame, b: DataFrame, a_id: str, b_id: str,
                   level: int | None = None,
                   n_b: int | None = None) -> DataFrame:
    """Directed Hausdorff² when BOTH sides are large: the inner min is
    a k=1 expanding-ring kNN join over the cell index (ops/knn.py) —
    no broadcast of either side, shuffles keyed on ring prefixes.
    a/b: (id, cell_id, x, y, z).  Bit-identical to the broadcast plan
    (the k=1 minimum is the same double)."""
    from . import knn as knn_ops
    if level is None:
        if n_b is None:
            from .. import dataset  # noqa: F401 — stats preferred
            n_b = b.count()
        level = knn_ops.pick_level(n_b, 1)
    nn = knn_ops.knn_join(b, a, 1, query_id=a_id, point_id=b_id,
                          level=level)
    return nn.agg(F.max("dist2").alias("hausdorff2"))


def chain_quantile(events: DataFrame, entity: str,
                   order_cols: list[str], num: int, den: int,
                   seq_name: str = "q_seq") -> DataFrame:
    """S2ChainInterpolationQuery analogue generalized to an arbitrary
    fraction num/den (Interpolate/GetSuffix query-by-fraction,
    s2chain_interpolation_query.h:16-26, python surface
    s2_common.i:862-870): running chord² length along each entity's
    ordered chain, then the first vertex at/after the num/den point.

    Determinism: segment lengths are quantized to integer units
    (floor(dist2 * 1e15)) before the running sum — float window
    aggregation orders differ across engines (Spark folds the frame
    sequentially, DuckDB uses a pairwise segment tree), but integer
    sums are order-free and exact; the fraction test is the integer
    cross-multiplication cum*den >= total*num.
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
    hit = c.where(F.col("cum") * den >= F.col("total") * num)
    first = (hit.groupBy(entity)
             .agg(F.min("seq").alias(seq_name)))
    return (hit.join(first, [entity])
            .where(F.col("seq") == F.col(seq_name))
            .select(entity, F.col(seq_name).cast("int").alias(seq_name),
                    F.col("cum").alias("cum_units"),
                    F.col("total").alias("total_units")))


def chain_midpoint(events: DataFrame, entity: str, order_cols: list[str]
                   ) -> DataFrame:
    """The 50% point of each chain (chain_quantile(1, 2))."""
    return chain_quantile(events, entity, order_cols, 1, 2,
                          seq_name="mid_seq")


def chain_interpolate_point(events: DataFrame, entity: str,
                            order_cols: list[str], fraction: float
                            ) -> DataFrame:
    """True point interpolation at `fraction` of each chain's angular
    length (S2Polyline::Interpolate semantics): slerp within the
    segment where the target falls.  Trig runs in an Arrow batch per
    entity; verified by geometric property tests (not the SQL oracle —
    libm trig is not guaranteed bit-identical across engines)."""
    import numpy as np
    import pandas as pd

    cols = [entity, *order_cols, "x", "y", "z"]
    schema = f"{entity} long, ix double, iy double, iz double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[entity].iloc[0]
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        v = pdf[["x", "y", "z"]].to_numpy(np.float64)
        if len(v) == 1:
            p = v[0]
            return pd.DataFrame([(g, p[0], p[1], p[2])],
                                columns=[entity, "ix", "iy", "iz"])
        d = np.einsum("ij,ij->i", v[:-1], v[1:]).clip(-1.0, 1.0)
        ang = np.arccos(d)
        cum = np.concatenate([[0.0], np.cumsum(ang)])
        target = fraction * cum[-1]
        k = int(np.searchsorted(cum, target, side="right") - 1)
        k = min(max(k, 0), len(ang) - 1)
        t_ang = target - cum[k]
        a, b = v[k], v[k + 1]
        th = ang[k]
        if th < 1e-15:
            p = a
        else:
            p = (np.sin(th - t_ang) * a + np.sin(t_ang) * b) / np.sin(th)
            p = p / np.linalg.norm(p)
        return pd.DataFrame([(g, p[0], p[1], p[2])],
                            columns=[entity, "ix", "iy", "iz"])

    return (events.select(*cols)
            .groupBy(entity).applyInPandas(run, schema))


def simplify_track(events: DataFrame, entity: str,
                   order_cols: list[str], tolerance_rad: float
                   ) -> DataFrame:
    """Per-entity polyline simplification — the reference's
    SubsampleVertices tangent-wedge scan (s2polyline.cc:560-655) run
    one applyInPandas group per entity: (entity, kept_seq) rows where
    kept_seq is the 0-based position of a kept vertex in the entity's
    `order_cols` order.  Track compression for trajectory tables: the
    entity dimension is the parallel axis."""
    import pandas as pd

    schema = f"{entity} long, kept_seq int"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from ..kernels.simplify import subsample_vertices
        g = pdf[entity].iloc[0]
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        v = pdf[["x", "y", "z"]].to_numpy(np.float64)
        kept = subsample_vertices(v, tolerance_rad)
        return pd.DataFrame({entity: g, "kept_seq": kept})

    return (events.select(entity, *order_cols, "x", "y", "z")
            .groupBy(entity).applyInPandas(run, schema))


def track_alignment(events: DataFrame, entity: str,
                    order_cols: list[str],
                    pairs: list[tuple[int, int]]) -> DataFrame:
    """Pairwise trajectory similarity by exact DTW alignment cost
    (S2PolylineAlignment, s2polyline_alignment.h:16-27): for each
    requested (id_a, id_b) pair, the min-cost monotone warp between
    the two entities' ordered chains.  Chains are collected per pair
    via a double-sided join, DP runs in one Arrow batch per pair."""
    import pandas as pd
    from pyspark.sql import functions as F

    spark = events.sparkSession
    pairs_df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    pts = (events.select(F.col(entity).alias("_e"), *order_cols,
                         "x", "y", "z"))
    a = pairs_df.join(pts, pairs_df["id_a"] == pts["_e"]) \
        .select("id_a", "id_b", *order_cols,
                F.col("x").alias("ax"), F.col("y").alias("ay"),
                F.col("z").alias("az"),
                F.lit(0).alias("_side"))
    b = pairs_df.join(pts, pairs_df["id_b"] == pts["_e"]) \
        .select("id_a", "id_b", *order_cols,
                F.col("x").alias("ax"), F.col("y").alias("ay"),
                F.col("z").alias("az"),
                F.lit(1).alias("_side"))
    both = a.unionByName(b)
    schema = "id_a long, id_b long, dtw_cost double"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from ..kernels.simplify import dtw_cost
        ia, ib = int(key[0]), int(key[1])
        va = pdf[pdf["_side"] == 0].sort_values(order_cols)[
            ["ax", "ay", "az"]].to_numpy(np.float64)
        vb = pdf[pdf["_side"] == 1].sort_values(order_cols)[
            ["ax", "ay", "az"]].to_numpy(np.float64)
        return pd.DataFrame([(ia, ib, dtw_cost(va, vb))],
                            columns=["id_a", "id_b", "dtw_cost"])

    return both.groupBy("id_a", "id_b").applyInPandas(run, schema)


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


def track_alignment_approx(events: DataFrame, entity: str,
                           order_cols: list[str],
                           pairs: list[tuple[int, int]],
                           radius: int | None = None) -> DataFrame:
    """Windowed-approximate DTW (FastDTW — GetApproxVertexAlignment,
    s2polyline_alignment.h:140-160, kernels/alignment.py) per track
    pair, alongside the exact cost: (id_a, id_b, approx_cost,
    exact_cost, path_len).  The approximation is deterministic, so
    the rows are oracle-exact; approx >= exact is asserted by the
    kernel test battery.  Same pair-parallel shape as
    track_alignment."""
    import pandas as pd
    from pyspark.sql import functions as F

    spark = events.sparkSession
    pairs_df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    pts = (events.select(F.col(entity).alias("_e"), *order_cols,
                         "x", "y", "z"))
    a = pairs_df.join(pts, pairs_df["id_a"] == pts["_e"]) \
        .select("id_a", "id_b", *order_cols,
                F.col("x").alias("ax"), F.col("y").alias("ay"),
                F.col("z").alias("az"), F.lit(0).alias("_side"))
    b = pairs_df.join(pts, pairs_df["id_b"] == pts["_e"]) \
        .select("id_a", "id_b", *order_cols,
                F.col("x").alias("ax"), F.col("y").alias("ay"),
                F.col("z").alias("az"), F.lit(1).alias("_side"))
    both = a.unionByName(b)
    schema = ("id_a long, id_b long, approx_cost double, "
              "exact_cost double, path_len int")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from ..kernels import alignment as al
        ia, ib = int(key[0]), int(key[1])
        va = pdf[pdf["_side"] == 0].sort_values(order_cols)[
            ["ax", "ay", "az"]].to_numpy(np.float64)
        vb = pdf[pdf["_side"] == 1].sort_values(order_cols)[
            ["ax", "ay", "az"]].to_numpy(np.float64)
        ac, path = al.approx_vertex_alignment(va, vb, radius)
        ec = al.exact_vertex_alignment_cost(va, vb)
        return pd.DataFrame(
            [(ia, ib, ac, ec, len(path))],
            columns=["id_a", "id_b", "approx_cost", "exact_cost",
                     "path_len"])

    return both.groupBy("id_a", "id_b").applyInPandas(run, schema)
