"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Every spatial query runs over a *geotagged view* of the driver tables:
(cell_id, x, y, z) derived deterministically from integer keys with
arithmetic that is bit-exact across Spark SQL / NumPy / DuckDB
(s2spark/sources/geo.py) — so even double-valued distances and kNN
orderings value-hash-match the oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s2spark import dataset
from s2spark import functions as s2f
from s2spark.ops import joins, knn, tiles
from s2spark.sources import geo

DISC_RADIUS_RAD = 0.05          # ~318 km query discs
KNN_K = 5
ROLLUP_LEVELS = [4, 8, 12]
EQUI_LEVEL = 4


# ---------------------------------------------------------------------------
# oracle SQL fragments (DuckDB dialect, shared by several queries)
# ---------------------------------------------------------------------------

def _geo_view(table: str, key_col: str, with_xyz: bool = True) -> str:
    """Derived-table SQL: (key_col, cell[, x, y, z]) for a driver table.

    Compact CTE-chain form (geo.geo_table_sql) — bit-exact with the
    Spark columns from s2spark.dataset.geotag."""
    return geo.geo_table_sql(table, dataset.geo_key_sql(key_col, table),
                             [key_col], with_xyz=with_xyz)


_D2 = ("(qx-px)*(qx-px) + (qy-py)*(qy-py) + (qz-pz)*(qz-pz)")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir)
    return tiles.tile_counts(ev, 8).select("tile", F.col("n"))


def q_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir)
    return (tiles.tile_rollup(ev, ROLLUP_LEVELS)
            .select(F.col("level").cast("int").alias("level"), "tile",
                    F.col("n").cast("long").alias("n")))


def q_cell_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir).select(
        "event_id", "cell_id")
    cu = dataset.geotagged_customers(spark, sf_dir).select(
        "c_custkey", "cell_id")
    pairs = joins.cell_equi_join(ev, cu, EQUI_LEVEL)
    return pairs.select("event_id", "c_custkey")


def q_containment_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir).select(
        "event_id", "cell_id")
    cu = dataset.geotagged_customers(spark, sf_dir).select(
        "c_custkey", s2f.parent_col(F.col("cell_id"), 5).alias("rcell"))
    j = joins.containment_join(ev, cu)
    return (j.groupBy("c_custkey")
             .agg(F.count(F.lit(1)).alias("n_events")))


def q_disc_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "cell_id", "x", "y", "z")
    cu = dataset.geotagged_customers(spark, sf_dir) \
        .where(F.col("c_custkey") % 7 == 0) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    return joins.disc_join(ev, cu, DISC_RADIUS_RAD,
                           query_id="c_custkey", point_id="event_id")


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "cell_id", "x", "y", "z")
    cu = dataset.geotagged_customers(spark, sf_dir) \
        .where(F.col("c_custkey") % 10 == 0) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    n = ev.count()
    level = knn.pick_level(n, KNN_K)
    out = knn.knn_join(ev, cu, KNN_K, query_id="c_custkey",
                       point_id="event_id", level=level)
    return out.select("c_custkey", "event_id", "dist2",
                      F.col("rank").cast("int").alias("rank"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: disc join (tolerant spatial join) at sf0.001."""
    return q_disc_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_counts": q_tile_counts,
        "tile_rollup": q_tile_rollup,
        "cell_equi_join": q_cell_equi_join,
        "containment_range_join": q_containment_range_join,
        "disc_join": q_disc_join,
        "knn": q_knn,
    }


def oracle_sql() -> dict[str, str]:
    import math
    r2 = (2.0 * math.sin(0.5 * DISC_RADIUS_RAD)) ** 2

    rollup_parts = " UNION ALL ".join(
        f"SELECT {lv} AS level, {geo.parent_sql('cell', lv)} AS tile, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 2"
        for lv in ROLLUP_LEVELS)

    ev_cells = _geo_view("events", "event_id", with_xyz=False)
    cu_cells = _geo_view("customer", "c_custkey", with_xyz=False)
    ev_geo = _geo_view("events", "event_id")
    cu_geo = _geo_view("customer", "c_custkey")

    return {
        "tile_counts": (
            f"SELECT {geo.parent_sql('cell', 8)} AS tile, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM {ev_cells} GROUP BY 1"),
        "tile_rollup": (
            f"WITH ev AS (SELECT cell FROM {ev_cells}) "
            f"{rollup_parts}"),
        "cell_equi_join": (
            f"SELECT e.event_id, c.c_custkey "
            f"FROM (SELECT event_id, "
            f"{geo.parent_sql('cell', EQUI_LEVEL)} AS jc FROM {ev_cells}) e "
            f"JOIN (SELECT c_custkey, "
            f"{geo.parent_sql('cell', EQUI_LEVEL)} AS jc FROM {cu_cells}) c "
            f"USING (jc)"),
        "containment_range_join": (
            f"WITH e AS (SELECT event_id, cell FROM {ev_cells}), "
            f"c AS (SELECT c_custkey, {geo.parent_sql('cell', 5)} AS rc "
            f"FROM {cu_cells}), "
            f"r AS (SELECT c_custkey, rc, rc - ((rc & -rc) - 1) AS lo, "
            f"rc + ((rc & -rc) - 1) AS hi FROM c) "
            f"SELECT r.c_custkey, CAST(COUNT(*) AS BIGINT) AS n_events "
            f"FROM r JOIN e ON e.cell BETWEEN r.lo AND r.hi "
            f"GROUP BY 1"),
        "disc_join": (
            f"WITH q AS (SELECT c_custkey, x AS qx, y AS qy, z AS qz "
            f"FROM {cu_geo} WHERE c_custkey % 7 = 0), "
            f"p AS (SELECT event_id, x AS px, y AS py, z AS pz "
            f"FROM {ev_geo}) "
            f"SELECT q.c_custkey, p.event_id, {_D2} AS dist2 "
            f"FROM q, p WHERE {_D2} <= {r2!r}"),
        "knn": (
            f"WITH q AS (SELECT c_custkey, x AS qx, y AS qy, z AS qz "
            f"FROM {cu_geo} WHERE c_custkey % 10 = 0), "
            f"p AS (SELECT event_id, x AS px, y AS py, z AS pz "
            f"FROM {ev_geo}), "
            f"d AS (SELECT q.c_custkey, p.event_id, {_D2} AS dist2 "
            f"FROM q, p), "
            f"r AS (SELECT c_custkey, event_id, dist2, "
            f"CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey "
            f"ORDER BY dist2, event_id) AS INTEGER) AS rank FROM d) "
            f"SELECT * FROM r WHERE rank <= {KNN_K}"),
    }
