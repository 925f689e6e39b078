"""Snap-to-cell-center operators — the S2CellIdSnapFunction slice of
S2Builder (s2builder.h:30-61 snap functions;
S2Polyline::InitToSnapped, s2polyline.cc:456-500 semantics): vertices
snap to the center of their level-L cell, consecutive duplicates
collapse.  Full snap-rounding (edge splitting at near-crossings /
site re-routing) remains out of scope — documented in SURVEY §2.10.

snap_track is pure relational bit math + one window (parent cell,
LAG dedup, re-rank), so the driver oracle re-derives it exactly in
SQL; the center decode rides as optional Arrow-UDF columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import functions as s2f


def snap_points(df: DataFrame, level: int,
                cell_col: str = "cell_id",
                with_xyz: bool = False) -> DataFrame:
    """Append snap_cell (level-L ancestor id) and optionally the
    snapped center coordinates (sx, sy, sz)."""
    out = df.withColumn("snap_cell",
                        s2f.parent_col(F.col(cell_col), level))
    if with_xyz:
        out = (out.withColumn("_c", s2f.s2_cell_center_xyz(
            F.col("snap_cell")))
            .withColumn("sx", F.col("_c.x"))
            .withColumn("sy", F.col("_c.y"))
            .withColumn("sz", F.col("_c.z"))
            .drop("_c"))
    return out


def snap_track(events: DataFrame, entity: str, order_cols: list[str],
               level: int, cell_col: str = "cell_id",
               with_xyz: bool = False) -> DataFrame:
    """Per-entity snapped polyline: vertices to level-L cell centers,
    consecutive duplicates collapsed, re-ranked: (entity, seq_out,
    snap_cell[, sx, sy, sz])."""
    w = Window.partitionBy(entity).orderBy(*order_cols)
    snapped = (events
               .withColumn("_sc", s2f.parent_col(F.col(cell_col),
                                                 level))
               .withColumn("_prev", F.lag("_sc").over(w))
               .where(F.col("_prev").isNull()
                      | (F.col("_prev") != F.col("_sc"))))
    w2 = Window.partitionBy(entity).orderBy(*order_cols)
    out = (snapped
           .withColumn("seq_out", F.row_number().over(w2))
           .select(entity, F.col("seq_out").cast("int").alias("seq_out"),
                   F.col("_sc").alias("snap_cell")))
    if with_xyz:
        out = (out.withColumn("_c", s2f.s2_cell_center_xyz(
            F.col("snap_cell")))
            .withColumn("sx", F.col("_c.x"))
            .withColumn("sy", F.col("_c.y"))
            .withColumn("sz", F.col("_c.z"))
            .drop("_c"))
    return out


def snap_simplify_track(events: DataFrame, entity: str,
                        order_cols: list[str],
                        simplify_radius: float,
                        leaf_level: int = 30) -> DataFrame:
    """S2Builder simplify_edge_chains over per-entity tracks
    (s2builder.h:393-425; kernels/chain_simplify.py): each entity's
    polyline is snap-rounded with greedy snap-radius site selection
    and its interior chains merged into maximal edges staying within
    `simplify_radius` of the input (targeted-disc guarantee) while
    avoiding foreign sites — the tool for shrinking 100 TB of track
    geometry without breaking containment.  One applyInPandas group
    per entity (the parallel axis); output vertices as level-
    `leaf_level` cell ids (integers — oracle-safe):
    (entity, line_idx, seq, site_cell).

    Algorithm parity is pinned against the reference's
    SimplifyEdgeChains fixtures in tests/test_builder_reference.py."""
    import numpy as np
    import pandas as pd

    from ..kernels import builder as bld
    from ..kernels import cellid as ci
    schema = (f"{entity} long, line_idx int, seq int, "
              f"site_cell long")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ent = int(key[0])
        pdf = pdf.sort_values(order_cols)
        v = pdf[["x", "y", "z"]].to_numpy(np.float64)
        rows = []
        for li, chain in enumerate(bld.simplify_polylines(
                [v], simplify_radius=simplify_radius)):
            cells = ci.parent(ci.from_xyz(chain[:, 0], chain[:, 1],
                                          chain[:, 2]), leaf_level)
            rows.extend((ent, li, s, int(c))
                        for s, c in enumerate(ci.as_i64(cells)))
        return pd.DataFrame(rows, columns=[entity, "line_idx", "seq",
                                           "site_cell"])

    return events.groupBy(entity).applyInPandas(run, schema)
