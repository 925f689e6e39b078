"""Distributed point-in-polygon join (SURVEY.md §3.2, north star).

Pipeline:

1. `build_edge_index` — the MutableS2ShapeIndex analogue, built once
   per polygon set (driver-side; polygons are the small dimension):
   recursive sphere subdivision emitting disjoint index cells per
   loop, each holding <= max_edges_per_cell edges
   (mutable_s2shape_index.cc:75-76 default 10) plus a
   `contains_center` bit (s2shape_index.h:65-129).  Interior cells
   carry the bit with zero edges; exterior subtrees are pruned.

2. `pip_join` — points ⋈ index cells (per-level Hilbert-prefix hash
   joins — index cells are disjoint per loop, so each point matches
   <= 1 cell per loop), then the crossing-parity test: segment
   cell-center -> point against ONLY the cell's edges.  Both endpoints
   lie in the convex cell, so edges not assigned to the cell cannot
   cross the segment — the same locality argument the reference uses
   (s2loop.cc:602-621).  inside = contains_center XOR parity(#edge
   crossings), reduced with a map-side-combinable SUM % 2
   (SURVEY.md §2.4).

Crossing signs run in an Arrow-batched kernel (4 robust orientation
tests per pair with triage->exact escalation, s2predicates.cc:263-295)
— the only Python in the plan, applied post-join to the bounded
candidate set.

Scale: the index table is O(edges); broadcast when small, else it
shuffles on the same prefix key as the points.  Multi-loop polygons
reduce with a second parity aggregation over loops (even-odd rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import IntegerType

from .. import functions as s2f
from ..kernels import cellid
from ..kernels.loops import Loop
from ..kernels.region import Cell
from . import joins

MAX_EDGES_PER_CELL = 10
MAX_INDEX_LEVEL = 12


def _index_loop_rows(poly_id: int, loop: Loop,
                     max_edges_per_cell: int = MAX_EDGES_PER_CELL,
                     max_level: int = MAX_INDEX_LEVEL,
                     min_level: int = 0,
                     need_centers: bool = True) -> tuple[list, list]:
    """One loop's index rows (the shared recursion behind both the
    driver-side and the distributed builds).  need_centers=False skips
    the per-cell center-containment parity test (an O(loop.n) scan per
    cell) for callers that only consume edge_rows — e.g. validation's
    candidate-pair pruning."""
    cell_rows, edge_rows = [], []

    def visit(cid: int, edge_ids: np.ndarray):
        cell = Cell(cid)
        hits = edge_ids[loop.edge_intersects_cell(cell, edge_ids)] \
            if edge_ids.size else edge_ids
        if hits.size == 0:
            if need_centers:
                center = cell.get_center()
                if loop.contains_point(center):
                    # interior cell: bit only, prune recursion
                    cell_rows.append((cid, poly_id, True, *center))
            return
        if (hits.size <= max_edges_per_cell
                and cell.level >= min_level) or cell.level >= max_level:
            if need_centers:
                center = cell.get_center()
                center_in = loop.contains_point(center)
            else:
                center = (0.0, 0.0, 0.0)
                center_in = False
            cell_rows.append((cid, poly_id, bool(center_in), *center))
            v = loop.vertices
            nxt = np.roll(np.arange(loop.n), -1)
            for e in hits:
                a = v[e]
                b = v[nxt[e]]
                edge_rows.append((cid, poly_id, int(e), *a, *b))
            return
        children = cellid.child(np.full(4, cid, dtype=np.uint64),
                                np.arange(4))
        for ch in children:
            visit(int(ch), hits)

    for face in range(6):
        visit(int(cellid.from_face(np.array([face]))[0]),
              np.arange(loop.n))
    return cell_rows, edge_rows


def build_edge_index(loops: dict[int, Loop],
                     max_edges_per_cell: int = MAX_EDGES_PER_CELL,
                     max_level: int = MAX_INDEX_LEVEL,
                     min_level: int = 0
                     ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """-> (cells_df, edges_df).

    cells_df: icell, poly_id, contains_center, ccx, ccy, ccz
    edges_df: icell, poly_id, edge_id, ax..az, bx..bz

    min_level forces edge-holding cells down to at least that level so
    ring/prefix joins can key every edge at one fixed level (interior
    bit-only cells still stop early — they carry no edges).

    Driver-side build for small polygon dims; million-polygon tables
    go through `build_edge_index_distributed` (identical rows, one
    applyInPandas group per polygon).
    """
    cell_rows, edge_rows = [], []
    for poly_id, loop in loops.items():
        cr, er = _index_loop_rows(poly_id, loop, max_edges_per_cell,
                                  max_level, min_level)
        cell_rows += cr
        edge_rows += er

    cells = pd.DataFrame(cell_rows, columns=[
        "icell", "poly_id", "contains_center", "ccx", "ccy", "ccz"])
    edges = pd.DataFrame(edge_rows, columns=[
        "icell", "poly_id", "edge_id",
        "ax", "ay", "az", "bx", "by", "bz"])
    cells["icell"] = cells["icell"].astype(np.uint64).astype(np.int64)
    if len(edges):
        edges["icell"] = edges["icell"].astype(np.uint64).astype(np.int64)
    return cells, edges


def loops_to_df(spark: SparkSession, loops: dict[int, Loop]) -> DataFrame:
    """(poly_id, vertices) frame — vertices flattened [x0,y0,z0,x1,..]
    (the storage shape a polygon table would have)."""
    rows = [(pid, [float(v) for v in loop.vertices.ravel()])
            for pid, loop in loops.items()]
    return spark.createDataFrame(rows, "poly_id long, "
                                       "vertices array<double>")


INDEX_ROW_SCHEMA = ("rtype int, icell long, poly_id long, "
                    "contains_center boolean, ccx double, ccy double, "
                    "ccz double, edge_id long, ax double, ay double, "
                    "az double, bx double, by double, bz double")


def build_edge_index_distributed(loops_df: DataFrame,
                                 max_edges_per_cell: int = MAX_EDGES_PER_CELL,
                                 max_level: int = MAX_INDEX_LEVEL,
                                 min_level: int = 0
                                 ) -> tuple[DataFrame, DataFrame]:
    """Distributed index build: one applyInPandas group per polygon
    runs the identical recursion, so million-polygon tables build
    their MutableS2ShapeIndex analogue in parallel across executors
    (the driver never materializes the geometry).

    loops_df: (poly_id, vertices array<double> flattened xyz).
    Returns (cells, edges) frames with the same columns as
    build_edge_index; materialized once (localCheckpoint) so the two
    outputs don't re-run the recursion.
    """
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid, verts in zip(pdf["poly_id"].to_numpy(),
                              pdf["vertices"].to_numpy()):
            pid = int(pid)
            loop = Loop(np.asarray(verts,
                                   dtype=np.float64).reshape(-1, 3))
            cr, er = _index_loop_rows(pid, loop, max_edges_per_cell,
                                      max_level, min_level)
            for (cid, p, cc, x, y, z) in cr:
                out.append((0, np.uint64(cid).astype(np.int64), p,
                            bool(cc), x, y, z, -1,
                            0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
            for (cid, p, e, ax, ay, az, bx, by, bz) in er:
                out.append((1, np.uint64(cid).astype(np.int64), p,
                            False, 0.0, 0.0, 0.0, e,
                            ax, ay, az, bx, by, bz))
        return pd.DataFrame(out, columns=[
            "rtype", "icell", "poly_id", "contains_center",
            "ccx", "ccy", "ccz", "edge_id",
            "ax", "ay", "az", "bx", "by", "bz"])

    combined = (loops_df.groupBy("poly_id")
                .applyInPandas(run, INDEX_ROW_SCHEMA)
                .localCheckpoint(eager=True))
    cells = combined.where(F.col("rtype") == 0).select(
        "icell", "poly_id", "contains_center", "ccx", "ccy", "ccz")
    edges = combined.where(F.col("rtype") == 1).select(
        "icell", "poly_id", "edge_id",
        "ax", "ay", "az", "bx", "by", "bz")
    return cells, edges


@pandas_udf(IntegerType())
def _crossing_udf(px, py, pz, ccx, ccy, ccz, ax, ay, az, bx, by, bz):
    from ..kernels import predicates
    a = np.column_stack([ccx.to_numpy(np.float64),
                         ccy.to_numpy(np.float64),
                         ccz.to_numpy(np.float64)])
    b = np.column_stack([px.to_numpy(np.float64),
                         py.to_numpy(np.float64),
                         pz.to_numpy(np.float64)])
    c = np.column_stack([ax.to_numpy(np.float64),
                         ay.to_numpy(np.float64),
                         az.to_numpy(np.float64)])
    d = np.column_stack([bx.to_numpy(np.float64),
                         by.to_numpy(np.float64),
                         bz.to_numpy(np.float64)])
    return pd.Series(
        predicates.edge_or_vertex_crossing(a, b, c, d).astype(np.int32))


def pip_join(points: DataFrame, spark: SparkSession,
             loops: dict[int, Loop] | None, point_id: str = "point_id",
             broadcast_index: bool = True,
             index: tuple[DataFrame, DataFrame] | None = None
             ) -> DataFrame:
    """(point_id, poly_id) for every point inside a loop.

    points: (point_id, cell_id, x, y, z).

    index: optional prebuilt (cells, edges) Spark frames — pass
    `build_edge_index_distributed(loops_to_df(...))` for polygon
    tables too large to index on the driver; with
    broadcast_index=False the candidate join shuffles on the same
    prefix keys instead (both sides scale in |polygons|).
    """
    if index is not None:
        cells, edges = index
    else:
        cells_pd, edges_pd = build_edge_index(loops)
        cells = spark.createDataFrame(cells_pd)
        edges = spark.createDataFrame(edges_pd) if len(edges_pd) else None
    if broadcast_index:
        cells = F.broadcast(cells)
        edges = F.broadcast(edges) if edges is not None else None

    # containment_join drops its join cell column; carry a copy so the
    # edge lookup can key on the exact (index cell, polygon) pair
    cand = joins.containment_join(
        points.select(point_id, "cell_id", "x", "y", "z"),
        cells.withColumn("icell_key", F.col("icell")),
        region_cell="icell")

    if edges is not None:
        e = edges.withColumnRenamed("icell", "icell_key")
        j = cand.join(e, ["icell_key", "poly_id"], "left")
    else:
        j = cand.withColumn("ax", F.lit(None).cast("double"))
        for c in ("ay", "az", "bx", "by", "bz"):
            j = j.withColumn(c, F.lit(None).cast("double"))

    cross = F.when(
        F.col("ax").isNotNull(),
        _crossing_udf("x", "y", "z", "ccx", "ccy", "ccz",
                      "ax", "ay", "az", "bx", "by", "bz")).otherwise(0)
    per_pair = (j.withColumn("_cross", cross)
                .groupBy(point_id, "poly_id")
                .agg(F.first("contains_center").alias("_cc"),
                     F.sum("_cross").alias("_crossings")))
    inside = (F.col("_cc").cast("int")
              + F.col("_crossings")) % 2 == 1
    return per_pair.where(inside).select(point_id, "poly_id")


def polygon_pip_join(points: DataFrame, spark: SparkSession,
                     polygons: dict[int, list[Loop]],
                     point_id: str = "point_id") -> DataFrame:
    """(point_id, polygon_id) for points inside multi-loop polygons
    with holes — even-odd rule over the per-loop verdicts
    (s2polygon.h:116-259: interior = inside an odd number of nested
    loops).  One flat pip_join over all loops, then a parity
    aggregation keyed back to the owning polygon."""
    flat: dict[int, Loop] = {}
    owner_rows = []
    next_id = 0
    for pgid, loops_list in polygons.items():
        for lp in loops_list:
            flat[next_id] = lp
            owner_rows.append((next_id, pgid))
            next_id += 1
    owners = F.broadcast(spark.createDataFrame(
        owner_rows, "poly_id long, polygon_id long"))
    per_loop = pip_join(points, spark, flat, point_id=point_id)
    return (per_loop.join(owners, "poly_id")
            .groupBy(point_id, "polygon_id")
            .agg(F.count(F.lit(1)).alias("_n_loops_inside"))
            .where(F.col("_n_loops_inside") % 2 == 1)
            .select(point_id, "polygon_id"))


def loop_relations(loops: dict[int, Loop]) -> pd.DataFrame:
    """Pairwise CONTAINS / CONTAINED / INTERSECTS / DISJOINT matrix
    (s2loop.h:312-326 semantics, boundary-crossing + vertex-sample
    decision; driver-side kernel — loop sets are small dims).

    relation: 'contains' (a ⊇ b), 'contained' (b ⊇ a), 'intersects'
    (boundaries cross or partial overlap), 'disjoint'.
    """
    from ..kernels import predicates
    ids = sorted(loops)
    rows = []
    for i, a_id in enumerate(ids):
        for b_id in ids[i + 1:]:
            a, b = loops[a_id], loops[b_id]
            av, bv = a.vertices, b.vertices
            an = np.roll(av, -1, axis=0)
            bn = np.roll(bv, -1, axis=0)
            pa = np.repeat(av, b.n, axis=0)
            pb = np.repeat(an, b.n, axis=0)
            pc = np.tile(bv, (a.n, 1))
            pd_ = np.tile(bn, (a.n, 1))
            crossing = (predicates.crossing_sign(pa, pb, pc, pd_)
                        > 0).any()
            if crossing:
                rel = "intersects"
            else:
                # no interior edge crossing: decide by vertex samples.
                # ALL vertices are sampled (not just one) so loops that
                # touch only at shared vertices — e.g. the reference's
                # diamond pair, s2loop_test.cc:182-186 — are still seen
                # as overlapping when each has vertices on both sides.
                b_in = a.contains_points(bv)
                a_in = b.contains_points(av)
                if (b_in.any() and not b_in.all()) \
                        or (a_in.any() and not a_in.all()):
                    rel = "intersects"  # vertices straddle the boundary
                elif b_in.all() and a_in.all():
                    rel = "intersects"  # mutual cover (complements)
                elif b_in.all():
                    rel = "contains"
                elif a_in.all():
                    rel = "contained"
                else:
                    rel = "disjoint"
            rows.append((a_id, b_id, rel))
    return pd.DataFrame(rows, columns=["loop_a", "loop_b", "relation"])


def synth_loops(n: int, min_vertices: int = 6, max_vertices: int = 12,
                shift_u: float = 0.0) -> dict[int, Loop]:
    """Deterministic synthetic polygon set: regular-ish K-gons around
    mix-derived centers with mix-derived radii (driver-side geometry;
    the PIP verdicts are validated against the brute-force kernel).

    shift_u displaces every center along its tangent `u` direction —
    pairing synth_loops(n) with synth_loops(n, shift_u=r) yields
    deterministic overlapping loop pairs for overlay tests."""
    from ..sources import geo
    out = {}
    for pid in range(n):
        key = np.array([pid], dtype=np.int64)
        f, i, j = geo.geo_np(key)
        x, y, z = geo.xyz_np(key)
        center = np.array([x[0], y[0], z[0]])
        from ..kernels.pointutil import tangent_frame
        if shift_u:
            u0 = tangent_frame(center)[0][0]
            center = center + shift_u * u0
            center /= np.linalg.norm(center)
        nv = min_vertices + int(geo.mix_np(key, 41)[0]
                                % (max_vertices - min_vertices + 1))
        radius = 0.02 + (int(geo.mix_np(key, 42)[0]) % 1000) / 1000 * 0.15
        # tangent basis at center (the frozen fixture convention —
        # kernels/pointutil.tangent_frame; oracles mirror its op order)
        u2, v2 = tangent_frame(center)
        u, v = u2[0], v2[0]
        ang = 2 * np.pi * np.arange(nv) / nv
        wobble = 0.5 + (geo.mix_np(np.arange(nv) + pid * 1000, 43)
                        % 1000) / 1999.0
        r = radius * wobble
        pts = (np.cos(r)[:, None] * center[None, :]
               + np.sin(r)[:, None] * (np.cos(ang)[:, None] * u[None, :]
                                       + np.sin(ang)[:, None] * v[None, :]))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        out[pid] = Loop(pts)
    return out


def mutable_index_rows(pid: int, verts: np.ndarray) -> list[tuple]:
    """One loop's MutableShapeIndex decomposition (kernels/
    shape_index.py — the reference's adaptive cell subdivision with
    the ShrinkToFit jump, MakeIndexCell short-edge rule, and interior
    cells): one row per index cell with its clipped edge count and
    contains-center bit.  Any change to the subdivision rules, the
    padded-UV membership test, or the parity post-pass changes these
    rows."""
    from ..kernels.shape_index import MutableShapeIndex
    from ..kernels.shapeutil import lax_loop_shape
    idx = MutableShapeIndex([lax_loop_shape(
        np.asarray(verts, dtype=np.float64).reshape(-1, 3))])
    out = []
    for cid, cell in zip(idx.cell_ids(), idx.cells()):
        c = cell.clipped[0]
        out.append((pid, int(np.uint64(cid).astype(np.int64)),
                    c.num_edges(), bool(c.contains_center)))
    return out


def mutable_index_cells(spark, loops) -> "DataFrame":
    """Distributed MutableShapeIndex build: one applyInPandas group
    per polygon (the same parallel axis as the distributed edge-cell
    index build above — this emits the reference's per-cell clipped
    structure, build_edge_index_distributed emits the join-ready edge
    rows)."""
    import pandas as pd
    from pyspark.sql import DataFrame
    df = loops if isinstance(loops, DataFrame) \
        else loops_to_df(spark, loops)
    schema = ("poly_id long, icell long, n_edges int, "
              "contains_center boolean")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        v = np.asarray(pdf["vertices"].iloc[0],
                       dtype=np.float64).reshape(-1, 3)
        return pd.DataFrame(
            mutable_index_rows(pid, v),
            columns=["poly_id", "icell", "n_edges",
                     "contains_center"])

    return df.groupBy("poly_id").applyInPandas(run, schema)
