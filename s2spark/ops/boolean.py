"""Distributed polygon boolean overlay — the S2BooleanOperation MVP
surface (reference: s2boolean_operation.h:16-60).

`polygon_overlay` computes, for each (loop_a, loop_b) pair, the cell-
classified intersection / union / difference / symmetric difference
(kernels/boolean.py): exact interior leaf counts + the boundary-band
cell count.  The pair dimension is the parallel axis: one
applyInPandas group per pair, so a million-pair overlay fans out
across executors while each pair's subdivision stays cache-local.

The DuckDB oracle (driver contract) receives the per-POLYGON exact
interior/boundary decompositions as interval VALUES (an independent
single-loop recursion) and re-derives every pair count with interval
set algebra in SQL:
  |A ∩ B|  = Σ overlap((lo_a,hi_a),(lo_b,hi_b)) leaf spans
  |A ∪ B|  = |A| + |B| − |A∩B|,  |A−B| = |A| − |A∩B|,
  |AΔB|   = |A| + |B| − 2|A∩B|
  boundary = |bnd_A| + |bnd_B| − |bnd_A ∩ bnd_B|
(cells fully inside A and fully inside B are exactly the cells fully
inside A∩B, so the identities are exact — see kernels/boolean.py and
the reference-fixture equality tests in tests/test_boolean.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernels import boolean as bk
from ..kernels.loops import Loop

OVERLAY_SCHEMA = ("a_id long, b_id long, op string, "
                  "interior_leaves long, interior_cells long, "
                  "boundary_cells long")


def _pairs_with_vertices(spark: SparkSession,
                         loops_a: dict[int, Loop] | DataFrame,
                         loops_b: dict[int, Loop] | DataFrame,
                         pairs: list[tuple[int, int]] | None
                         ) -> DataFrame:
    """(a_id, b_id, a_vertices, b_vertices) — the loop GEOMETRY rides
    the join, not the task closure, so a million-polygon overlay ships
    only each group's own vertices to its executor (VERDICT r2 #2).
    Dict inputs are converted via loops_to_df; DataFrame inputs
    ((poly_id, vertices) as produced by pip.loops_to_df) pass through
    untouched."""
    from . import pip as _pip
    va = loops_a if isinstance(loops_a, DataFrame) \
        else _pip.loops_to_df(spark, loops_a)
    vb = loops_b if isinstance(loops_b, DataFrame) \
        else _pip.loops_to_df(spark, loops_b)
    if pairs is None:
        pairs_df = (va.select(F.col("poly_id").alias("a_id"))
                    .join(vb.select(F.col("poly_id").alias("b_id")),
                          F.col("a_id") == F.col("b_id")))
    else:
        pairs_df = spark.createDataFrame(
            pd.DataFrame(pairs, columns=["a_id", "b_id"]))
    return (pairs_df
            .join(va.select(F.col("poly_id").alias("a_id"),
                            F.col("vertices").alias("a_vertices")),
                  "a_id")
            .join(vb.select(F.col("poly_id").alias("b_id"),
                            F.col("vertices").alias("b_vertices")),
                  "b_id"))


def _row_loop(flat) -> Loop:
    return Loop(np.asarray(flat, dtype=np.float64).reshape(-1, 3))


def polygon_overlay(spark: SparkSession,
                    loops_a: dict[int, Loop] | DataFrame,
                    loops_b: dict[int, Loop] | DataFrame,
                    pairs: list[tuple[int, int]] | None = None,
                    max_level: int = 8) -> DataFrame:
    """One row per (a_id, b_id, op) with exact interior leaf counts.

    pairs defaults to the diagonal (a_id == b_id present in both
    sides).  Loop vertices arrive via the pair join (no dict in the
    task closure); one applyInPandas group per pair."""
    joined = _pairs_with_vertices(spark, loops_a, loops_b, pairs)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a_id, b_id = int(key[0]), int(key[1])
        cells = bk.classify_pair(_row_loop(pdf["a_vertices"].iloc[0]),
                                 _row_loop(pdf["b_vertices"].iloc[0]),
                                 max_level)
        counts = bk.op_counts(cells)
        rows = [(a_id, b_id, op, c["interior_leaves"],
                 c["interior_cells"], c["boundary_cells"])
                for op, c in counts.items()]
        return pd.DataFrame(rows, columns=[
            "a_id", "b_id", "op", "interior_leaves", "interior_cells",
            "boundary_cells"])

    return (joined.groupBy("a_id", "b_id")
            .applyInPandas(run, OVERLAY_SCHEMA))


def polygon_overlay_exact(spark: SparkSession,
                          loops_a: dict[int, Loop] | DataFrame,
                          loops_b: dict[int, Loop] | DataFrame,
                          pairs: list[tuple[int, int]] | None = None,
                          max_level: int = 8) -> DataFrame:
    """polygon_overlay with EXACT ∪/Δ interiors (VERDICT r2 #2 closed):
    per (pair, op) the cells are classified against the exact boolean
    OUTPUT geometry (kernels/boolean.exact_op_counts — S2Builder MVP
    chains + even/odd region classification), so union / symmetric-
    difference interiors include cells straddling both input
    boundaries, and boundary_cells counts exactly the max_level cells
    meeting ∂(op(A,B)) rather than ∂A ∪ ∂B.  Same schema and parallel
    shape as polygon_overlay (one applyInPandas group per pair,
    vertices riding the join)."""
    joined = _pairs_with_vertices(spark, loops_a, loops_b, pairs)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a_id, b_id = int(key[0]), int(key[1])
        counts = bk.exact_op_counts(
            _row_loop(pdf["a_vertices"].iloc[0]),
            _row_loop(pdf["b_vertices"].iloc[0]), max_level)
        rows = [(a_id, b_id, op, c["interior_leaves"],
                 c["interior_cells"], c["boundary_cells"])
                for op, c in counts.items()]
        return pd.DataFrame(rows, columns=[
            "a_id", "b_id", "op", "interior_leaves", "interior_cells",
            "boundary_cells"])

    return (joined.groupBy("a_id", "b_id")
            .applyInPandas(run, OVERLAY_SCHEMA))


GEOM_SCHEMA = ("a_id long, b_id long, op string, loop_idx int, "
               "seq int, site_cell long")


def polygon_overlay_geom(spark: SparkSession,
                         loops_a: dict[int, Loop] | DataFrame,
                         loops_b: dict[int, Loop] | DataFrame,
                         pairs: list[tuple[int, int]] | None = None,
                         snap_level: int = 14,
                         ops: tuple = bk.OPS) -> DataFrame:
    """EXACT boolean output geometry (S2Builder snap-rounding MVP,
    kernels/builder.py; reference s2boolean_operation.h:16-60 +
    s2builder.h:30-61): per (pair, op) the snap-rounded output vertex
    chains, one row per vertex — (loop_idx, seq) index the chains in
    canonical order, site_cell is the level-`snap_level` snap-site
    cell id (integer ⇒ tri-dialect oracle-safe).

    Scale shape: the pair dimension fans out one applyInPandas group
    per pair with vertices riding the join; per-pair cost is the
    vectorized crossing scan + stitching."""
    from ..kernels import builder as bld
    from ..kernels import cellid as ci
    joined = _pairs_with_vertices(spark, loops_a, loops_b, pairs)
    snap = bld.CellIdSnapFunction(snap_level)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a_id, b_id = int(key[0]), int(key[1])
        a = _row_loop(pdf["a_vertices"].iloc[0])
        b = _row_loop(pdf["b_vertices"].iloc[0])
        rows = []
        for op in ops:
            for li, chain in enumerate(
                    bld.overlay_geometry(a, b, op, snap=snap)):
                cells = ci.parent(ci.from_xyz(chain[:, 0], chain[:, 1],
                                              chain[:, 2]), snap_level)
                rows.extend((a_id, b_id, op, li, s, int(c))
                            for s, c in enumerate(ci.as_i64(cells)))
        return pd.DataFrame(rows, columns=[
            "a_id", "b_id", "op", "loop_idx", "seq", "site_cell"])

    return (joined.groupBy("a_id", "b_id")
            .applyInPandas(run, GEOM_SCHEMA))


def clip_tracks(df: DataFrame, entity_col: str, order_cols: list[str],
                loops: list[Loop], op: str = "intersection",
                snap_exponent: int = 1,
                site_level: int = 14) -> DataFrame:
    """Per-entity polyline × polygon boolean (the polyline dimension
    of S2BooleanOperation; semantics pinned against the reference's
    PolylineEnteringRectangle / PolylineCrossingRectangleTwice
    fixtures in tests/test_builder_reference.py): each entity's
    ordered (x,y,z) track is clipped against the clip region,
    INTERSECTION keeping the inside parts, DIFFERENCE / UNION /
    SYMMETRIC_DIFFERENCE the outside parts.  Output one row per
    output-polyline vertex: (entity, line_idx, seq, site_cell), the
    vertex snapped to the E(snap_exponent) lat/lng grid then encoded
    as its level-`site_level` cell (integers ⇒ oracle-safe).

    Scale shape: one applyInPandas group per entity; the clip region
    is a small broadcast-by-closure fixture (same regime as query
    rings) — a large polygon table would ride a join instead
    (polygon_overlay_geom shows the shape)."""
    from ..kernels import builder as bld
    from ..kernels import cellid as ci
    loop_arrays = [np.asarray(lp.vertices, dtype=np.float64)
                   for lp in loops]
    schema = f"{entity_col} long, line_idx int, seq int, site_cell long"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ent = int(key[0])
        pdf = pdf.sort_values(order_cols)
        v = pdf[["x", "y", "z"]].to_numpy(dtype=np.float64)
        snap = bld.IntLatLngSnapFunction(snap_exponent)
        rows = []
        chains = bld.clip_polyline(v, [Loop(a) for a in loop_arrays],
                                   op, snap=snap)
        for li, chain in enumerate(chains):
            cells = ci.as_i64(ci.parent(
                ci.from_xyz(chain[:, 0], chain[:, 1], chain[:, 2]),
                site_level))
            rows.extend((ent, li, s, int(c))
                        for s, c in enumerate(cells))
        return pd.DataFrame(rows, columns=[entity_col, "line_idx",
                                           "seq", "site_cell"])

    return df.groupBy(entity_col).applyInPandas(run, schema)


def loop_orientation_sign(loop: Loop) -> int:
    """+1 for a CCW (positive-area) loop, -1 for a CW/inverted one —
    via the Gauss-Bonnet curvature (s2loop_measures.cc GetCurvature:
    +2pi for tiny CCW, -2pi for tiny CW)."""
    return 1 if loop.get_curvature() >= 0 else -1


def winding_number(points: DataFrame, spark: SparkSession,
                   loops: dict[int, Loop],
                   point_id: str = "point_id",
                   signs: dict[int, int] | None = None) -> DataFrame:
    """S2WindingOperation MVP (s2winding_operation.h:25-33): per-point
    winding number over a set of ORIENTED loops; winding rules
    (positive / non-zero / odd) become filters on the output.

    A CCW loop winds +1 around its disk; a CW loop winds −1 around
    its disk — and a CW loop's S2 interior (the left side) is the
    COMPLEMENT of that disk, so with S2 containment verdicts:

        w(p) = Σ_ccw [p∈in_i] − Σ_cw [p∈disk_i]
             = Σ_all [p∈interior_i] − n_cw

    Plan: the indexed PIP join supplies containment pairs; one
    map-side-combinable count per point, a constant offset, and a
    left join back to the point set (points inside nothing still have
    winding −n_cw)."""
    if signs is None:
        signs = {pid: loop_orientation_sign(lp)
                 for pid, lp in loops.items()}
    n_cw = sum(1 for v in signs.values() if v < 0)
    from . import pip as _pip
    per = _pip.pip_join(points, spark, loops, point_id=point_id)
    counts = per.groupBy(point_id).agg(
        F.count(F.lit(1)).alias("_n"))
    return (points.select(point_id)
            .join(counts, point_id, "left")
            .select(point_id,
                    (F.coalesce(F.col("_n"), F.lit(0)) - n_cw)
                    .cast("long").alias("winding")))


def buffer_covering(spark: SparkSession,
                    loops: dict[int, Loop] | DataFrame,
                    radius_rad: float, max_level: int = 7) -> DataFrame:
    """S2BufferOperation MVP surface (s2buffer_operation.h:16-24):
    per-loop buffered-region decomposition — certified interior leaf
    count + boundary band cell count at `radius_rad` (negative radius
    erodes).  One applyInPandas group per loop; vertices ride the
    frame (no dict in the task closure)."""
    from ..kernels import buffer as bu
    from ..kernels import cellid as ci
    from . import pip as _pip
    verts = loops if isinstance(loops, DataFrame) \
        else _pip.loops_to_df(spark, loops)
    verts = verts.select(F.col("poly_id").alias("loop_id"), "vertices")
    schema = ("loop_id long, interior_leaves long, interior_cells "
              "long, band_cells long")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lid, flat in zip(pdf["loop_id"], pdf["vertices"]):
            interior, band = bu.classify_buffer(_row_loop(flat),
                                                radius_rad, max_level)
            leaves = int(ci.lsb(np.asarray(interior, dtype=np.int64)
                                .view(np.uint64)).sum()) \
                if len(interior) else 0
            rows.append((int(lid), leaves, len(interior), len(band)))
        return pd.DataFrame(rows, columns=[
            "loop_id", "interior_leaves", "interior_cells",
            "band_cells"])

    return verts.groupBy("loop_id").applyInPandas(run, schema)


def buffer_geom(spark: SparkSession,
                loops: dict[int, Loop] | DataFrame,
                radius_rad: float, snap_level: int = 14) -> DataFrame:
    """Buffered OUTPUT GEOMETRY (the reference's S2BufferOperation
    emits polygons, s2buffer_operation.h:16-24): per loop the offset-
    curve boundary chain (kernels/buffer.buffer_geometry), one row per
    vertex, snapped to level-`snap_level` site cells (integers ⇒
    tri-dialect oracle-safe).  Negative radius erodes.  Same parallel
    shape as buffer_covering: one applyInPandas group per loop,
    vertices riding the frame."""
    from ..kernels import buffer as bu
    from ..kernels import cellid as ci
    from . import pip as _pip
    verts = loops if isinstance(loops, DataFrame) \
        else _pip.loops_to_df(spark, loops)
    verts = verts.select(F.col("poly_id").alias("loop_id"), "vertices")
    schema = "loop_id long, seq int, site_cell long"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lid, flat in zip(pdf["loop_id"], pdf["vertices"]):
            chain = bu.buffer_geometry(_row_loop(flat), radius_rad)
            cells = ci.as_i64(ci.parent(
                ci.from_xyz(chain[:, 0], chain[:, 1], chain[:, 2]),
                snap_level))
            rows.extend((int(lid), s, int(c))
                        for s, c in enumerate(cells))
        return pd.DataFrame(rows, columns=["loop_id", "seq",
                                           "site_cell"])

    return verts.groupBy("loop_id").applyInPandas(run, schema)


def overlay_refined(spark: SparkSession, loops_a: dict[int, Loop],
                    loops_b: dict[int, Loop], op: str,
                    pairs: list[tuple[int, int]] | None = None,
                    max_level: int = 8) -> DataFrame:
    """polygon_overlay for one op plus the center-sampled boundary
    refinement (exact crossing-parity verdicts at boundary-cell
    centers): refined_leaves estimates the true op area in leaf units
    with error bounded by half the boundary band."""
    joined = _pairs_with_vertices(spark, loops_a, loops_b, pairs)
    schema = ("a_id long, b_id long, interior_leaves long, "
              "boundary_cells long, refined_leaves long")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a_id, b_id = int(key[0]), int(key[1])
        a = _row_loop(pdf["a_vertices"].iloc[0])
        b = _row_loop(pdf["b_vertices"].iloc[0])
        cells = bk.classify_pair(a, b, max_level)
        c = bk.op_counts(cells)[op]
        refined = c["interior_leaves"] + bk.refine_boundary(cells, a, b,
                                                            op)
        return pd.DataFrame([(a_id, b_id, c["interior_leaves"],
                              c["boundary_cells"], refined)],
                            columns=["a_id", "b_id", "interior_leaves",
                                     "boundary_cells", "refined_leaves"])

    return (joined.groupBy("a_id", "b_id")
            .applyInPandas(run, schema))


# ---------------------------------------------------------------------------
# model-parameterized overlay (PolygonModel OPEN/SEMI_OPEN/CLOSED)

MODEL_GEOM_SCHEMA = ("pair_id long, op string, model string, "
                     "loop_idx int, seq int, site_cell long")


def shared_boundary_fixture(pid: int, kind: str
                            ) -> tuple[Loop, Loop]:
    """Deterministic loop pair with a coincident boundary feature
    around a mix-derived center — the reference's PolygonEdge*Overlap
    / PolygonVertex*PolygonVertex fixture patterns, translated:
      kind='same'   quad + inside triangle sharing one full edge in
                    the SAME direction
      kind='rev'    quad + outside triangle sharing one full edge
                    REVERSED
      kind='vertex' two triangles touching at exactly one vertex
    Coincidence is bitwise (B reuses A's lat/lng corners)."""
    from ..sources import geo
    k = np.array([pid], dtype=np.int64)
    lat0 = float(geo.mix_np(k, 7)[0] % 100) - 50.0
    lng0 = float(geo.mix_np(k, 11)[0] % 300) - 150.0
    ll = lambda la, ln: (lat0 + la, lng0 + ln)  # noqa: E731
    if kind == "same":
        a = [ll(0, 0), ll(0, 4), ll(2, 4), ll(2, 0)]
        b = [ll(0, 0), ll(1, 1), ll(2, 0)]
    elif kind == "rev":
        a = [ll(0, 0), ll(0, 4), ll(2, 4), ll(2, 0)]
        b = [ll(0, 4), ll(1, 5), ll(2, 4)]
    else:  # vertex touch
        a = [ll(0, 0), ll(0, 5), ll(1, 5)]
        b = [ll(0, 0), ll(5, 3), ll(5, 2)]
    return (Loop.from_latlng_degrees(np.array(a, dtype=np.float64)),
            Loop.from_latlng_degrees(np.array(b, dtype=np.float64)))


def polygon_overlay_models(spark: SparkSession,
                           loops_a: dict[int, Loop] | DataFrame,
                           loops_b: dict[int, Loop] | DataFrame,
                           snap_level: int = 14) -> DataFrame:
    """Boolean output geometry under EVERY PolygonModel (OPEN /
    SEMI_OPEN / CLOSED — s2boolean_operation.h:131-152): per (pair,
    op, model) the snap-rounded output chains, one row per vertex,
    INCLUDING the model's degenerate features (CLOSED-intersection
    2-vertex edge chains and 1-vertex point chains).  Chain-less
    results emit a sentinel row (loop_idx = -1, site_cell = 1 full /
    0 empty) so full/empty disambiguation is oracle-checked.  Same
    parallel shape as polygon_overlay_geom: one applyInPandas group
    per pair, vertices riding the join; model semantics are pinned
    bit-exact against the reference fixtures in
    tests/test_builder_reference.py."""
    from ..kernels import builder as bld
    from ..kernels import cellid as ci
    joined = _pairs_with_vertices(spark, loops_a, loops_b,
                                  pairs=None)
    snap = bld.CellIdSnapFunction(snap_level)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pair = int(key[0])
        a = _row_loop(pdf["a_vertices"].iloc[0])
        b = _row_loop(pdf["b_vertices"].iloc[0])
        rows = []
        for model in bld.POLYGON_MODELS:
            for op in bld.OPS:
                chains = bld.overlay_geometry(a, b, op, snap=snap,
                                              polygon_model=model)
                if not chains:
                    st = bld.overlay_result_state(a, b, op, chains)
                    rows.append((pair, op, model, -1, -1,
                                 1 if st == "full" else 0))
                    continue
                for li, chain in enumerate(chains):
                    cells = ci.parent(
                        ci.from_xyz(chain[:, 0], chain[:, 1],
                                    chain[:, 2]), snap_level)
                    rows.extend((pair, op, model, li, s, int(c))
                                for s, c in
                                enumerate(ci.as_i64(cells)))
        return pd.DataFrame(rows, columns=[
            "pair_id", "op", "model", "loop_idx", "seq", "site_cell"])

    return (joined.groupBy("a_id", "b_id")
            .applyInPandas(run, MODEL_GEOM_SCHEMA))


# ---------------------------------------------------------------------------
# S2WindingOperation (region construction from a winding rule)

WINDING_GEOM_SCHEMA = ("group_id long, rule string, loop_idx int, "
                       "seq int, site_cell long")


def winding_fixture(gid: int) -> tuple[list, tuple, int]:
    """Deterministic self-overlapping staircase of 3 CCW squares plus
    a bow-tie (self-intersecting) loop around a mix-derived center —
    the UnionOfSquares / BowTie patterns of
    s2winding_operation_test.cc.  Returns (loops, ref_latlng_deg,
    ref_winding): the reference point sits inside only the first
    square (winding 1)."""
    from ..sources import geo
    k = np.array([gid], dtype=np.int64)
    lat0 = float(geo.mix_np(k, 17)[0] % 100) - 50.0
    lng0 = float(geo.mix_np(k, 19)[0] % 300) - 150.0
    s = 0.5
    sq = lambda la, ln: [(lat0 + la * s, lng0 + ln * s),        # noqa
                         (lat0 + la * s, lng0 + (ln + 4) * s),
                         (lat0 + (la + 4) * s, lng0 + (ln + 4) * s),
                         (lat0 + (la + 4) * s, lng0 + ln * s)]
    loops = [sq(0, 0), sq(1, 1), sq(2, 2),
             # bow-tie east of the staircase
             [(lat0 + 5 * s, lng0 + 8 * s), (lat0 - 5 * s, lng0 + 18 * s),
              (lat0 + 5 * s, lng0 + 18 * s), (lat0 - 5 * s, lng0 + 8 * s)]]
    from ..kernels.loops import Loop
    arrs = [Loop.from_latlng_degrees(
        np.array(q, dtype=np.float64)).vertices for q in loops]
    return arrs, (lat0 + 0.25 * s, lng0 + 0.25 * s), 1


def winding_geom(spark: SparkSession, n_groups: int,
                 snap_exponent: int = 6) -> DataFrame:
    """Distributed S2WindingOperation
    (s2winding_operation.h:25-120): per (group, rule) the snapped
    boundary chains of the region selected by the winding rule over
    that group's self-intersecting loop set, one row per vertex
    (site_cell = leaf cell id of the snapped site — integer, oracle-
    safe); chain-less results emit a sentinel row (loop_idx = -1,
    site_cell = 1 full / 0 empty).  One applyInPandas group per
    group_id (the parallel axis).  Algorithm parity is pinned against
    the reference's fixture battery in tests/test_winding.py."""
    from ..kernels import builder as bld
    from ..kernels import cellid as ci
    from ..kernels import winding as wd
    from ..kernels.region import latlng_to_point
    base = spark.range(n_groups).select(
        F.col("id").alias("group_id"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        loops, (rlat, rlng), refw = winding_fixture(gid)
        ref = np.asarray(latlng_to_point(np.radians(rlat),
                                         np.radians(rlng)))
        snap = bld.IntLatLngSnapFunction(snap_exponent)
        rows = []
        for rule in wd.RULES:
            chains, state = wd.winding_operation(loops, ref, refw,
                                                 rule, snap=snap)
            if not chains:
                rows.append((gid, rule, -1, -1,
                             1 if state == "full" else 0))
                continue
            for li, chain in enumerate(chains):
                cells = ci.as_i64(ci.from_xyz(chain[:, 0], chain[:, 1],
                                              chain[:, 2]))
                rows.extend((gid, rule, li, s, int(c))
                            for s, c in enumerate(cells))
        return pd.DataFrame(rows, columns=[
            "group_id", "rule", "loop_idx", "seq", "site_cell"])

    return base.groupBy("group_id").applyInPandas(run,
                                                  WINDING_GEOM_SCHEMA)


# ---------------------------------------------------------------------------
# point-layer boolean operations (models)

POINT_MODEL_SCHEMA = ("pair_id long, model string, op string, "
                      "point_idx int, survives boolean")


def point_fixture_probes(pid: int) -> tuple[list, np.ndarray]:
    """(polygon loops, probe points) for the point-layer model query:
    probes sit AT polygon vertices, ON a boundary edge midpoint
    (equator-aligned in the local frame is not guaranteed, so the
    vertex probes carry the model signal), strictly inside, and
    strictly outside — deterministic per pid."""
    from ..kernels.loops import Loop
    a, b = shared_boundary_fixture(pid, "same")
    loops = [a, b]
    v = a.vertices
    inside = v.mean(axis=0)
    inside /= np.linalg.norm(inside)
    outside = -inside
    probes = np.concatenate([v[:2], b.vertices[1:2],
                             inside[None], outside[None]])
    return loops, probes


def point_overlay_models(spark: SparkSession,
                         n_pairs: int) -> DataFrame:
    """Point layer of S2BooleanOperation under every PolygonModel
    (s2boolean_operation.h:157-188 dimension rules + :131-152 models):
    per (pair, model, op, probe point) whether the point survives in
    the output's point dimension.  Vertex probes flip between models
    (OPEN drops them, CLOSED keeps them, SEMI_OPEN keeps the vertex
    tiling's unique owner).  One applyInPandas group per pair;
    semantics pinned against the reference's Point* fixture families
    in tests/test_layers.py."""
    from ..kernels import builder as bld
    from ..kernels import layers as ly
    base = spark.range(n_pairs).select(F.col("id").alias("pair_id"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        loops, probes = point_fixture_probes(pid)
        rows = []
        for model in bld.POLYGON_MODELS:
            contained = ly.polygon_contains_points_model(
                loops, probes, model)
            for op in bld.OPS:
                keep = contained if op == "intersection" \
                    else ~contained
                rows.extend((pid, model, op, i, bool(k))
                            for i, k in enumerate(keep))
        return pd.DataFrame(rows, columns=[
            "pair_id", "model", "op", "point_idx", "survives"])

    return base.groupBy("pair_id").applyInPandas(run,
                                                 POINT_MODEL_SCHEMA)


# ---------------------------------------------------------------------------
# polyline x polyline boolean (models)

PLPL_SCHEMA = ("pair_id long, model string, op string, line_idx int, "
               "seq int, site_cell long")


def polyline_pair_fixture(pid: int) -> tuple[list, list]:
    """Deterministic polyline pair sets with vertex touches, shared
    same/reversed/degenerate edges, and transverse crossings — the
    PolylineVertex* / PolylineEdge*Overlap fixture patterns translated
    to a mix-derived origin."""
    from ..sources import geo
    k = np.array([pid], dtype=np.int64)
    lat0 = float(geo.mix_np(k, 23)[0] % 100) - 50.0
    lng0 = float(geo.mix_np(k, 29)[0] % 300) - 150.0
    s = 0.5

    def pl(pairs):
        from ..kernels.loops import Loop
        return Loop.from_latlng_degrees(np.array(
            [(lat0 + la * s, lng0 + ln * s) for la, ln in pairs],
            dtype=np.float64)).vertices

    kind = pid % 3
    if kind == 0:  # vertex touches (PLV pattern)
        a = [pl([(0, 0), (0, 1), (0, 2)]),
             pl([(0, 3), (0, 4), (0, 3)])]
        b = [pl([(0, 0), (1, 0)]),
             pl([(-1, 1), (0, 1), (1, 1)]),
             pl([(-1, 2), (0, 2)]),
             pl([(1, 3), (0, 3), (1, 3)])]
    elif kind == 1:  # shared same/rev/degenerate edges (PLO pattern)
        a = [pl([(0, 0), (1, 0), (2, 0), (2, 5)]),
             pl([(3, 0), (3, 0)]),
             pl([(6, 0), (5, 0), (4, 0)])]
        b = [pl([(0, 0), (1, 0), (2, 0)]),
             pl([(3, 0), (3, 0)]),
             pl([(4, 0), (5, 0)])]
    else:  # transverse crossing
        a = [pl([(0, 0), (2, 2)])]
        b = [pl([(2, 0), (0, 2)])]
    return a, b


def polyline_overlay_models(spark: SparkSession,
                            n_pairs: int) -> DataFrame:
    """Polyline x polyline boolean operations under every
    PolylineModel (s2boolean_operation.h:109-129 + the dimension
    rules): per (pair, model, op) the output polylines — including
    degenerate vertex-intersection outputs — one row per vertex as a
    leaf cell id.  One applyInPandas group per pair; semantics pinned
    against the reference's PolylineVertex* / PolylineEdge*Overlap /
    PolylineLoopMultiple* fixture families in tests/test_layers.py."""
    from ..kernels import builder as bld
    from ..kernels import cellid as ci
    from ..kernels import layers as ly
    base = spark.range(n_pairs).select(F.col("id").alias("pair_id"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        a, b = polyline_pair_fixture(pid)
        rows = []
        for model in ly.POLYLINE_MODELS:
            for op in bld.OPS:
                chains = ly.polyline_polyline_boolean(a, b, op, model)
                for li, chain in enumerate(chains):
                    cells = ci.as_i64(ci.from_xyz(
                        chain[:, 0], chain[:, 1], chain[:, 2]))
                    rows.extend((pid, model, op, li, sq, int(c))
                                for sq, c in enumerate(cells))
                if not chains:
                    rows.append((pid, model, op, -1, -1, 0))
        return pd.DataFrame(rows, columns=[
            "pair_id", "model", "op", "line_idx", "seq", "site_cell"])

    return base.groupBy("pair_id").applyInPandas(run, PLPL_SCHEMA)


# ---------------------------------------------------------------------------
# mixed-dimension boolean + ClosedSetNormalizer
# (s2builderutil_closed_set_normalizer.h ComputeUnion recipe)

MIXED_SCHEMA = ("group_id long, op string, dim int, feat_idx int, "
                "seq int, site_cell long")

_MIXED_A = (("0:0", "10:10", "20:20"),
            ("0:0, 0:10", "0:0, 10:0", "15:15, 16:16"),
            ("0:0, 0:10, 10:10, 10:0", "0:0, 1:1", "2:2",
             "10:10, 11:11", "12:12"))
_MIXED_B = (("0:10", "10:0", "3:3", "16:16"),
            ("10:10, 0:10", "10:10, 10:0", "5:5, 6:6"),
            ("19:19, 19:21, 21:21, 21:19",))


def _shifted_vertices(text: str, dlat: float, dlng: float
                      ) -> np.ndarray:
    import math

    from ..kernels.region import latlng_to_point
    pts = []
    for pair in text.split(","):
        pair = pair.strip()
        if not pair:
            continue
        lat_s, _, lng_s = pair.partition(":")
        pts.append(latlng_to_point(
            math.radians(float(lat_s) + dlat),
            math.radians(float(lng_s) + dlng)))
    return np.asarray(pts, dtype=np.float64)


def mixed_fixture(gid: int):
    """Deterministic mixed-dimension geometry pair: the reference's
    ComputeUnion MixedGeometry fixture
    (s2builderutil_closed_set_normalizer_test.cc:258-306) rigidly
    shifted per group id — points + polylines + a polygon with
    degenerate point/sibling-pair shells and holes on side A, a
    disjoint polygon plus coincident/interior probes on side B."""
    from ..kernels.layers import GeometryCollection
    dlat = 3.0 * (gid % 8) - 12.0
    dlng = 7.0 * gid

    def side(spec):
        pts, lines, chains = spec
        return GeometryCollection(
            points=np.asarray([_shifted_vertices(t, dlat, dlng)[0]
                               for t in pts]),
            lines=[_shifted_vertices(t, dlat, dlng) for t in lines],
            region=[_shifted_vertices(t, dlat, dlng)
                    for t in chains])

    return side(_MIXED_A), side(_MIXED_B)


def mixed_overlay(spark: SparkSession, n_groups: int) -> DataFrame:
    """Mixed-dimension S2BooleanOperation with ClosedSetNormalizer
    output (NormalizeClosedSet,
    s2builderutil_closed_set_normalizer.h:34-105): per (group, op)
    the three normalized dimensional layers — degenerate polygon
    shells demoted to polylines/points, degenerate holes discarded,
    degenerate polyline edges demoted to points, lower-dimensional
    duplicates suppressed.  One row per feature vertex (dim 0/1/2);
    a full-sphere polygon result emits the sentinel (dim=2,
    feat_idx=-1, site_cell=1).  One applyInPandas group per fixture
    pair — the parallel axis is the group dimension; semantics pinned
    bit-exact against the reference's NormalizeTest table +
    MixedGeometry union in tests/test_closed_set.py."""
    from ..kernels import builder as bld
    from ..kernels import cellid as ci
    from ..kernels import layers as ly
    base = spark.range(n_groups).select(F.col("id").alias("group_id"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        a, b = mixed_fixture(gid)
        rows = []
        for op in bld.OPS:
            pts, lines, chains, full = ly.mixed_boolean_layers(
                a, b, op)
            if full:
                rows.append((gid, op, 2, -1, -1, 1))
            for i, p in enumerate(pts):
                c = ci.as_i64(ci.from_xyz(p[None, 0], p[None, 1],
                                          p[None, 2]))
                rows.append((gid, op, 0, i, 0, int(c[0])))
            for i, pl in enumerate(lines):
                cells = ci.as_i64(ci.from_xyz(pl[:, 0], pl[:, 1],
                                              pl[:, 2]))
                rows.extend((gid, op, 1, i, s, int(c))
                            for s, c in enumerate(cells))
            for i, ch in enumerate(chains):
                cells = ci.as_i64(ci.from_xyz(ch[:, 0], ch[:, 1],
                                              ch[:, 2]))
                rows.extend((gid, op, 2, i, s, int(c))
                            for s, c in enumerate(cells))
        return pd.DataFrame(rows, columns=[
            "group_id", "op", "dim", "feat_idx", "seq", "site_cell"])

    return base.groupBy("group_id").applyInPandas(run, MIXED_SCHEMA)


# ---------------------------------------------------------------------------
# ShapeIndexRegion / ShapeIndexBufferedRegion coverings

SHAPE_COV_SCHEMA = ("group_id long, kind string, seq int, "
                    "cell long")

SHAPE_COV_RADII = (("plain", None), ("buf_small", 0.05),
                   ("buf_large", 0.2))


def shape_covering(spark: SparkSession, n_groups: int,
                   max_cells: int = 16) -> DataFrame:
    """RegionCoverer coverings of a mixed-dimension geometry
    collection via S2ShapeIndexRegion, and of its fixed-radius
    buffers via S2ShapeIndexBufferedRegion
    (s2shape_index_region.h:63-69 GetCovering example,
    s2shape_index_buffered_region.h:50-57 GetBufferedCovering
    example).  Per (group, kind) the canonical covering cells in
    sorted order; one applyInPandas group per fixture — the parallel
    axis is the group dimension.  Kernel guarantees pinned in
    tests/test_shape_region.py (buffered point == cap identity,
    sampled coverage within radius)."""
    from ..kernels.coverer import RegionCoverer
    from ..kernels.shape_region import (ShapeIndexBufferedRegion,
                                        ShapeIndexRegion)
    from ..kernels import cellid as ci
    base = spark.range(n_groups).select(F.col("id").alias("group_id"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        col, _ = mixed_fixture(gid)
        rc = RegionCoverer(max_cells=max_cells)
        rows = []
        for kind, radius in SHAPE_COV_RADII:
            reg = (ShapeIndexRegion(col) if radius is None
                   else ShapeIndexBufferedRegion(col, radius))
            cells = sorted(int(c) for c in ci.as_i64(np.asarray(
                rc.get_covering(reg), dtype=np.uint64)))
            rows.extend((gid, kind, s, c)
                        for s, c in enumerate(cells))
        return pd.DataFrame(rows, columns=[
            "group_id", "kind", "seq", "cell"])

    return base.groupBy("group_id").applyInPandas(run,
                                                  SHAPE_COV_SCHEMA)


# ---------------------------------------------------------------------------
# BuildPolygonBoundaries (s2shapeutil_build_polygon_boundaries.h)

BOUNDARIES_SCHEMA = ("group_id long, face_idx int, comp int, "
                     "loop_idx int")

_BOUNDARY_COMPONENTS = (
    ("0:0, 25:0, 50:0, 50:25, 50:50, 25:50, 0:50, 0:50",
     "0:0, 0:25, 25:25, 25:0", "0:25, 0:50, 25:50, 25:25",
     "25:0, 25:25, 50:25, 50:0", "25:25, 25:50, 50:50, 50:25"),
    ("0:-10, 10:-10",),
    ("5:5, 20:5, 20:10, 5:10", "5:5, 5:10, 10:10, 10:5",
     "10:5, 10:10, 15:10, 15:5", "15:5, 15:10, 20:10, 20:5"),
    ("5:15, 20:15, 20:20, 5:20", "5:15, 5:20, 20:20, 20:15"),
    ("2:5, 2:10, 2:5",),
    ("11:6, 14:6, 14:9, 11:9", "11:6, 11:9, 14:9, 14:6"),
    ("16:6, 19:9, 16:6",),
    ("30:5, 45:5, 45:20, 30:20", "30:5, 30:20, 45:20, 45:5"),
    ("30:30, 40:30, 30:30",),
    ("30:35, 40:35, 30:35",),
    ("30:40, 40:40, 30:40",),
    ("30:45, 40:45, 30:45",),
)


def boundaries_fixture(gid: int) -> list[list[np.ndarray]]:
    """Rigidly shifted copy of the reference's ComplexTest1 nesting
    (4-quadrant square, nested islands/lakes, degenerate components
    at several depths)."""
    dlat = 2.0 * (gid % 6) - 5.0
    dlng = 11.0 * gid
    return [[_shifted_vertices(t, dlat, dlng) for t in comp]
            for comp in _BOUNDARY_COMPONENTS]


def polygon_boundaries(spark: SparkSession,
                       n_groups: int) -> DataFrame:
    """BuildPolygonBoundaries
    (s2shapeutil_build_polygon_boundaries.h:29-66): group lax loops
    organized as sphere-subdividing components into polygons whose
    interiors do not intersect — one row per (face, member loop).
    One applyInPandas group per fixture; nesting semantics pinned
    against the reference's full test table (ComplexTest1 included)
    in tests/test_polygon_boundaries.py."""
    from ..kernels.shapeutil import build_polygon_boundaries
    base = spark.range(n_groups).select(F.col("id").alias("group_id"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        faces = build_polygon_boundaries(boundaries_fixture(gid))
        rows = [(gid, fi, ci, li)
                for fi, face in enumerate(faces)
                for (ci, li) in face]
        return pd.DataFrame(rows, columns=[
            "group_id", "face_idx", "comp", "loop_idx"])

    return base.groupBy("group_id").applyInPandas(run,
                                                  BOUNDARIES_SCHEMA)


# ---------------------------------------------------------------------------
# shape / collection measures (s2shape_index_measures.h)

MEASURES_SCHEMA = ("group_id long, side string, dim int, "
                   "num_points int, length double, perimeter double, "
                   "area double, cx double, cy double, cz double")


def shape_measures(spark: SparkSession, n_groups: int) -> DataFrame:
    """Collection-level measures (s2shape_index_measures.h:32-80 +
    s2shape_measures.h / s2centroids.h): per (group, side) the max
    dimension, dim-0 point count, polyline length, polygon perimeter
    (shells + holes + degenerate chains), signed-area sum (+4pi when
    negative), and the measure-weighted centroid of the MAX-dimension
    shapes.  Floats come from the SAME ordered kernel accumulation on
    both engine and oracle sides (no cross-row SQL float agg), so the
    value hash is bit-exact.  Identities pinned in
    tests/test_shape_measures.py."""
    from ..kernels.shape_measures import collection_measures
    base = spark.range(n_groups).select(F.col("id").alias("group_id"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        a, b = mixed_fixture(gid)
        rows = []
        for side, col in (("a", a), ("b", b)):
            m = collection_measures(col)
            rows.append((gid, side, m["dim"], m["num_points"],
                         m["length"], m["perimeter"], m["area"],
                         float(m["centroid"][0]),
                         float(m["centroid"][1]),
                         float(m["centroid"][2])))
        return pd.DataFrame(rows, columns=[
            "group_id", "side", "dim", "num_points", "length",
            "perimeter", "area", "cx", "cy", "cz"])

    return base.groupBy("group_id").applyInPandas(run,
                                                  MEASURES_SCHEMA)
