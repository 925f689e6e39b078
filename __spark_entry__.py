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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s2spark import dataset
from s2spark import functions as s2f
from s2spark.ops import ann, joins, knn, measures, text, tiles
from s2spark.sources import geo

DISC_RADIUS_RAD = 0.05          # ~318 km query discs
KNN_K = 5
ROLLUP_LEVELS = [4, 8, 12]
EQUI_LEVEL = 4
N_COVER_CAPS = 150              # fixed synthetic caps for region_covering


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


def q_tile_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Spark SQL GROUPING SETS over precomputed tile columns
    (SURVEY §2.4's hierarchy substitute).  NULL grouping slots are
    coalesced to -1 so the value-hash is NULL-free."""
    ev = dataset.geotagged_events(spark, sf_dir).select(
        s2f.parent_col(F.col("cell_id"), 4).alias("t4"),
        s2f.parent_col(F.col("cell_id"), 8).alias("t8"))
    ev.createOrReplaceTempView("ev_tiles")
    return spark.sql(
        "SELECT COALESCE(t4, -1) AS t4, COALESCE(t8, -1) AS t8, "
        "COUNT(*) AS n FROM ev_tiles "
        "GROUP BY GROUPING SETS ((t4), (t4, t8), ())")


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
    # stored table stats (parquet footers), not a driver-side scan
    n = dataset.table_rows(sf_dir, "events")
    level = knn.pick_level(n, KNN_K)
    out = knn.knn_join(ev, cu, KNN_K, query_id="c_custkey",
                       point_id="event_id", level=level)
    return out.select("c_custkey", "event_id", "dist2",
                      F.col("rank").cast("int").alias("rank"))


def q_furthest_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k FURTHEST events per customer — S2MaxDistance semantics
    (s2max_distance_targets.h:30-60): furthest(q) = closest(-q) via
    the chord identity |p-q|^2 + |p+q|^2 = 4, so the ring-pruned kNN
    search runs unchanged on the antipodal query set (no broadcast
    max-sweep); survivors re-ranked by the directly-computed chord^2
    to the original query for bit-exactness vs the brute SQL
    oracle."""
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "cell_id", "x", "y", "z")
    cu = dataset.geotagged_customers(spark, sf_dir) \
        .where(F.col("c_custkey") % 10 == 0) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    n = dataset.table_rows(sf_dir, "events")
    level = knn.pick_level(n, KNN_K)
    out = knn.furthest_point_join(ev, cu, KNN_K,
                                  query_id="c_custkey",
                                  point_id="event_id", level=level)
    return out.select("c_custkey", "event_id", "dist2",
                      F.col("rank").cast("int").alias("rank"))


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------

def _docs(spark, sf_dir):
    return dataset.load(spark, sf_dir, "documents")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.exact_dedup(_docs(spark, sf_dir))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(_docs(spark, sf_dir)) \
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                F.col("len_chars").cast("long").alias("len_chars"),
                "chars_per_token")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_docs(spark, sf_dir)) \
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                "ttr", "quality")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_docs(spark, sf_dir))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_fingerprint(_docs(spark, sf_dir)) \
        .select("doc_id",
                F.col("n_shingles").cast("long").alias("n_shingles"),
                "min_hash", "max_hash")


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lsh_candidate_pairs(_docs(spark, sf_dir)) \
        .select("doc_a", "doc_b",
                F.col("sig_matches").cast("long").alias("sig_matches"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.simhash(_docs(spark, sf_dir))


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = dataset.load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 20 == 0) \
            .select(F.col("vec_id").alias("qid"), "embedding")
    return ann.cosine_topk(emb.select("vec_id", "embedding"), qs, k=5)


def q_embedding_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = dataset.load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 20 == 0) \
            .select(F.col("vec_id").alias("qid"), "embedding")
    return ann.lsh_ann(emb.select("vec_id", "embedding"), qs, k=5)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.ngram_jaccard(_docs(spark, sf_dir), threshold=0.35) \
        .select("doc_a", "doc_b",
                F.col("inter").cast("long").alias("inter"),
                F.col("union_n").cast("long").alias("union_n"),
                "jaccard")


def q_embedding_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = dataset.load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 20 == 0) \
            .select(F.col("vec_id").alias("qid"), "embedding")
    return ann.ivf_ann(emb.select("vec_id", "embedding"), qs, k=5)


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate GROUPS: connected components over the MinHash-
    LSH candidate pairs (iterative min-label propagation; the oracle
    recomputes components with a recursive CTE)."""
    pairs = text.lsh_candidate_pairs(_docs(spark, sf_dir))
    return text.dedup_groups(pairs)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = dataset.load(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    return ann.cosine_pairs(emb, threshold=0.4)


def q_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both frames carry (id, cell_id, x, y, z) so hausdorff2's size
    # dispatch can choose the kNN path when B outgrows a broadcast
    # (supplier is a small dim at every test SF -> broadcast regime)
    cu = dataset.geotagged_customers(spark, sf_dir) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    su = dataset.geotag(dataset.load(spark, sf_dir, "supplier"),
                        "s_suppkey", "supplier") \
        .select("s_suppkey", "cell_id", "x", "y", "z")
    return measures.hausdorff2(cu, su, "c_custkey",
                               b_id="s_suppkey")


def q_track_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "user_id", "ts", "x", "y", "z")
    return measures.track_segments(ev, "user_id", ["ts", "event_id"]) \
        .select("user_id", F.col("seq").cast("int").alias("seq"), "dist2")


def q_track_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2Polyline::Project, distributed (s2polyline.cc:268-298): each
    probe customer point projects onto the event-track polylines
    (one per user) and reports the globally nearest segment —
    winning user_id, edge_id (next_vertex = edge_id + 1) and chord².
    The sf tables' tracks are globe-scattered (consecutive events of
    a user are not spatially local), so the reference-style regime
    dispatch picks the BRUTE sweep over the distributed segment
    frame — covering globe-spanning edges costs more than it prunes;
    the ring-pruned indexed path is available for local tracks
    (track_project_join(level=...)).  The projected point /
    UnInterpolate fraction kernels are pinned against the reference
    fixture tables in tests/test_polyline_project.py; the brute SQL
    oracle recomputes the argmin segment bit-exactly."""
    from s2spark.ops import edges as edge_ops
    ev = dataset.geotagged_events(spark, sf_dir) \
        .where(F.col("user_id") % 10 == 0) \
        .select("event_id", "user_id", "ts", "x", "y", "z")
    cu = dataset.geotagged_customers(spark, sf_dir) \
        .where(F.col("c_custkey") % 20 == 0) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    n = dataset.table_rows(sf_dir, "events") // 10
    out = edge_ops.track_project_join(cu, spark, ev, "user_id",
                                      ["ts", "event_id"],
                                      point_id="c_custkey", n_edges=n)
    return out.select("c_custkey",
                      F.col("poly_id").cast("long").alias("user_id"),
                      F.col("edge_id").cast("long").alias("edge_id"),
                      "dist2",
                      F.col("rank").cast("int").alias("rank"))


EDGE_WITHIN_RADIUS = 0.05  # radians — the edge-target max_distance


def q_edge_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2ClosestEdgeQuery with an EDGE target (ShapeIndexTarget +
    max_distance, s2closest_edge_query.h:75-135, s2distance_target.h):
    geometry-to-geometry distance as a distributed join — every
    (track edge, loop edge) pair within 0.05 rad with the exact
    edge-pair chord² (kernels.edges.edge_pair_min_chord2 =
    UpdateEdgePairMinDistance, s2edge_distances.cc:327-351) and a
    per-track-edge nearness rank.  Candidates come from fixed-level
    coverings of BOTH sides with the disc_join neighbor-ring
    guarantee (ops/edges.edge_within_join); the brute SQL oracle
    recomputes min-of-four segment chord² with the crossing override
    bit-exactly over all pairs."""
    from s2spark.ops import edges as edge_ops
    from s2spark.ops import pip as _p
    ev = dataset.geotagged_events(spark, sf_dir) \
        .where(F.col("user_id") % 10 == 0) \
        .select("event_id", "user_id", "ts", "x", "y", "z")
    seg = edge_ops.track_edge_frame(ev, "user_id", ["ts", "event_id"])
    out = edge_ops.edge_within_join(seg, spark, _p.synth_loops(15),
                                    EDGE_WITHIN_RADIUS)
    return out.select(F.col("poly_id").cast("long").alias("user_id"),
                      F.col("edge_id").cast("long").alias("seq"),
                      F.col("t_poly").cast("long").alias("poly_id"),
                      F.col("t_edge").cast("long").alias("edge_id"),
                      "dist2",
                      F.col("rank").cast("int").alias("rank"))


def q_cell_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving hex token codec (s2cell_id.cc:221-258)."""
    ev = dataset.geotagged_events(spark, sf_dir).select("event_id",
                                                        "cell_id")
    return ev.select("event_id", s2f.s2_token(F.col("cell_id"))
                     .alias("token"))


CODEC_TILE_LEVEL = 6
N_CODEC_POLYS = 12


def q_cell_vector_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EncodedS2CellIdVector wire-format round-trip, distributed
    (encoded_s2cell_id_vector.cc:61-180; kernels/codecs.py): per
    level-6 tile the sorted event cell ids are packed into the
    base+shift+delta byte format and unpacked again — any bit error in
    either direction changes the emitted cell_id rows.  Byte-level
    format parity is pinned against the reference's 16 published
    golden encodings in tests/test_codecs.py.  Oracle: plain SQL
    (grouping + ROW_NUMBER) — the round-trip must be the identity."""
    from s2spark.ops import codec
    ev = dataset.geotagged_events(spark, sf_dir).select(
        s2f.prefix_col(F.col("cell_id"), CODEC_TILE_LEVEL).alias("tile"),
        "cell_id")
    return codec.cell_vector_roundtrip(ev, "tile")


def q_shape_index_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EncodedS2ShapeIndex wire-format round-trip, distributed
    (mutable_s2shape_index.cc:1958-2020 Encode/Init,
    s2shape_index.cc:69-360 cell/clipped-shape encodings,
    encoded_s2shape_index.h:128; kernels/codecs.py): per synthetic
    polygon the full index (cells + clipped shapes + edge runs) is
    encoded into the three-layer format and decoded back; rows carry
    the decoded per-cell structure and byte length.  Golden byte
    layouts pinned in tests/test_codecs.py.  Materialized
    driver-kernel oracle."""
    from s2spark.ops import codec, pip
    loops = pip.synth_loops(N_CODEC_POLYS)
    return codec.shape_index_codec_roundtrip(spark, loops)


def q_shape_index_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MutableS2ShapeIndex decomposition, distributed
    (mutable_s2shape_index.cc:1240-1850 UpdateFaceEdges/MakeIndexCell;
    kernels/shape_index.py): per synthetic polygon, the adaptive cell
    subdivision — per-face ShrinkToFit jump, padded-UV membership,
    short-edge subdivision rule, interior cells with contains-center
    bits — emitted as one row per index cell.  QuadraticValidate
    parity pinned in tests/test_shape_index.py.  Materialized
    driver-kernel oracle."""
    from s2spark.ops import pip
    loops = pip.synth_loops(N_CODEC_POLYS, min_vertices=24,
                            max_vertices=48)
    return pip.mutable_index_cells(spark, loops)


def q_polygon_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2Polygon compressed coder (v4) round-trip, distributed
    (s2polygon.cc:1475-1500, s2loop.cc:1360-1426, s2point_compression
    .cc; kernels/codecs.py): per synthetic polygon, vertices snapped
    to level-14 cell centers, encoded (faces RLE + 2nd-derivative
    zig-zag varints), decoded, and each decoded vertex re-emitted as
    its leaf cell id together with the encoded byte length and format
    version — integers only, so the value hash is tri-dialect safe.
    Encoded sizes are pinned against the reference's published golden
    sizes in tests/test_codecs.py.  Materialized driver-kernel
    oracle."""
    from s2spark.ops import codec, pip
    loops = pip.synth_loops(N_CODEC_POLYS)
    return codec.polygon_codec_roundtrip(spark, loops,
                                         snap_level=GEOM_SNAP_LEVEL)


def q_region_covering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap covering stats (RegionCoverer, max_cells=8) over a fixed
    synthetic cap set: covering size + exact leaf-cell coverage (sum
    of lsb = 4^(30-l)).  The greedy coverer is not SQL-expressible, so
    the oracle materializes the driver-side NumPy kernel's expected
    rows (see _geometry_oracles) — an end-to-end check of the
    distributed UDF plumbing; covering semantics themselves are pinned
    by tests/test_coverer.py fixtures."""
    cov = s2f.make_cap_covering_xyz_udf(max_cells=8, min_level=2,
                                        max_level=16)
    import math
    r2 = (2.0 * math.sin(0.5 * DISC_RADIUS_RAD)) ** 2
    caps = dataset.geotag(
        spark.range(N_COVER_CAPS).select(F.col("id").alias("cap_id")),
        "cap_id", "caps") \
        .select("cap_id",
                F.explode(cov(F.col("x"), F.col("y"), F.col("z"),
                              F.lit(r2))).alias("cell"))
    return (caps.groupBy("cap_id")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum(s2f.lsb_col(F.col("cell"))).alias("leaf_cells")))


N_OVL_A = 120
N_OVL_B = 120
OVL_B_BASE = 1000
OVL_B_RADIUS_MULT = 4.0


def q_region_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region × region intersection join over CELL-UNION regions (the
    S2CellIndex / s2cell_iterator_join regime,
    s2cell_iterator_join.h:148-186): two normalized cell unions
    intersect iff a cell of one CONTAINS a cell of the other, so the
    distributed join is two ancestor-term equi-joins (pure bit-math
    fan-out, no cross join, no geometry kernel, exact without a
    refine step).  Regions are cap coverings of two deterministic
    synthetic cap sets; the oracle recomputes the overlap
    INDEPENDENTLY from the materialized covering cells via Hilbert
    range containment (range_min/range_max interval algebra), so the
    join logic itself is cross-checked, not just mirrored."""
    import math
    cov = s2f.make_cap_covering_xyz_udf(max_cells=8, min_level=2,
                                        max_level=16)
    r2a = (2.0 * math.sin(0.5 * DISC_RADIUS_RAD)) ** 2
    r2b = (2.0 * math.sin(0.5 * DISC_RADIUS_RAD
                          * OVL_B_RADIUS_MULT)) ** 2
    a = dataset.geotag(
        spark.range(N_OVL_A).select(F.col("id").alias("a_id")),
        "a_id", "caps") \
        .select("a_id", F.explode(cov(F.col("x"), F.col("y"),
                                      F.col("z"),
                                      F.lit(r2a))).alias("cell"))
    b = dataset.geotag(
        spark.range(OVL_B_BASE, OVL_B_BASE + N_OVL_B)
        .select(F.col("id").alias("b_id")),
        "b_id", "caps") \
        .select("b_id", F.explode(cov(F.col("x"), F.col("y"),
                                      F.col("z"),
                                      F.lit(r2b))).alias("cell"))
    # each side feeds BOTH direction joins — materialize the (tiny)
    # covering frames so the coverer UDF runs once per side
    a = a.localCheckpoint(eager=True)
    b = b.localCheckpoint(eager=True)
    return joins.cell_union_overlap_join(a, b, "a_id", "b_id") \
        .select(F.col("a_id").cast("long").alias("a_id"),
                F.col("b_id").cast("long").alias("b_id"))


def q_chain_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "user_id", "ts", "x", "y", "z")
    return measures.chain_midpoint(ev, "user_id", ["ts", "event_id"])


def q_closest_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2ClosestEdgeQuery analogue (rows-only; validated against the
    brute-force kernel in tests/test_edges.py)."""
    from s2spark.ops import edges as eops
    from s2spark.ops import pip
    ev = dataset.geotagged_events(spark, sf_dir) \
        .where(F.col("event_id") % 20 == 0) \
        .select("event_id", "cell_id", "x", "y", "z")
    return eops.closest_edge_join(ev, spark, pip.synth_loops(15),
                                  point_id="event_id")


POLY_DIST_MAX = 0.12  # radians — the Options::set_max_distance radius


def q_polygon_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2ClosestEdgeQuery with Options (s2closest_edge_query.h:75-135):
    include_interiors=true gives points inside a polygon a distance-0
    result with edge_id = -1 (s2closest_edge_query_test.cc
    TargetPointInsideIndexedPolygon), max_distance keeps only edges
    within 0.12 rad — points near nothing return no row.  Oracle:
    brute min over all loop edges UNION the crossing-parity interior
    rows, ranked, radius-filtered."""
    from s2spark.ops import edges as eops
    from s2spark.ops import pip
    ev = dataset.geotagged_events(spark, sf_dir) \
        .where(F.col("event_id") % 10 == 3) \
        .select("event_id", "cell_id", "x", "y", "z")
    return eops.closest_edge_join(ev, spark, pip.synth_loops(15),
                                  point_id="event_id",
                                  include_interiors=True,
                                  max_distance=POLY_DIST_MAX)


CLOSEST_CELL_K = 2


def _closest_cell_index_rows() -> list[tuple[int, int]]:
    """Deterministic (icell, label) index: coverings of the 15 synth
    loops at levels 4..10 (min_level pins the ring-join key level)."""
    import numpy as _np

    from s2spark.kernels import cellid as _ck
    from s2spark.kernels.coverer import RegionCoverer
    from s2spark.ops import pip
    rows = []
    for pid, lp in pip.synth_loops(15).items():
        rc = RegionCoverer(max_cells=12, min_level=4, max_level=10)
        rows.extend((int(c), pid) for c in _ck.as_i64(
            _np.array(rc.get_covering(lp), dtype=_np.uint64)))
    return rows


def q_closest_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2ClosestCellQuery analogue (s2closest_cell_query.h:16-24): per
    event point the k=2 nearest (cell, label) index entries by exact
    chord² cell distance (0 inside).  Indexed expanding-ring plan;
    the oracle recomputes brute-force in SQL (4-edge min + leaf-range
    containment, identical double op order)."""
    import pandas as _pd

    from s2spark.ops import cells as cops
    idx = spark.createDataFrame(
        _pd.DataFrame(_closest_cell_index_rows(),
                      columns=["icell", "label"]))
    ev = dataset.geotagged_events(spark, sf_dir) \
        .where(F.col("event_id") % 10 == 0) \
        .select("event_id", "cell_id", "x", "y", "z")
    # size dispatch picks the broadcast sweep here (a few hundred
    # index cells is the brute regime — s2closest_point_query_base.h:
    # 534-537); the expanding-ring plan engages for large indexes and
    # is pinned ring==brute in tests/test_cells_op.py
    return cops.closest_cell_join(ev, idx, point_id="event_id",
                                  k=CLOSEST_CELL_K,
                                  n_index=len(_closest_cell_index_rows()))


def q_crossing_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2CrossingEdgeQuery analogue.  Checked against an independent
    brute-force crossing-sign SQL oracle (oracle_sql()['crossing_edges'])
    plus tests/test_edges.py kernel fixtures."""
    from s2spark.ops import edges as eops
    from s2spark.ops import pip
    cu = dataset.geotagged_customers(spark, sf_dir) \
        .where(F.col("c_custkey") <= 60) \
        .select("c_custkey", "x", "y", "z") \
        .withColumn("nxt", F.lead(F.struct("x", "y", "z"))
                    .over(Window.orderBy("c_custkey"))) \
        .where(F.col("nxt").isNotNull()) \
        .select(F.col("c_custkey").alias("qedge_id"),
                F.col("x").alias("ax"), F.col("y").alias("ay"),
                F.col("z").alias("az"),
                F.col("nxt.x").alias("bx"), F.col("nxt.y").alias("by"),
                F.col("nxt.z").alias("bz"))
    return eops.crossing_edge_join(cu, spark, pip.synth_loops(15))


def q_polygon_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-loop polygons with holes (even-odd rule).  Checked against
    an independent crossing-parity SQL oracle plus brute force in
    tests/test_polygon.py."""
    from s2spark.ops import pip
    base = pip.synth_loops(12)
    holes = pip.synth_loops(24)
    polygons = {pid: [base[pid], holes[pid + 12]] for pid in range(12)}
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "cell_id", "x", "y", "z")
    return pip.polygon_pip_join(ev, spark, polygons,
                                point_id="event_id")


def q_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint image table synthesized from orders keys: per-tile
    metadata stats — every column tri-dialect reproducible."""
    orders = dataset.load(spark, sf_dir, "orders") \
        .select(F.col("o_orderkey").alias("id"))
    img = dataset.synth_images_from(orders, "id")
    return (img.groupBy(s2f.parent_col(F.col("cell_id"), 6).alias("tile"))
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("w").alias("sum_w"),
                 F.sum("h").alias("sum_h"),
                 F.sum((F.col("fmt") == "png").cast("long"))
                 .alias("n_png")))


def q_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal path: synth PNG bytes -> real decode -> block
    feature grid + perceptual hash -> tile rollup.  Rows-only check
    (binary payloads aren't SQL-expressible); pixel invariants are
    pinned by tests/test_image.py."""
    from s2spark.image import ops as imops
    img = dataset.synth_images_with_bytes(spark, 200) \
        .withColumn("tile", s2f.parent_col(F.col("cell_id"), 4))
    # tile rides the decode pass as a passthrough column: one scan of
    # the payload bytes, no self-join re-deriving the synth+encode UDF
    feats = imops.image_features(img, passthrough=("tile",))
    return (feats
            .groupBy("tile")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum(F.bit_count(F.col("phash64"))).alias("sum_bits")))


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio leg of the multimodal contract: synth real RIFF/PCM16 WAV
    payloads -> mapInPandas decode -> integer clip features, tile key
    riding the single decode pass as a passthrough column.  The oracle
    re-derives every decoded SAMPLE in DuckDB (the synth formula is
    tri-dialect), so the WAV encode/decode round-trip itself is inside
    the value-hash check."""
    from s2spark.audio import ops as audops
    # payload synth+decode is Python-UDF work: a single-file orders
    # scan would run the whole pipeline in ONE task (spread() note)
    orders = s2f.spread(dataset.load(spark, sf_dir, "orders")
                        .select(F.col("o_orderkey").alias("id")))
    aud = dataset.synth_audio_with_bytes(orders, "id") \
        .withColumn("tile", s2f.parent_col(F.col("cell_id"), 6))
    feats = audops.audio_features(aud, passthrough=("tile",))
    return feats.select(
        "audio_id",
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("sum_sq"),
        F.col("peak").cast("long").alias("peak"),
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        "tile")


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video leg: synth RV01 containers (PNG frames) -> frame-sample
    every 2nd frame via the seek table (skipped frames never decoded)
    -> exact integer pixel checksum per sampled frame.  The oracle
    re-derives every sampled frame's pixels in DuckDB, so container
    framing + PNG round-trip + sampling stride are all inside the
    value-hash check."""
    from s2spark.video import ops as vidops
    # same single-task hazard as audio_features: PNG encode/decode per
    # frame is the dominant cost — widen before the payload UDFs.
    # %4 subset: the query exercises per-frame codec throughput, not
    # scan scale (mirrored in the oracle's WHERE)
    orders = s2f.spread(dataset.load(spark, sf_dir, "orders")
                        .where(F.col("o_orderkey") % 4 == 0)
                        .select(F.col("o_orderkey").alias("id")))
    vid = dataset.synth_video_with_bytes(orders, "id")
    frames = vidops.frame_sample(vid, every_k=2)
    return frames.select(
        "video_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("h").cast("long").alias("h"),
        F.col("w").cast("long").alias("w"),
        F.col("pix_sum"))


def q_image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup candidates by perceptual-hash banding (4x16-bit
    bands over the 64-bit phash) + Hamming distance."""
    orders = dataset.load(spark, sf_dir, "orders") \
        .select(F.col("o_orderkey").alias("id"))
    img = dataset.synth_images_from(orders, "id") \
        .select("image_id", "phash")
    return text.phash_near_dup(img)


def q_raster_cell_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-tile -> vector-cell association for the image table
    (north star); inverse-direction rollup per cell.  Rows-only:
    tangent-plane trig is kernel-side; invariants in
    tests/test_raster.py."""
    from s2spark.ops import raster
    orders = dataset.load(spark, sf_dir, "orders") \
        .select(F.col("o_orderkey").alias("id"))
    img = dataset.synth_images_from(orders, "id")
    m = raster.raster_cell_map(img, grid=4, level=14)
    return raster.cells_to_raster_tiles(m) \
        .select("rcell", F.col("n_tiles").cast("long").alias("n_tiles"),
                F.col("n_images").cast("long").alias("n_images"))


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join vs 25 synthetic loops.  Checked against an
    independent brute-force crossing-parity SQL oracle (oracle_sql()
    ['pip_join']) and by tests/test_pip.py against the brute-force
    kernel (the reference's own validation strategy,
    s2loop_test.cc:488-493)."""
    from s2spark.ops import pip
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "cell_id", "x", "y", "z")
    return pip.pip_join(ev, spark, pip.synth_loops(25),
                        point_id="event_id")


N_OVERLAY_PAIRS = 6
OVERLAY_MAX_LEVEL = 8
OVERLAY_SHIFT = 0.06
N_HULL_POINTS = 320
N_HULL_GROUPS = 8


def _hull_points_pdf():
    """Deterministic localized point clusters: N_HULL_GROUPS caps of
    mix-derived centers, each with N_HULL_POINTS/N_HULL_GROUPS points
    at mix-derived tangent offsets (radius <= 0.3 rad, so every group
    has a proper non-full hull).  Built once in NumPy — the Spark
    query and the oracle share the identical doubles."""
    import numpy as np
    import pandas as pd
    keys = np.arange(N_HULL_POINTS, dtype=np.int64)
    g = keys % N_HULL_GROUPS
    cx, cy, cz = geo.xyz_np(g * 1000 + 7)
    centers = np.stack([cx, cy, cz], axis=1)
    from s2spark.kernels.pointutil import tangent_frame
    u, v = tangent_frame(centers)
    ang = 2 * np.pi * (geo.mix_np(keys, 51) % 10_000) \
        .astype(np.float64) / 10_000.0
    rad = 0.3 * (geo.mix_np(keys, 52) % 10_000) \
        .astype(np.float64) / 10_000.0
    pts = (np.cos(rad)[:, None] * centers
           + np.sin(rad)[:, None] * (np.cos(ang)[:, None] * u
                                     + np.sin(ang)[:, None] * v))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pd.DataFrame({"grp": g, "pkey": keys, "x": pts[:, 0],
                         "y": pts[:, 1], "z": pts[:, 2]})


def q_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group spherical convex hulls (S2ConvexHullQuery,
    s2convex_hull_query.h:16-27) over fixed synthetic point clusters.
    Output is integer-valued (group, seq, point_key); the oracle
    materializes the driver-side kernel's expected rows (hull
    semantics are pinned independently by tests/test_hull.py against
    the reference's fixture suite)."""
    from s2spark.ops import hull as hops
    pts = spark.createDataFrame(_hull_points_pdf())
    return hops.convex_hull_by_group(pts, "grp", "pkey") \
        .select("grp", F.col("seq").cast("int").alias("seq"),
                "point_key")


def q_chain_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolate-by-fraction along each user's track (generalizes
    chain_midpoint to arbitrary fractions — S2Polyline::Interpolate /
    GetSuffix query-by-fraction, s2_common.i:862-870): the first
    vertex at/after 1/4 and 3/4 of the quantized chain length."""
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "user_id", "ts", "x", "y", "z")
    outs = []
    for num in (1, 3):
        q = measures.chain_quantile(ev, "user_id",
                                    ["ts", "event_id"], num, 4) \
            .withColumn("frac_num", F.lit(num).cast("int"))
        outs.append(q)
    return outs[0].unionByName(outs[1]) \
        .select("user_id", "frac_num",
                F.col("q_seq").cast("int").alias("q_seq"),
                "cum_units", "total_units")


def q_polygon_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2BooleanOperation MVP (s2boolean_operation.h:16-60):
    cell-classified intersection/union/difference/symmetric difference
    over deterministic overlapping loop pairs; exact interior leaf
    counts + boundary-band cell count per (pair, op).  The oracle
    recomputes every count with interval set algebra in SQL from the
    independently-built per-polygon decompositions."""
    from s2spark.ops import boolean as bops
    from s2spark.ops import pip
    la = pip.synth_loops(N_OVERLAY_PAIRS)
    lb = pip.synth_loops(N_OVERLAY_PAIRS, shift_u=OVERLAY_SHIFT)
    df = bops.polygon_overlay(spark, la, lb,
                              max_level=OVERLAY_MAX_LEVEL)
    return df.select("a_id", "b_id", "op", "interior_leaves",
                     "boundary_cells")


def q_polygon_overlay_exact(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """EXACT overlay interiors for ALL four ops (VERDICT r2 #2 closed):
    per (pair, op) cells are classified against the S2Builder exact
    output geometry (kernels/boolean.exact_op_counts), so ∪/Δ
    interiors include both-boundary-straddling cells and boundary_cells
    counts only cells meeting ∂(op(A,B)).  Materialized driver-kernel
    oracle; geometric truth is pinned by tests/test_boolean.py against
    the reference's published result loops (s2loop_test.cc:186-198)
    and nested/thin-lens identities."""
    from s2spark.ops import boolean as bops
    from s2spark.ops import pip
    la = pip.synth_loops(N_OVERLAY_PAIRS)
    lb = pip.synth_loops(N_OVERLAY_PAIRS, shift_u=OVERLAY_SHIFT)
    df = bops.polygon_overlay_exact(spark, la, lb,
                                    max_level=OVERLAY_MAX_LEVEL)
    return df.select("a_id", "b_id", "op", "interior_leaves",
                     "boundary_cells")


GEOM_SNAP_LEVEL = 14


def q_polygon_overlay_geom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT boolean output geometry (S2Builder snap-rounding MVP,
    kernels/builder.py; s2boolean_operation.h:16-60, s2builder.h:30-61):
    per (pair, op) the snap-rounded output vertex chains as
    (loop_idx, seq, site_cell) rows — site_cell is the level-14 snap
    site, an integer, so the oracle value-hash is tri-dialect safe.
    Chains are pinned bit-exact against the reference's published
    result loops in tests/test_builder.py; the oracle materializes the
    driver-side kernel rows."""
    from s2spark.ops import boolean as bops
    from s2spark.ops import pip
    la = pip.synth_loops(N_OVERLAY_PAIRS)
    lb = pip.synth_loops(N_OVERLAY_PAIRS, shift_u=OVERLAY_SHIFT)
    return bops.polygon_overlay_geom(spark, la, lb,
                                     snap_level=GEOM_SNAP_LEVEL)


N_MODEL_PAIRS = 9
MODEL_KINDS = ("same", "rev", "vertex")


def _model_fixture_loops():
    from s2spark.ops import boolean as bops
    la, lb = {}, {}
    for pid in range(N_MODEL_PAIRS):
        a, b = bops.shared_boundary_fixture(
            pid, MODEL_KINDS[pid % len(MODEL_KINDS)])
        la[pid], lb[pid] = a, b
    return la, lb


def q_polygon_overlay_models(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Boolean output geometry under every PolygonModel (OPEN /
    SEMI_OPEN / CLOSED, s2boolean_operation.h:131-152) over pairs
    with coincident boundary features (shared same-direction edges,
    shared reversed edges, vertex touches), including the CLOSED
    model's degenerate point/edge outputs and full/empty sentinel
    rows.  Model semantics are pinned bit-exact against the
    reference's PolygonEdge*Overlap / PolygonVertex*PolygonVertex
    fixtures (tests/test_builder_reference.py); the oracle
    materializes the driver-side kernel rows."""
    from s2spark.ops import boolean as bops
    la, lb = _model_fixture_loops()
    return bops.polygon_overlay_models(spark, la, lb,
                                       snap_level=GEOM_SNAP_LEVEL)


N_POINT_PAIRS = 8


def q_point_overlay_models(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Point layer of S2BooleanOperation under every PolygonModel:
    per (pair, model, op, probe) the survive/absorb verdict of the
    dimension rules (UNION: higher dim wins; INTERSECTION: lower dim
    wins; DIFFERENCE: points don't affect polygons) with
    model-parameterized vertex containment.  Semantics pinned against
    the reference's PointPoint / Point*Polyline / Point*Polygon
    fixture families in tests/test_layers.py; materialized
    driver-kernel oracle."""
    from s2spark.ops import boolean as bops
    return bops.point_overlay_models(spark, N_POINT_PAIRS)


N_PLPL_PAIRS = 6


def q_polyline_overlay_models(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Polyline x polyline S2BooleanOperation under every
    PolylineModel: shared same/reversed/degenerate edges, vertex
    touches with per-occurrence multiplicity, transverse crossings
    split at bit-identical intersection points, degenerate
    vertex-intersection outputs.  Semantics pinned against the
    reference's fixture families in tests/test_layers.py;
    materialized driver-kernel oracle."""
    from s2spark.ops import boolean as bops
    return bops.polyline_overlay_models(spark, N_PLPL_PAIRS)


N_MIXED_GROUPS = 6


def q_overlay_closed_set(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Mixed-dimension S2BooleanOperation (points + polylines +
    polygons in one op) with ClosedSetNormalizer output
    (s2builderutil_closed_set_normalizer.h:34-105): degenerate
    polygon shells demoted to polylines/points, degenerate holes
    discarded, degenerate polyline edges demoted to points,
    lower-dimension duplicates suppressed.  Fixtures are per-group
    rigid shifts of the reference's ComputeUnion MixedGeometry case;
    semantics pinned bit-exact against the reference's NormalizeTest
    table in tests/test_closed_set.py; materialized driver-kernel
    oracle."""
    from s2spark.ops import boolean as bops
    return bops.mixed_overlay(spark, N_MIXED_GROUPS)


def q_shape_index_covering(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """RegionCoverer coverings through S2ShapeIndexRegion (mixed
    points + polylines + polygon with degenerate features as ONE
    region) and S2ShapeIndexBufferedRegion at two radii — the
    reference's GetCovering / GetBufferedCovering idioms
    (s2shape_index_region.h:63-69,
    s2shape_index_buffered_region.h:50-57).  Buffering computes
    distance-to-geometry, not offset geometry, so a buffered point
    is exactly a cap (pinned with the cap identity + sampled
    coverage guarantees in tests/test_shape_region.py);
    materialized driver-kernel oracle."""
    from s2spark.ops import boolean as bops
    return bops.shape_covering(spark, N_MIXED_GROUPS)


def q_shape_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-level shape measures
    (s2shape_index_measures.h:32-80, s2shape_measures.h,
    s2centroids.h): max dimension, dim-0 point count, polyline
    length, polygon perimeter (shells + holes + degenerate chains),
    signed-area sum (+4pi when negative), measure-weighted centroid
    of the max-dimension shapes — over the mixed-geometry fixture
    sides.  Doubles come from the identical ordered kernel
    accumulation on both sides; identities pinned in
    tests/test_shape_measures.py."""
    from s2spark.ops import boolean as bops
    return bops.shape_measures(spark, N_MIXED_GROUPS)


def q_polygon_boundaries(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """BuildPolygonBoundaries
    (s2shapeutil_build_polygon_boundaries.h:29-66): lax loops
    organized as sphere-subdividing connected components grouped into
    polygons with disjoint interiors (islands + their lakes), nesting
    anchored at S2::Origin as the point at infinity.  Fixtures are
    rigid shifts of the reference's 12-component ComplexTest1;
    nesting pinned against the full reference test table in
    tests/test_polygon_boundaries.py; materialized driver-kernel
    oracle."""
    from s2spark.ops import boolean as bops
    return bops.polygon_boundaries(spark, N_MIXED_GROUPS)


N_WINDING_GROUPS = 6


def q_winding_geom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2WindingOperation region construction
    (s2winding_operation.h:25-120): per (group, rule) the snapped
    boundary of the region selected by the winding rule over
    self-intersecting loop sets (staircase squares + bow-ties),
    including full/empty sentinel rows.  The winding-delta /
    arrangement algorithm is pinned bit-exact against the reference's
    fixture battery (tests/test_winding.py); materialized
    driver-kernel oracle."""
    from s2spark.ops import boolean as bops
    return bops.winding_geom(spark, N_WINDING_GROUPS)


DENSITY_THRESHOLD = 64
DENSITY_MAX_LEVEL = 6
BUFFER_RADIUS = 0.04
BUFFER_MAX_LEVEL = 7
N_BUFFER_LOOPS = 8


def q_polygon_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2BufferOperation MVP (s2buffer_operation.h:16-24): per-loop
    buffered-region cell decomposition at radius 0.04 rad.  The
    oracle materializes the driver-side kernel's expected counts
    (buffer guarantees pinned by sampling tests in
    tests/test_buffer.py)."""
    from s2spark.ops import boolean as bops
    from s2spark.ops import pip
    loops = pip.synth_loops(N_BUFFER_LOOPS)
    return bops.buffer_covering(spark, loops, BUFFER_RADIUS,
                                max_level=BUFFER_MAX_LEVEL)


def q_polygon_buffer_geom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buffered OUTPUT GEOMETRY (S2BufferOperation polygon output,
    s2buffer_operation.h:16-24): per loop the offset-curve boundary
    chain (per-edge small-circle offsets + convex-vertex join arcs,
    kernels/buffer.buffer_geometry), one row per vertex, snapped to
    level-14 site cells.  Exactness pinned by tests/test_buffer.py
    (cap fixture: buffer of a spherical circle IS the grown circle)
    and the certification sandwich vs classify_buffer.  Materialized
    driver-kernel oracle."""
    from s2spark.ops import boolean as bops
    from s2spark.ops import pip
    loops = pip.synth_loops(N_BUFFER_LOOPS)
    return bops.buffer_geom(spark, loops, BUFFER_RADIUS,
                            snap_level=GEOM_SNAP_LEVEL)


def q_density_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven cell density tree (S2DensityTree analogue,
    s2density_tree.h:16-40): adaptive per-cell weights subdivided
    while over threshold — the partition/salting planner's input.
    Fully SQL-expressible (integer rollups + per-level semi-joins)."""
    from s2spark.ops import density
    ev = dataset.geotagged_events(spark, sf_dir).select("cell_id")
    return density.density_tree(ev, "cell_id",
                                threshold=DENSITY_THRESHOLD,
                                max_level=DENSITY_MAX_LEVEL) \
        .select("level", "cell", F.col("weight").cast("long")
                .alias("weight"), "is_leaf")


def _validation_fixture_rows():
    """Fixed loop set for loop_validation: 6 valid synth loops + 4
    constructed invalid ones (bowtie, duplicate vertex, 2-vertex,
    degenerate edge)."""
    import numpy as np
    from s2spark.kernels.loops import parse_vertices
    from s2spark.ops import pip
    rows = []
    for pid, lp in pip.synth_loops(6).items():
        rows.append((pid, [float(x) for x in lp.vertices.ravel()]))
    bad = [parse_vertices("0:0, 0:10, 10:0, 10:10"),
           parse_vertices("0:0, 0:10, 10:10, 0:0, 10:0"),
           parse_vertices("0:0, 0:10"),
           np.vstack([parse_vertices("0:0, 0:10, 10:10"),
                      parse_vertices("10:10")])]
    for k, v in enumerate(bad):
        rows.append((100 + k, [float(x) for x in v.ravel()]))
    return rows


def q_loop_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2ValidationQuery / S2Loop::FindValidationError analogue
    (s2loop.cc:189-260): per-loop validity verdicts over a fixed loop
    table.  Oracle materializes the driver-side kernel verdicts;
    rule coverage is pinned by tests/test_validate.py."""
    from s2spark.ops import validate
    df = spark.createDataFrame(_validation_fixture_rows(),
                               "poly_id long, vertices array<double>")
    return validate.validate_loops(df)


# s2textformat index strings spanning the reference's validation-query
# test surface (s2validation_query_test.cc:410-908): valid polygons/
# polylines/points, bad hole orientations, duplicate/crossing edges,
# nested shells, multi-dimensional collections, degenerate rings.
INDEX_VALIDATION_FIXTURES = [
    "## 1:0, 0:-1, -1:0, 0:1",
    "# 0:0, 1:0, 0:-1, -1:0, 0:1 #",
    "0:0 | 1:0 | 0:-1 | -1:0 | 0:1 ##",
    "## 2:0, 0:-2, -2:0, 0:2; 0:1, -1:0, 0:-1, 1:0",
    "## 2:0, 0:-2, -2:0, 0:2; 1:0, 0:-1, -1:0, 0:1",
    "##",
    "## full",
    "## 0:4, 3:128, 4:2, 0:0",
    "## 1:0, 0:-1, -1:0, 0:1 |  0:1, -1:2,  0:3, 1:2",
    "## 2:0, 0:-2, -2:0, 0:2 | 2:0, 0:-2,  0:0",
    "## 2:0, 0:-2, -2:0, 0:2; 0:2, -1:0, 0:-1, 1:0",
    "## 2:0,  0:-2, -2:0, 0:2; 1:0,  0:-2, -1:0, 0:2",
    "## 2:0, 0:-2, -2:0, 0:2; 2:0, 0:-1, -1:0, 0:1",
    "## 0:3, 3:0,   0:-3, -3:0; 3:2, 0:+5, -3:2,  0:-1",
    "## 0:-6, -6:0, 0:6, 6:0 ; 0:0,   3:0, 6:0, 6:3, 6:6, 3:6, 0:6, 0:3",
    "## 0:0, 10:10, 10:0; 5:21, 8:21, 6:23",
    "3:0| 0:-3| -3:0| 0:3# 2:0, 0:-2, -2:0, 0:2# 1:0, 0:-1, -1:0, 0:1",
    "0:0 ## 2:0, 0:-2, -2:0, 0:2",
    "# 0:-1, 0:1 # 2:0, 0:-2, -2:0, 0:2",
    "# 0:-1, 0:1 | 1:0, -1:0 #",
    "## 0:0",
    "## 0:0, 1:1",
    "## 3:0, 0:-3, -3:0, 0:+3; 3:0, 0:+1, -3:0, 0:-1",
    "# 0:0, 1:1, 0:2, 1:3, 0:4 | 1:0, 0:1, 1:2, 0:3, 1:4 #",
    "# 2:1, 1:0, 0:1, 1:2, 2:1 #",
    "## 2:0, 0:-2, -2:0, 0:2; 0:0, 1:1",
    "## 2:0, 0:-2, -2:0, -1:1, 0:-2, 1:1",
    "## 2:0, 2:0, 0:-2, -2:0, 0:-2",
    "# 0:0, 0:0, 1:1, 2:2 #",
]


def q_index_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2ValidQuery / S2LegacyValidQuery over a table of shape
    collections (s2validation_query.h:345-546): each row is one
    s2textformat index string validated independently under both
    query classes via a narrow mapInPandas (no shuffle).  Oracle
    materializes the driver-side kernel verdicts; the geometric truth
    of every verdict is pinned bit-for-bit by the reference-fixture
    battery in tests/test_validation_query.py."""
    from s2spark.ops import validate
    rows = [(i, g) for i, g in enumerate(INDEX_VALIDATION_FIXTURES)]
    df = spark.createDataFrame(rows, "index_id long, geometry string")
    return validate.validate_collections(df)


SNAP_LEVEL = 2
N_WINDING_SHELLS = 6
WINDING_SHIFT = 0.03


def _winding_loops():
    """6 CCW shells + 6 CW (inverted, shifted) loops whose disks
    punch holes through them — a mixed-orientation winding fixture."""
    from s2spark.kernels.loops import Loop
    from s2spark.ops import pip
    shells = pip.synth_loops(N_WINDING_SHELLS)
    cw = {pid + N_WINDING_SHELLS: Loop(lp.vertices[::-1].copy())
          for pid, lp in pip.synth_loops(N_WINDING_SHELLS,
                                         shift_u=WINDING_SHIFT).items()}
    loops = dict(shells)
    loops.update(cw)
    signs = {pid: (1 if pid < N_WINDING_SHELLS else -1)
             for pid in loops}
    return loops, signs


def q_winding_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2WindingOperation MVP (s2winding_operation.h:25-33): per-event
    winding number over a mixed-orientation loop set (shells +1, CW
    hole loops −1).  Oracle: the brute-force per-loop containment SQL
    counted per point minus the CW offset."""
    from s2spark.ops import boolean as bops
    loops, signs = _winding_loops()
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "cell_id", "x", "y", "z")
    return bops.winding_number(ev, spark, loops, point_id="event_id",
                               signs=signs)


def q_track_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapped per-user polylines (S2Builder CellIdSnapFunction slice
    / S2Polyline::InitToSnapped): vertices to level-2 cell centers,
    consecutive duplicates collapsed.  Pure bit math + windows — full
    SQL oracle."""
    from s2spark.ops import snap
    ev = dataset.geotagged_events(spark, sf_dir) \
        .select("event_id", "user_id", "ts", "cell_id")
    return snap.snap_track(ev, "user_id", ["ts", "event_id"],
                           SNAP_LEVEL)


N_TRACKS = 16
TRACK_LEN = 40
SIMPLIFY_TOL = 0.05


def _synth_tracks_pdf():
    """Deterministic SMOOTH tracks (so simplification has work to
    do): per entity, a cumulative mix-derived lat/lng walk with
    ~0.6-degree steps — shared verbatim by the Spark queries and the
    materialized oracles."""
    import numpy as np
    import pandas as pd

    from s2spark.kernels import coords
    ent = np.repeat(np.arange(N_TRACKS, dtype=np.int64), TRACK_LEN)
    seq = np.tile(np.arange(TRACK_LEN, dtype=np.int64), N_TRACKS)
    keys = ent * 100000 + seq
    dlat = ((geo.mix_np(keys, 61) % 1000).astype(np.float64)
            / 1000.0 - 0.5) * 1.2
    dlng = ((geo.mix_np(keys, 62) % 1000).astype(np.float64)
            / 1000.0 - 0.5) * 1.2
    lat = np.concatenate([np.cumsum(dlat[ent == e]) for e in
                          range(N_TRACKS)])
    lng = np.concatenate([np.cumsum(dlng[ent == e]) for e in
                          range(N_TRACKS)])
    # anchor each track at a mix-derived start
    lat0 = ((geo.mix_np(np.arange(N_TRACKS, dtype=np.int64), 63)
             % 120).astype(np.float64) - 60.0)
    lng0 = ((geo.mix_np(np.arange(N_TRACKS, dtype=np.int64), 64)
             % 360).astype(np.float64) - 180.0)
    lat = np.clip(lat + np.repeat(lat0, TRACK_LEN), -89.0, 89.0)
    lng = lng + np.repeat(lng0, TRACK_LEN)
    xs, ys, zs = coords.latlng_to_xyz(lat, lng)
    return pd.DataFrame({"user_id": ent, "ts": seq,
                         "x": xs, "y": ys, "z": zs})


TRACK_CLIP_LOOP = "0:0, 0:90, 0:179.9, 0:-90"  # northern hemisphere


def q_track_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polyline × polygon boolean op, polyline dimension (the
    reference's S2BooleanOperation over geometry collections,
    s2boolean_operation.h:16-60): each synthetic track clipped to the
    northern hemisphere (INTERSECTION keeps the inside parts; tracks
    crossing the equator split at the exact crossing points, snapped
    to the E1 grid).  Semantics pinned bit-exactly against the
    reference's own polyline fixtures in
    tests/test_builder_reference.py.  Materialized driver-kernel
    oracle."""
    from s2spark.kernels.loops import Loop, parse_vertices
    from s2spark.ops import boolean as bops
    df = spark.createDataFrame(_synth_tracks_pdf())
    loops = [Loop(parse_vertices(TRACK_CLIP_LOOP))]
    return bops.clip_tracks(df, "user_id", ["ts"], loops,
                            op="intersection")


def q_track_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-track compression (S2Polyline::SubsampleVertices,
    s2polyline.cc:560-655) over the fixed synthetic tracks.  The
    greedy tangent-wedge scan is not SQL-expressible — the oracle
    materializes the driver-side kernel (plumbing check); the scan
    itself is pinned by the reference's fixture table in
    tests/test_simplify.py."""
    df = spark.createDataFrame(_synth_tracks_pdf())
    return measures.simplify_track(df, "user_id", ["ts"],
                                   tolerance_rad=SIMPLIFY_TOL) \
        .select("user_id", F.col("kept_seq").cast("int")
                .alias("kept_seq"))


SNAP_SIMPLIFY_RADIUS = 0.02   # rad (~1.15 deg) vs ~0.6-deg steps


def q_track_snap_simplify(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """S2Builder simplify_edge_chains (s2builder.h:393-425) over the
    fixed synthetic tracks: snap-radius site selection + greedy
    chain merging under the targeted-disc tolerance guarantee.  The
    wedge algorithm is not SQL-expressible — materialized
    driver-kernel oracle (plumbing check); the algorithm itself is
    pinned bit-exact against the reference's SimplifyEdgeChains
    fixture battery in tests/test_builder_reference.py."""
    from s2spark.ops import snap as snap_ops
    df = spark.createDataFrame(_synth_tracks_pdf())
    return snap_ops.snap_simplify_track(
        df, "user_id", ["ts"], simplify_radius=SNAP_SIMPLIFY_RADIUS)


def q_track_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise trajectory similarity by exact DTW alignment cost
    (S2PolylineAlignment, s2polyline_alignment.h:16-27) over the
    fixed synthetic tracks.  The DP recurrence is not ANSI-SQL-
    expressible — materialized-kernel oracle (doubles are identical:
    the workers run the same DP); brute-force DP equality is pinned
    in tests/test_simplify.py."""
    df = spark.createDataFrame(_synth_tracks_pdf())
    pairs = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    return measures.track_alignment(df, "user_id", ["ts"], pairs)


def q_track_alignment_approx(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Windowed-approximate DTW (FastDTW, GetApproxVertexAlignment —
    s2polyline_alignment.h:140-160) next to the exact DP cost for
    every synthetic track pair.  The window machinery (warp-path
    windows, upsample, dilate) is pinned against the reference's
    private-API fixtures and the approx>=exact + medoid/consensus
    fixtures in tests/test_alignment.py.  Materialized driver-kernel
    oracle (deterministic doubles — workers run the same kernel)."""
    df = spark.createDataFrame(_synth_tracks_pdf())
    pairs = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    return measures.track_alignment_approx(df, "user_id", ["ts"],
                                           pairs, radius=2)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: disc join (tolerant spatial join) at sf0.001."""
    return q_disc_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_counts": q_tile_counts,
        "tile_rollup": q_tile_rollup,
        "tile_grouping_sets": q_tile_grouping_sets,
        "cell_equi_join": q_cell_equi_join,
        "containment_range_join": q_containment_range_join,
        "disc_join": q_disc_join,
        "knn": q_knn,
        "furthest_point": q_furthest_point,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "minhash_lsh": q_minhash_lsh,
        "dedup_groups": q_dedup_groups,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_ivf_ann": q_embedding_ivf_ann,
        "embedding_topk": q_embedding_topk,
        "embedding_lsh_ann": q_embedding_lsh_ann,
        "hausdorff": q_hausdorff,
        "track_segments": q_track_segments,
        "track_project": q_track_project,
        "edge_within": q_edge_within,
        "pip_join": q_pip_join,
        "image_meta": q_image_meta,
        "image_pipeline": q_image_pipeline,
        "audio_features": q_audio_features,
        "video_frames": q_video_frames,
        "cell_tokens": q_cell_tokens,
        "cell_vector_codec": q_cell_vector_codec,
        "polygon_codec": q_polygon_codec,
        "shape_index_codec": q_shape_index_codec,
        "shape_index_cells": q_shape_index_cells,
        "region_covering": q_region_covering,
        "region_overlap": q_region_overlap,
        "chain_midpoint": q_chain_midpoint,
        "closest_edge": q_closest_edge,
        "polygon_distance": q_polygon_distance,
        "closest_cell": q_closest_cell,
        "crossing_edges": q_crossing_edges,
        "polygon_pip": q_polygon_pip,
        "polygon_overlay": q_polygon_overlay,
        "polygon_overlay_exact": q_polygon_overlay_exact,
        "polygon_overlay_geom": q_polygon_overlay_geom,
        "polygon_overlay_models": q_polygon_overlay_models,
        "winding_geom": q_winding_geom,
        "point_overlay_models": q_point_overlay_models,
        "polyline_overlay_models": q_polyline_overlay_models,
        "overlay_closed_set": q_overlay_closed_set,
        "shape_index_covering": q_shape_index_covering,
        "polygon_boundaries": q_polygon_boundaries,
        "shape_measures": q_shape_measures,
        "convex_hull": q_convex_hull,
        "chain_interp": q_chain_interp,
        "track_simplify": q_track_simplify,
        "track_dtw": q_track_dtw,
        "track_alignment_approx": q_track_alignment_approx,
        "density_tree": q_density_tree,
        "polygon_buffer": q_polygon_buffer,
        "polygon_buffer_geom": q_polygon_buffer_geom,
        "track_clip": q_track_clip,
        "loop_validation": q_loop_validation,
        "index_validation": q_index_validation,
        "track_snap": q_track_snap,
        "track_snap_simplify": q_track_snap_simplify,
        "winding_number": q_winding_number,
        "raster_cell_map": q_raster_cell_map,
        "image_phash_near_dup": q_image_phash_near_dup,
    }


def _shingle_code_sql(s: str) -> str:
    """Mirror of text._shingle_hash: 5 x 7-bit ascii positional code."""
    parts = [f"CAST(ascii(substring({s}, 1, 1)) AS BIGINT)"]
    for k in range(1, text.SHINGLE):
        parts.append(f"CAST(ascii(substring({s}, {k + 1}, 1)) AS BIGINT)"
                     f" * {128 ** k}")
    return "(" + " + ".join(parts) + ")"


def _text_oracles() -> dict[str, str]:
    from s2spark.ops.ann import plane_weights
    mh = text.MINHASH_SALT
    shingle_expr = f"substring(text, pos, {text.SHINGLE})"
    codes_cte = (
        f"codes AS (SELECT doc_id, {_shingle_code_sql(shingle_expr)} "
        f"AS code FROM (SELECT doc_id, text, "
        f"unnest(generate_series(1, length(text) - {text.SHINGLE - 1}))"
        f" AS pos FROM documents WHERE length(text) >= {text.SHINGLE}))")
    sig_cols = ", ".join(
        f"MIN({geo.mix_sql('code', mh + j)}) AS m{j}"
        for j in range(text.N_HASHES))
    band_conds = " OR ".join(
        "(" + " AND ".join(
            f"a.m{b * text.ROWS_PER_BAND + r} = b.m{b * text.ROWS_PER_BAND + r}"
            for r in range(text.ROWS_PER_BAND)) + ")"
        for b in range(text.BANDS))
    sig_matches = " + ".join(
        f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END"
        for j in range(text.N_HASHES))

    # lang_id: mirror the iterative argmax exactly (first-wins on ties)
    langs = list(text.LANG_MARKERS)
    occ_terms = {}
    for lang, words in text.LANG_MARKERS.items():
        terms = []
        for w in words:
            tok = f" {w} "
            p = "(' ' || text || ' ')"
            terms.append(
                f"CAST((length({p}) - length(replace({p}, '{tok}', '')))"
                f" / {len(tok)} AS BIGINT)")
        occ_terms[lang] = "(" + " + ".join(terms) + ")"
    pred_sql, best_sql = f"'{langs[0]}'", f"score_{langs[0]}"
    for lang in langs[1:]:
        s = f"score_{lang}"
        pred_sql = (f"CASE WHEN {s} > {best_sql} THEN '{lang}' "
                    f"ELSE {pred_sql} END")
        best_sql = (f"CASE WHEN {s} > {best_sql} THEN {s} "
                    f"ELSE {best_sql} END")

    # simhash: 16 vote sums then bit reassembly
    tok_code = _shingle_code_sql(f"rpad(tok, {text.SHINGLE}, ' ')")
    h_sql = geo.mix_sql(tok_code, text.SIMHASH_SALT)
    vote_cols = ", ".join(
        f"SUM((((h >> {b}) & 1) * 2 - 1)) AS s{b}"
        for b in range(text.SIMHASH_BITS))
    sim_expr = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END"
        for b in range(text.SIMHASH_BITS))

    # embeddings: doubles-fold dot products (bit-exact with Spark's
    # aggregate(zip_with) — verified)
    emb_cte = ("v AS (SELECT vec_id, list_transform(embedding, "
               "x -> CAST(x AS DOUBLE)) AS e FROM embeddings), "
               "n AS (SELECT vec_id, e, list_dot_product(e, e) AS n2 "
               "FROM v)")
    # banded pair-LSH (mirrors ann.band_col: N_PAIR_BANDS bands of
    # BAND_BITS sign bits over the same planes)
    from s2spark.ops.ann import BAND_BITS, N_PAIR_BANDS, lsh_bits_sql
    band_sqls = []
    for b in range(N_PAIR_BANDS):
        terms = []
        for j in range(BAND_BITS):
            w = ", ".join("%.1f" % float(x)
                          for x in plane_weights(b * BAND_BITS + j))
            terms.append(f"(CASE WHEN list_dot_product(e, [{w}]) > 0 "
                         f"THEN {1 << j} ELSE 0 END)")
        band_sqls.append("(" + " + ".join(terms) + ")")
    band_defs = ", ".join(f"{s} AS b{i}" for i, s in enumerate(band_sqls))
    band_match = " OR ".join(f"a.b{i} = b.b{i}"
                             for i in range(N_PAIR_BANDS))
    # lsh_ann: same bands masked to the corpus-calibrated key width
    lsh_bits_ladder = lsh_bits_sql("SELECT * FROM embeddings")
    band_match_masked = " OR ".join(
        f"(a.b{i} & mm.mask) = (b.b{i} & mm.mask)"
        for i in range(N_PAIR_BANDS))

    return {
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, CAST(COUNT(*) AS BIGINT) AS "
            "n_docs, MIN(doc_id) AS keep_doc_id FROM documents GROUP BY 1"),
        "token_stats": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
            "AS n_tokens, CAST(length(text) AS BIGINT) AS len_chars, "
            "CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) "
            "AS chars_per_token FROM documents"),
        "quality_score": (
            "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS "
            "tok FROM documents), a AS (SELECT doc_id, CAST(COUNT(*) AS "
            "BIGINT) AS n_tokens, CAST(COUNT(DISTINCT tok) AS BIGINT) AS "
            "n_distinct FROM t GROUP BY 1) SELECT doc_id, n_tokens, "
            "n_distinct, CAST(n_distinct AS DOUBLE) / n_tokens AS ttr, "
            "CASE WHEN n_tokens >= 32 AND CAST(n_distinct AS DOUBLE) / "
            "n_tokens >= 0.25 THEN 'high' WHEN n_tokens >= 16 THEN "
            "'medium' ELSE 'low' END AS quality FROM a"),
        "lang_id": (
            "WITH s AS (SELECT doc_id, "
            + ", ".join(f"{occ_terms[lg]} AS score_{lg}" for lg in langs)
            + " FROM documents) SELECT doc_id, "
            + ", ".join(f"score_{lg}" for lg in langs)
            + f", {pred_sql} AS pred_lang FROM s"),
        "doc_fingerprint": (
            f"WITH {codes_cte}, hv AS (SELECT doc_id, "
            f"{geo.mix_sql('code', mh)} AS h FROM codes) "
            f"SELECT doc_id, CAST(COUNT(DISTINCT h) AS BIGINT) AS "
            f"n_shingles, MIN(h) AS min_hash, MAX(h) AS max_hash "
            f"FROM hv GROUP BY doc_id"),
        "minhash_lsh": (
            f"WITH {codes_cte}, sig AS (SELECT doc_id, {sig_cols} "
            f"FROM codes GROUP BY doc_id) "
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            f"CAST({sig_matches} AS BIGINT) AS sig_matches "
            f"FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            f"AND ({band_conds})"),
        "dedup_groups": (
            f"WITH RECURSIVE {codes_cte}, "
            f"sig AS (SELECT doc_id, {sig_cols} FROM codes "
            f"GROUP BY doc_id), "
            f"p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
            f"FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            f"AND ({band_conds})), "
            f"e AS (SELECT doc_a AS src, doc_b AS dst FROM p "
            f"UNION SELECT doc_b, doc_a FROM p), "
            f"n AS (SELECT DISTINCT src AS doc_id FROM e), "
            f"r AS (SELECT doc_id AS doc, doc_id AS label FROM n "
            f"UNION SELECT e.dst, r.label FROM r JOIN e "
            f"ON e.src = r.doc), "
            f"g AS (SELECT doc, MIN(label) AS group_id FROM r "
            f"GROUP BY 1), "
            f"s AS (SELECT group_id, COUNT(*) AS group_size FROM g "
            f"GROUP BY 1) "
            f"SELECT g.doc AS doc_id, g.group_id, "
            f"CAST(s.group_size AS BIGINT) AS group_size "
            f"FROM g JOIN s USING (group_id)"),
        "simhash": (
            f"WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            f"AS tok FROM documents), hv AS (SELECT doc_id, {h_sql} AS h "
            f"FROM toks), pb AS (SELECT doc_id, {vote_cols} FROM hv "
            f"GROUP BY doc_id) SELECT doc_id, CAST({sim_expr} AS BIGINT) "
            f"AS simhash FROM pb"),
        "ngram_jaccard": (
            f"WITH {codes_cte}, "
            f"dcodes AS (SELECT DISTINCT doc_id, code FROM codes), "
            f"sizes AS (SELECT doc_id, COUNT(*) AS n FROM dcodes "
            f"GROUP BY 1), "
            f"sig AS (SELECT doc_id, {sig_cols} FROM codes "
            f"GROUP BY doc_id), "
            f"cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
            f"FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            f"AND ({band_conds})), "
            f"i AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter "
            f"FROM cand c JOIN dcodes x ON x.doc_id = c.doc_a "
            f"JOIN dcodes y ON y.doc_id = c.doc_b AND y.code = x.code "
            f"GROUP BY 1, 2) "
            f"SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS inter, "
            f"CAST(sa.n + sb.n - i.inter AS BIGINT) AS union_n, "
            f"CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS "
            f"jaccard FROM i JOIN sizes sa ON sa.doc_id = i.doc_a "
            f"JOIN sizes sb ON sb.doc_id = i.doc_b "
            f"WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) "
            f">= 0.35"),
        "embedding_near_dup": (
            f"WITH {emb_cte}, bd AS (SELECT vec_id, {band_defs} FROM n), "
            f"cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b "
            f"FROM bd a JOIN bd b ON a.vec_id < b.vec_id "
            f"AND ({band_match})) "
            f"SELECT c.id_a, c.id_b, "
            f"list_dot_product(x.e, y.e) / (sqrt(x.n2) * sqrt(y.n2)) AS "
            f"cos_sim FROM cand c JOIN n x ON x.vec_id = c.id_a "
            f"JOIN n y ON y.vec_id = c.id_b "
            f"WHERE list_dot_product(x.e, y.e) / (sqrt(x.n2) * sqrt(y.n2))"
            f" >= 0.4"),
        "embedding_ivf_ann": (
            f"WITH {emb_cte}, "
            # bounded-|centroids| stride: ceil(n/64), mirrors
            # ann.centroid_stride (GREATEST guards the empty table)
            f"cent AS (SELECT vec_id AS cid, e AS ce, n2 AS cn FROM n "
            f"WHERE vec_id % (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / "
            f"64.0) AS BIGINT)) FROM embeddings) = 0), "
            f"asg AS (SELECT vec_id, ve, vn, cid FROM ("
            f"SELECT p.vec_id, p.e AS ve, p.n2 AS vn, c.cid, "
            f"ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY "
            f"list_dot_product(p.e, c.ce) / (sqrt(p.n2) * sqrt(c.cn)) "
            f"DESC, c.cid) AS r FROM n p, cent c) WHERE r = 1), "
            f"q AS (SELECT vec_id AS qid, e AS qe, n2 AS qn FROM n "
            f"WHERE vec_id % 20 = 0), "
            f"pr AS (SELECT qid, qe, qn, cid FROM ("
            f"SELECT q.qid, q.qe, q.qn, c.cid, "
            f"ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            f"list_dot_product(q.qe, c.ce) / (sqrt(q.qn) * sqrt(c.cn)) "
            f"DESC, c.cid) AS r FROM q, cent c) WHERE r <= 4), "
            f"s AS (SELECT pr.qid, a.vec_id, "
            f"list_dot_product(pr.qe, a.ve) / (sqrt(pr.qn) * sqrt(a.vn))"
            f" AS cos_sim FROM pr JOIN asg a USING (cid) "
            f"WHERE pr.qid != a.vec_id), "
            f"r AS (SELECT qid, vec_id, cos_sim, CAST(ROW_NUMBER() OVER "
            f"(PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS "
            f"INTEGER) AS rank FROM s) SELECT * FROM r WHERE rank <= 5"),
        "embedding_topk": (
            f"WITH {emb_cte}, q AS (SELECT vec_id AS qid, e AS qe, n2 AS "
            f"qn FROM n WHERE vec_id % 20 = 0), s AS (SELECT q.qid, "
            f"p.vec_id, list_dot_product(qe, p.e) / (sqrt(qn) * "
            f"sqrt(p.n2)) AS cos_sim FROM n p, q WHERE q.qid != p.vec_id),"
            f" r AS (SELECT qid, vec_id, cos_sim, CAST(ROW_NUMBER() OVER "
            f"(PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS INTEGER)"
            f" AS rank FROM s) SELECT * FROM r WHERE rank <= 5"),
        "embedding_lsh_ann": (
            # multi-table LSH with the corpus-calibrated key width:
            # mask = 2^lsh_bits(COUNT(*)) - 1 via the integer ladder
            # (ann.lsh_bits_sql), band values masked per table, the
            # same-table-same-key OR-match mirrors the Spark
            # (table, key) equi-joins, candidates deduped by DISTINCT
            f"WITH {emb_cte}, bd AS (SELECT vec_id, {band_defs} FROM n), "
            f"mm AS (SELECT (CAST(1 AS BIGINT) << {lsh_bits_ladder}) - 1 "
            f"AS mask), "
            f"q AS (SELECT vec_id AS qid FROM embeddings "
            f"WHERE vec_id % 20 = 0), "
            f"cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id "
            f"FROM bd a JOIN q ON q.qid = a.vec_id, bd b, mm "
            f"WHERE a.vec_id != b.vec_id AND ({band_match_masked})), "
            f"s AS (SELECT c.qid, c.vec_id, "
            f"list_dot_product(x.e, y.e) / (sqrt(x.n2) * sqrt(y.n2)) AS "
            f"cos_sim FROM cand c JOIN n x ON x.vec_id = c.qid "
            f"JOIN n y ON y.vec_id = c.vec_id), "
            f"r AS (SELECT qid, vec_id, cos_sim,"
            f" CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim "
            f"DESC, vec_id) AS INTEGER) AS rank FROM s) "
            f"SELECT * FROM r WHERE rank <= 5"),
    }


def _f17(v) -> str:
    """%.17e round-trips IEEE doubles exactly AND (because of the
    exponent) DuckDB parses it directly as DOUBLE — plain decimal
    literals go through DECIMAL first, which double-rounds the low
    bits and overflows scale 38 under multiplication."""
    return "%.17e" % float(v)


def _det_sql(a, b, c) -> str:
    """(a x b) . c with the exact operation order of
    predicates.triage_sign (left-assoc sum of three products)."""
    ax, ay, az = a
    bx, by, bz = b
    cx, cy, cz = c
    return (f"(({ay}*{bz} - {az}*{by})*{cx} "
            f"+ ({az}*{bx} - {ax}*{bz})*{cy} "
            f"+ ({ax}*{by} - {ay}*{bx})*{cz})")


def _edges_values(loops, cols=("ax", "ay", "az", "bx", "by", "bz")) -> str:
    """VALUES table of loop edges: (poly_id, edge_id, *cols)."""
    rows = []
    for pid in sorted(loops):
        lp = loops[pid]
        v = lp.vertices
        for e in range(lp.n):
            a, b = v[e], v[(e + 1) % lp.n]
            rows.append(
                f"({pid}, {e}, {_f17(a[0])}, {_f17(a[1])}, {_f17(a[2])},"
                f" {_f17(b[0])}, {_f17(b[1])}, {_f17(b[2])})")
    return ("(VALUES " + ", ".join(rows) + ") AS _e(poly_id, edge_id, "
            + ", ".join(cols) + ")")


def _crossing_flag_sql(a, b, c, d) -> str:
    """CrossingSign > 0 as SQL over the 4 triage determinants: the
    crossing verdict equals the kernel's whenever no det falls inside
    the +-kMaxDetError escalation band (verified for the fixture data
    at sf0.01 and sf0.1 — the synthetic geometry keeps every det far
    from the bound)."""
    s = {}
    for name, (p, q, r) in {"sa": (a, b, c), "sb": (a, b, d),
                            "sc": (c, d, b), "sd": (c, d, a)}.items():
        s[name] = f"(CASE WHEN {_det_sql(p, q, r)} > 0 THEN 1 ELSE -1 END)"
    return (f"({s['sb']} = -{s['sa']} AND {s['sc']} = {s['sa']} "
            f"AND {s['sd']} = -{s['sa']})")


def _pip_inside_sql(points_sql: str, point_id: str, loops) -> str:
    """CTE chain: (point_id, poly_id) rows for points inside loops —
    brute-force origin->point crossing parity (Loop.contains_points
    semantics), an INDEPENDENT check of the Spark side's indexed
    cell-parity plan."""
    from s2spark.kernels.loops import ORIGIN
    o = tuple(_f17(v) for v in ORIGIN)
    ev = _edges_values(loops, cols=("cx", "cy", "cz", "dx", "dy", "dz"))
    li = ", ".join(f"({pid}, {str(bool(loops[pid].origin_inside)).upper()})"
                   for pid in sorted(loops))
    p = ("x", "y", "z")
    c = ("cx", "cy", "cz")
    d = ("dx", "dy", "dz")
    crossing = _crossing_flag_sql(o, p, c, d)
    return (
        f"pts AS (SELECT {point_id}, x, y, z FROM {points_sql}), "
        f"ed AS (SELECT * FROM {ev}), "
        f"li AS (SELECT * FROM (VALUES {li}) AS _l(poly_id, "
        f"origin_inside)), "
        f"par AS (SELECT {point_id}, poly_id, "
        f"SUM(CASE WHEN {crossing} THEN 1 ELSE 0 END) % 2 AS parity "
        f"FROM pts, ed GROUP BY 1, 2), "
        f"ins AS (SELECT {point_id}, CAST(par.poly_id AS BIGINT) AS "
        f"poly_id FROM par JOIN li ON par.poly_id = li.poly_id "
        f"WHERE (par.parity = 1) <> li.origin_inside)")


def _seg_chord2_cte(pairs_sql: str, keep: str) -> str:
    """CTE chain computing kernels.edges.point_segment_chord2 with the
    identical double operation order: input relation must provide
    (x,y,z) point and (ax..az, bx..bz) segment columns."""
    return (
        f"n1 AS (SELECT {keep}, x, y, z, ax, ay, az, bx, by, bz, "
        f"(ay*bz - az*by) AS nx, (az*bx - ax*bz) AS ny, "
        f"(ax*by - ay*bx) AS nz FROM {pairs_sql}), "
        f"n2 AS (SELECT {keep}, x, y, z, ax, ay, az, bx, by, bz, "
        f"nx, ny, nz, (nx*nx + ny*ny + nz*nz) AS nn, "
        f"(x*nx + y*ny + z*nz) AS pn, "
        f"((ny*az - nz*ay)*x + (nz*ax - nx*az)*y + (nx*ay - ny*ax)*z) "
        f"AS w1, "
        f"((by*nz - bz*ny)*x + (bz*nx - bx*nz)*y + (bx*ny - by*nx)*z) "
        f"AS w2, "
        f"((x-ax)*(x-ax) + (y-ay)*(y-ay) + (z-az)*(z-az)) AS d2a, "
        f"((x-bx)*(x-bx) + (y-by)*(y-by) + (z-bz)*(z-bz)) AS d2b "
        f"FROM n1), "
        f"n3 AS (SELECT {keep}, w1, w2, d2a, d2b, "
        f"LEAST(GREATEST((pn*pn)/nn, 0.0), 1.0) AS sin2 FROM n2), "
        f"n4 AS (SELECT {keep}, w1, w2, d2a, d2b, "
        f"(2.0 - 2.0*sqrt(LEAST(GREATEST(1.0 - sin2, 0.0), 1.0))) AS "
        f"perp, LEAST(d2a, d2b) AS ends FROM n3), "
        f"dist AS (SELECT {keep}, CASE WHEN w1 > 0 AND w2 > 0 "
        f"THEN LEAST(perp, ends) ELSE ends END AS dist2 FROM n4)")


def _geometry_oracles() -> dict[str, str]:
    """Oracles for the formerly rows-only geometry queries: loop
    geometry is materialized as VALUES literals (%.17g doubles, bit
    round-trip) and the chord^2 / crossing predicates re-expressed in
    SQL with the kernel's exact double operation order.  The SQL side
    is brute force (it is an oracle, not a plan) — which independently
    validates the Spark side's INDEXED plans."""
    from s2spark.ops import pip as _pip

    ev_geo = _geo_view("events", "event_id")
    cu_geo = _geo_view("customer", "c_custkey")

    # --- closest_edge: brute-force min over all edges ---
    loops15 = _pip.synth_loops(15)
    e15 = _edges_values(loops15)
    pairs = (f"(SELECT p.event_id, p.x, p.y, p.z, _e.poly_id, "
             f"_e.edge_id, _e.ax, _e.ay, _e.az, _e.bx, _e.by, _e.bz "
             f"FROM (SELECT * FROM {ev_geo} WHERE event_id % 20 = 0) p, "
             f"{e15})")
    keep = "event_id, poly_id, edge_id"
    closest = (
        f"WITH {_seg_chord2_cte(pairs, keep)}, "
        f"r AS (SELECT event_id, CAST(poly_id AS BIGINT) AS poly_id, "
        f"CAST(edge_id AS BIGINT) AS edge_id, dist2, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY "
        f"dist2, poly_id, edge_id) AS INTEGER) AS rank FROM dist) "
        f"SELECT * FROM r WHERE rank <= 1")

    # --- polygon_distance: brute edge-min UNION interior parity rows,
    # radius-filtered (Options include_interiors + max_distance;
    # s2closest_edge_query.h:75-135) ---
    from s2spark.ops.edges import _angle_chord2 as _a2
    maxd2 = _a2(POLY_DIST_MAX)
    pairs_pd = (f"(SELECT p.event_id, p.x, p.y, p.z, _e.poly_id, "
                f"_e.edge_id, _e.ax, _e.ay, _e.az, _e.bx, _e.by, _e.bz "
                f"FROM (SELECT * FROM {ev_geo} WHERE event_id % 10 = 3)"
                f" p, {e15})")
    pts_pd = f"(SELECT * FROM {ev_geo} WHERE event_id % 10 = 3)"
    polygon_distance = (
        f"WITH {_seg_chord2_cte(pairs_pd, keep)}, "
        f"{_pip_inside_sql(pts_pd, 'event_id', loops15)}, "
        f"allr AS ("
        f"SELECT event_id, CAST(poly_id AS BIGINT) AS poly_id, "
        f"CAST(edge_id AS BIGINT) AS edge_id, dist2 FROM dist "
        f"WHERE dist2 <= {_f17(maxd2)} "
        f"UNION ALL "
        f"SELECT event_id, CAST(poly_id AS BIGINT) AS poly_id, "
        f"CAST(-1 AS BIGINT) AS edge_id, CAST(0.0 AS DOUBLE) AS dist2 "
        f"FROM ins), "
        f"r AS (SELECT event_id, poly_id, edge_id, dist2, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY "
        f"dist2, poly_id, edge_id) AS INTEGER) AS rank FROM allr) "
        f"SELECT * FROM r WHERE rank <= 1")

    # --- track_project: brute argmin segment over per-user tracks ---
    ev_track = geo.geo_table_sql(
        "events", dataset.geo_key_sql("event_id", "events"),
        ["event_id", "user_id", "ts"])
    eseg = (f"(SELECT poly_id, edge_id, ax, ay, az, bx, by, bz FROM "
            f"(SELECT user_id AS poly_id, "
            f"CAST(ROW_NUMBER() OVER win - 1 AS BIGINT) AS edge_id, "
            f"x AS ax, y AS ay, z AS az, LEAD(x) OVER win AS bx, "
            f"LEAD(y) OVER win AS by, LEAD(z) OVER win AS bz "
            f"FROM (SELECT * FROM {ev_track} WHERE user_id % 10 = 0) "
            f"WINDOW win AS "
            f"(PARTITION BY user_id ORDER BY ts, event_id)) "
            f"WHERE bx IS NOT NULL)")
    pairs_tp = (f"(SELECT p.c_custkey, p.x, p.y, p.z, e.poly_id, "
                f"e.edge_id, e.ax, e.ay, e.az, e.bx, e.by, e.bz FROM "
                f"(SELECT c_custkey, x, y, z FROM {cu_geo} "
                f"WHERE c_custkey % 20 = 0) p, {eseg} e)")
    track_project = (
        f"WITH {_seg_chord2_cte(pairs_tp, 'c_custkey, poly_id, edge_id')}, "
        f"r AS (SELECT c_custkey, CAST(poly_id AS BIGINT) AS user_id, "
        f"CAST(edge_id AS BIGINT) AS edge_id, dist2, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY "
        f"dist2, poly_id, edge_id) AS INTEGER) AS rank FROM dist) "
        f"SELECT * FROM r WHERE rank <= 1")

    # --- edge_within: brute edge-pair min chord² over all pairs ---
    # UpdateEdgePairMinDistance re-expressed in SQL: per pair, the MIN
    # of the four endpoint-to-other-segment chord² (each via the
    # tri-dialect _seg_chord2_cte, identical double op order), with
    # crossing pairs overridden to exactly 0.0 — then the same
    # max_distance filter + (dist2, poly_id, edge_id) rank as Spark.
    e15w = _edges_values(loops15, cols=("cx", "cy", "cz",
                                        "dx", "dy", "dz"))
    import math as _mm
    ew_r2 = _f17((2.0 * _mm.sin(0.5 * EDGE_WITHIN_RADIUS)) ** 2)
    ew_keep = "user_id, seq, t_poly, t_edge"
    ew_base = (
        f"SELECT s.poly_id AS user_id, s.edge_id AS seq, "
        f"_e.poly_id AS t_poly, _e.edge_id AS t_edge, "
        f"s.ax, s.ay, s.az, s.bx, s.by, s.bz, "
        f"_e.cx, _e.cy, _e.cz, _e.dx, _e.dy, _e.dz "
        f"FROM {eseg} s, {e15w}")
    ew_roles = " UNION ALL ".join(
        f"SELECT {ew_keep}, {px} AS x, {py} AS y, {pz} AS z, "
        f"{sa} AS ax, {sb} AS ay, {sc} AS az, "
        f"{sd} AS bx, {se} AS by, {sf_} AS bz FROM ewb"
        for (px, py, pz, sa, sb, sc, sd, se, sf_) in (
            ("ax", "ay", "az", "cx", "cy", "cz", "dx", "dy", "dz"),
            ("bx", "by", "bz", "cx", "cy", "cz", "dx", "dy", "dz"),
            ("cx", "cy", "cz", "ax", "ay", "az", "bx", "by", "bz"),
            ("dx", "dy", "dz", "ax", "ay", "az", "bx", "by", "bz")))
    ew_crx = _crossing_flag_sql(("ax", "ay", "az"), ("bx", "by", "bz"),
                                ("cx", "cy", "cz"), ("dx", "dy", "dz"))
    edge_within = (
        f"WITH ewb AS ({ew_base}), roles AS ({ew_roles}), "
        f"{_seg_chord2_cte('roles', ew_keep)}, "
        f"m AS (SELECT {ew_keep}, MIN(dist2) AS mind FROM dist "
        f"GROUP BY 1, 2, 3, 4), "
        f"cr AS (SELECT {ew_keep} FROM ewb WHERE {ew_crx}), "
        f"fin AS (SELECT m.user_id, m.seq, m.t_poly, m.t_edge, "
        f"CASE WHEN cr.user_id IS NOT NULL THEN CAST(0 AS DOUBLE) "
        f"ELSE m.mind END AS dist2 FROM m LEFT JOIN cr "
        f"USING (user_id, seq, t_poly, t_edge)), "
        f"flt AS (SELECT * FROM fin WHERE dist2 <= {ew_r2}) "
        f"SELECT CAST(user_id AS BIGINT) AS user_id, "
        f"CAST(seq AS BIGINT) AS seq, "
        f"CAST(t_poly AS BIGINT) AS poly_id, "
        f"CAST(t_edge AS BIGINT) AS edge_id, dist2, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY user_id, seq "
        f"ORDER BY dist2, t_poly, t_edge) AS INTEGER) AS rank "
        f"FROM flt")

    # --- crossing_edges: brute-force CrossingSign over all pairs ---
    e15x = _edges_values(loops15, cols=("cx", "cy", "cz",
                                        "dx", "dy", "dz"))
    a = ("qe.ax", "qe.ay", "qe.az")
    b = ("qe.bx", "qe.by", "qe.bz")
    c = ("_e.cx", "_e.cy", "_e.cz")
    d = ("_e.dx", "_e.dy", "_e.dz")
    crossing = (
        f"WITH q AS (SELECT c_custkey AS qedge_id, x AS ax, y AS ay, "
        f"z AS az, LEAD(x) OVER w AS bx, LEAD(y) OVER w AS by, "
        f"LEAD(z) OVER w AS bz FROM (SELECT * FROM {cu_geo} "
        f"WHERE c_custkey <= 60) WINDOW w AS (ORDER BY c_custkey)), "
        f"qe AS (SELECT * FROM q WHERE bx IS NOT NULL) "
        f"SELECT qe.qedge_id, CAST(_e.poly_id AS BIGINT) AS poly_id, "
        f"CAST(_e.edge_id AS BIGINT) AS edge_id, "
        f"CAST(1 AS INTEGER) AS crossing_sign "
        f"FROM qe, {e15x} WHERE {_crossing_flag_sql(a, b, c, d)}")

    # --- pip_join: origin->point crossing parity vs 25 loops ---
    loops25 = _pip.synth_loops(25)
    pip_sql = (f"WITH {_pip_inside_sql(f'({ev_geo})', 'event_id', loops25)} "
               f"SELECT event_id, poly_id FROM ins")

    # --- polygon_pip: even-odd over 12 shell+hole polygons ---
    base = _pip.synth_loops(12)
    holes = _pip.synth_loops(24)
    flat, owners = {}, []
    nid = 0
    for pgid in range(12):
        for lp in (base[pgid], holes[pgid + 12]):
            flat[nid] = lp
            owners.append(f"({nid}, {pgid})")
            nid += 1
    poly_sql = (
        f"WITH {_pip_inside_sql(f'({ev_geo})', 'event_id', flat)}, "
        f"own AS (SELECT * FROM (VALUES {', '.join(owners)}) AS "
        f"_o(poly_id, polygon_id)), "
        f"cnt AS (SELECT event_id, CAST(polygon_id AS BIGINT) AS "
        f"polygon_id, COUNT(*) AS n FROM ins JOIN own "
        f"ON ins.poly_id = own.poly_id GROUP BY 1, 2) "
        f"SELECT event_id, polygon_id FROM cnt WHERE n % 2 = 1")

    # --- region_covering: driver-kernel materialized expected rows ---
    # The greedy best-first coverer is not SQL-expressible; the oracle
    # materializes the NumPy kernel's per-cap covering stats (the same
    # kernel the Spark UDF calls — this validates the distributed
    # plumbing end-to-end; covering VALUES themselves are pinned
    # independently by tests/test_coverer.py fixtures).
    import math as _m
    import numpy as _np
    from s2spark.kernels import cellid as _ci
    from s2spark.kernels.coverer import RegionCoverer as _RC
    from s2spark.kernels.region import Cap as _Cap
    r2cap = (2.0 * _m.sin(0.5 * DISC_RADIUS_RAD)) ** 2
    keys = _np.arange(N_COVER_CAPS, dtype=_np.int64)
    xs, ys, zs = geo.xyz_np(keys)
    rc = _RC(max_cells=8, min_level=2, max_level=16)
    cov_rows = []
    for cid in range(N_COVER_CAPS):
        cov = rc.get_covering(_Cap((xs[cid], ys[cid], zs[cid]), r2cap))
        lsbs = _ci.lsb(cov)
        cov_rows.append(f"({cid}, {len(cov)}, {int(lsbs.sum())})")
    covering = (
        f"SELECT CAST(cap_id AS BIGINT) AS cap_id, "
        f"CAST(n_cells AS BIGINT) AS n_cells, "
        f"CAST(leaf_cells AS BIGINT) AS leaf_cells FROM (VALUES "
        + ", ".join(cov_rows) + ") AS _c(cap_id, n_cells, leaf_cells)")

    # --- region_overlap: coverings materialized, overlap recomputed
    # INDEPENDENTLY via Hilbert range containment (two unions
    # intersect iff one cell contains the other — interval algebra on
    # range_min/range_max, not the term-join the engine runs) ---
    r2b_cap = (2.0 * _m.sin(0.5 * DISC_RADIUS_RAD
                            * OVL_B_RADIUS_MULT)) ** 2
    ka = _np.arange(N_OVL_A, dtype=_np.int64)
    kb = _np.arange(OVL_B_BASE, OVL_B_BASE + N_OVL_B,
                    dtype=_np.int64)
    axs, ays, azs = geo.xyz_np(ka)
    bxs, bys, bzs = geo.xyz_np(kb)
    a_rows, b_rows = [], []
    for i in range(N_OVL_A):
        for c in _ci.as_i64(rc.get_covering(
                _Cap((axs[i], ays[i], azs[i]), r2cap))):
            a_rows.append(f"({i}, {int(c)})")
    for i in range(N_OVL_B):
        for c in _ci.as_i64(rc.get_covering(
                _Cap((bxs[i], bys[i], bzs[i]), r2b_cap))):
            b_rows.append(f"({OVL_B_BASE + i}, {int(c)})")
    region_overlap = (
        f"WITH ac(a_id, cell) AS (VALUES {', '.join(a_rows)}), "
        f"bc(b_id, cell) AS (VALUES {', '.join(b_rows)}), "
        f"ar AS (SELECT a_id, cell - ((cell & (-cell)) - 1) AS rmin, "
        f"cell + ((cell & (-cell)) - 1) AS rmax FROM ac), "
        f"br AS (SELECT b_id, cell - ((cell & (-cell)) - 1) AS rmin, "
        f"cell + ((cell & (-cell)) - 1) AS rmax FROM bc) "
        f"SELECT DISTINCT CAST(a_id AS BIGINT) AS a_id, "
        f"CAST(b_id AS BIGINT) AS b_id FROM ar, br "
        f"WHERE (ar.rmin <= br.rmin AND br.rmax <= ar.rmax) "
        f"OR (br.rmin <= ar.rmin AND ar.rmax <= br.rmax)")

    # --- polygon_overlay: interval set algebra over the per-polygon
    # exact decompositions (INDEPENDENT single-loop recursion; the
    # Spark side runs the pairwise classification).  Leaf-set algebra:
    #   inter = |IA∩IB|; union = |IA|+|IB|-inter;
    #   diff  = |IA|-inter-|IA∩bandB|;
    #   symd  = |IA|+|IB|-2*inter-|IA∩bandB|-|IB∩bandA|;
    #   boundary cells = |bandA|+|bandB|-|bandA∩bandB|.
    # (identities proven leaf-by-leaf in kernels/boolean.py docstring
    # and tests/test_boolean.py.)
    from s2spark.kernels import boolean as _bk
    from s2spark.kernels import cellid as _ck

    def _iv_rows(pid: int, ids: _np.ndarray) -> list[str]:
        u = ids.view(_np.uint64)
        lo = _ck.as_i64(_ck.range_min(u))
        hi = _ck.as_i64(_ck.range_max(u))
        return [f"({pid}, {int(a)}, {int(b)})" for a, b in zip(lo, hi)]

    ia_rows, ib_rows, ba_rows, bb_rows = [], [], [], []
    all_a = _pip.synth_loops(N_OVERLAY_PAIRS)
    all_b = _pip.synth_loops(N_OVERLAY_PAIRS, shift_u=OVERLAY_SHIFT)
    for pid in range(N_OVERLAY_PAIRS):
        i_a, b_a = _bk.classify_loop(all_a[pid], OVERLAY_MAX_LEVEL)
        i_b, b_b = _bk.classify_loop(all_b[pid], OVERLAY_MAX_LEVEL)
        ia_rows += _iv_rows(pid, i_a)
        ib_rows += _iv_rows(pid, i_b)
        ba_rows += _iv_rows(pid, b_a)
        bb_rows += _iv_rows(pid, b_b)

    def _iv(rows: list[str], name: str) -> str:
        body = ", ".join(rows) if rows else "(-1, 0, -1)"
        return (f"{name} AS (SELECT * FROM (VALUES {body}) AS "
                f"_{name}(poly, lo, hi))")

    def _ovl(x: str, y: str, name: str) -> str:
        return (f"{name} AS (SELECT x.poly, "
                f"SUM((LEAST(x.hi, y.hi) - GREATEST(x.lo, y.lo)) // 2 "
                f"+ 1) AS n FROM {x} x JOIN {y} y ON x.poly = y.poly "
                f"AND GREATEST(x.lo, y.lo) <= LEAST(x.hi, y.hi) "
                f"GROUP BY 1)")

    def _tot(x: str, name: str) -> str:
        return (f"{name} AS (SELECT poly, SUM((hi - lo) // 2 + 1) AS n, "
                f"COUNT(*) AS c FROM {x} GROUP BY 1)")

    pair_list = ", ".join(f"({k})" for k in range(N_OVERLAY_PAIRS))
    ops_select = " UNION ALL ".join([
        ("SELECT poly, 'intersection' AS op, ni AS interior_leaves, "
         "bc AS boundary_cells FROM base"),
        ("SELECT poly, 'union', na + nb - ni, bc FROM base"),
        ("SELECT poly, 'difference', na - ni - nab, bc FROM base"),
        ("SELECT poly, 'symmetric_difference', "
         "na + nb - 2*ni - nab - nba, bc FROM base"),
    ])
    overlay = (
        "WITH " + ", ".join([
            _iv(ia_rows, "ia"), _iv(ib_rows, "ib"),
            _iv(ba_rows, "ba"), _iv(bb_rows, "bb"),
            _tot("ia", "sa"), _tot("ib", "sb"),
            _tot("ba", "ta"), _tot("bb", "tb"),
            _ovl("ia", "ib", "ov"), _ovl("ia", "bb", "oab"),
            _ovl("ib", "ba", "oba"),
            (f"pairs AS (SELECT * FROM (VALUES {pair_list}) AS "
             f"_p(poly))"),
            ("base AS (SELECT p.poly, COALESCE(sa.n, 0) AS na, "
             "COALESCE(sb.n, 0) AS nb, COALESCE(ov.n, 0) AS ni, "
             "COALESCE(oab.n, 0) AS nab, COALESCE(oba.n, 0) AS nba, "
             "COALESCE(ta.c, 0) + COALESCE(tb.c, 0) "
             "- COALESCE(obb_c.c, 0) AS bc "
             "FROM pairs p "
             "LEFT JOIN sa ON sa.poly = p.poly "
             "LEFT JOIN sb ON sb.poly = p.poly "
             "LEFT JOIN ta ON ta.poly = p.poly "
             "LEFT JOIN tb ON tb.poly = p.poly "
             "LEFT JOIN ov ON ov.poly = p.poly "
             "LEFT JOIN oab ON oab.poly = p.poly "
             "LEFT JOIN oba ON oba.poly = p.poly "
             "LEFT JOIN (SELECT x.poly, COUNT(*) AS c FROM ba x "
             "JOIN bb y ON x.poly = y.poly AND x.lo = y.lo "
             "GROUP BY 1) obb_c ON obb_c.poly = p.poly)"),
        ])
        + f" SELECT CAST(poly AS BIGINT) AS a_id, "
          f"CAST(poly AS BIGINT) AS b_id, op, "
          f"CAST(interior_leaves AS BIGINT) AS interior_leaves, "
          f"CAST(boundary_cells AS BIGINT) AS boundary_cells "
          f"FROM ({ops_select})")

    # --- convex_hull: driver-kernel materialized expected rows (hull
    # semantics pinned by tests/test_hull.py reference fixtures; this
    # row checks the distributed applyInPandas plumbing) ---
    from s2spark.kernels import hull as _hk
    hp = _hull_points_pdf()
    hull_rows = []
    for g in range(N_HULL_GROUPS):
        sub = hp[hp["grp"] == g].sort_values("pkey", ignore_index=True)
        pts = sub[["x", "y", "z"]].to_numpy(_np.float64)
        idx = _hk.hull_indices(pts)
        if idx is None:
            hull_rows.append(f"({g}, -1, -1)")
        else:
            keys_g = sub["pkey"].to_numpy(_np.int64)
            hull_rows += [f"({g}, {i}, {int(keys_g[j])})"
                          for i, j in enumerate(idx)]
    hull_sql = (
        "SELECT CAST(grp AS BIGINT) AS grp, CAST(seq AS INTEGER) AS "
        "seq, CAST(point_key AS BIGINT) AS point_key FROM (VALUES "
        + ", ".join(hull_rows) + ") AS _h(grp, seq, point_key)")

    # --- chain_interp: quantile-by-fraction via the integer cross-
    # multiplication (mirrors measures.chain_quantile) ---
    ev_track = geo.geo_table_sql(
        "events", dataset.geo_key_sql("event_id", "events"),
        ["event_id", "user_id", "ts"])
    lag2 = ("(x - LAG(x) OVER win)*(x - LAG(x) OVER win) "
            "+ (y - LAG(y) OVER win)*(y - LAG(y) OVER win) "
            "+ (z - LAG(z) OVER win)*(z - LAG(z) OVER win)")
    quantile_parts = " UNION ALL ".join(
        f"SELECT h.user_id, CAST({num} AS INTEGER) AS frac_num, "
        f"CAST(h.seq AS INTEGER) AS q_seq, CAST(h.cum AS BIGINT) AS "
        f"cum_units, CAST(h.total AS BIGINT) AS total_units "
        f"FROM (SELECT * FROM ct WHERE cum * 4 >= total * {num}) h "
        f"JOIN (SELECT user_id, MIN(seq) AS s FROM ct "
        f"WHERE cum * 4 >= total * {num} GROUP BY 1) f "
        f"ON h.user_id = f.user_id AND h.seq = f.s"
        for num in (1, 3))
    chain_interp = (
        f"WITH seg AS (SELECT user_id, CAST(ROW_NUMBER() OVER win AS "
        f"INTEGER) AS seq, {lag2} AS dist2 FROM {ev_track} "
        f"WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id) "
        f"QUALIFY dist2 IS NOT NULL), "
        f"q AS (SELECT user_id, seq, CAST(floor(dist2 * 1.0e15) AS "
        f"BIGINT) AS qdist FROM seg), "
        f"c AS (SELECT user_id, seq, SUM(qdist) OVER "
        f"(PARTITION BY user_id ORDER BY seq ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND CURRENT ROW) AS cum FROM q), "
        f"ct AS (SELECT *, MAX(cum) OVER (PARTITION BY user_id) AS "
        f"total FROM c) {quantile_parts}")

    # --- density_tree: per-level integer rollups + visited chain ---
    def _prefix_sql(col: str, level: int) -> str:
        # Spark's shiftrightunsigned mirrored on signed BIGINT:
        # arithmetic shift + mask of the sign-extended bits (safe for
        # level <= 14: 1 << (64 - s) stays in int64)
        s = 2 * (30 - level) + 1
        mask = (1 << (64 - s)) - 1
        return f"(({col} >> {s}) & {mask})"

    ev_cells2 = _geo_view("events", "event_id", with_xyz=False)
    t, maxl = DENSITY_THRESHOLD, DENSITY_MAX_LEVEL
    ctes = [f"base AS (SELECT cell FROM {ev_cells2})"]
    for lv in range(maxl + 1):
        ctes.append(
            f"w{lv} AS (SELECT {_prefix_sql('cell', lv)} AS cell, "
            f"CAST(COUNT(*) AS BIGINT) AS weight FROM base GROUP BY 1)")
    ctes.append("v0 AS (SELECT * FROM w0)")
    for lv in range(1, maxl + 1):
        ctes.append(
            f"v{lv} AS (SELECT w.cell, w.weight FROM w{lv} w "
            f"WHERE (w.cell >> 2) IN "
            f"(SELECT cell FROM v{lv - 1} WHERE weight > {t}))")
    union = " UNION ALL ".join(
        f"SELECT CAST({lv} AS INTEGER) AS level, cell, weight, "
        f"(weight <= {t} OR {lv} = {maxl}) AS is_leaf FROM v{lv}"
        for lv in range(maxl + 1))
    density_sql = "WITH " + ", ".join(ctes) + " " + union

    # --- winding_number: brute-force containment counts - n_cw ---
    wloops, wsigns = _winding_loops()
    n_cw = sum(1 for v in wsigns.values() if v < 0)
    winding_sql = (
        f"WITH {_pip_inside_sql(f'({ev_geo})', 'event_id', wloops)}, "
        f"cnt AS (SELECT event_id, COUNT(*) AS n FROM ins "
        f"GROUP BY 1) "
        f"SELECT p.event_id, CAST(COALESCE(cnt.n, 0) - {n_cw} AS "
        f"BIGINT) AS winding FROM ({ev_geo}) p "
        f"LEFT JOIN cnt ON cnt.event_id = p.event_id")

    return {
        "closest_edge": closest,
        "polygon_distance": polygon_distance,
        "track_project": track_project,
        "edge_within": edge_within,
        "crossing_edges": crossing,
        "pip_join": pip_sql,
        "polygon_pip": poly_sql,
        "region_covering": covering,
        "region_overlap": region_overlap,
        "polygon_overlay": overlay,
        "polygon_overlay_exact": _overlay_exact_oracle(),
        "polygon_overlay_geom": _overlay_geom_oracle(),
        "polygon_overlay_models": _overlay_models_oracle(),
        "winding_geom": _winding_geom_oracle(),
        "point_overlay_models": _point_overlay_models_oracle(),
        "polyline_overlay_models": _polyline_overlay_models_oracle(),
        "overlay_closed_set": _closed_set_oracle(),
        "shape_index_covering": _shape_covering_oracle(),
        "polygon_boundaries": _polygon_boundaries_oracle(),
        "shape_measures": _shape_measures_oracle(),
        "closest_cell": _closest_cell_oracle(),
        "polygon_codec": _polygon_codec_oracle(),
        "shape_index_codec": _shape_index_codec_oracle(),
        "shape_index_cells": _shape_index_cells_oracle(),
        "convex_hull": hull_sql,
        "chain_interp": chain_interp,
        "density_tree": density_sql,
        "winding_number": winding_sql,
        "raster_cell_map": _raster_oracle(),
        "polygon_buffer": _buffer_oracle(),
        "polygon_buffer_geom": _buffer_geom_oracle(),
        "track_clip": _track_clip_oracle(),
        "loop_validation": _validation_oracle(),
        "index_validation": _index_validation_oracle(),
        "track_simplify": _track_simplify_oracle(),
        "track_snap_simplify": _track_snap_simplify_oracle(),
        "track_dtw": _track_dtw_oracle(),
        "track_alignment_approx": _track_alignment_approx_oracle(),
        "track_snap": (
            f"WITH t AS (SELECT user_id, ts, event_id, "
            f"{geo.parent_sql('cell', SNAP_LEVEL)} AS sc FROM "
            f"{geo.geo_table_sql('events', dataset.geo_key_sql('event_id', 'events'), ['event_id', 'user_id', 'ts'], with_xyz=False)}), "
            f"d AS (SELECT user_id, ts, event_id, sc, LAG(sc) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            f"FROM t), "
            f"f AS (SELECT * FROM d WHERE prev IS NULL OR prev <> sc) "
            f"SELECT user_id, CAST(ROW_NUMBER() OVER (PARTITION BY "
            f"user_id ORDER BY ts, event_id) AS INTEGER) AS seq_out, "
            f"sc AS snap_cell FROM f"),
    }


def _raster_oracle() -> str:
    """SQL mirror of ops/raster.py's tangent-offset cell mapping —
    every step is cross products / normalize / the quadratic uv->st
    projection / the Hilbert encode: no trig, so each double op is
    IEEE-identical to the NumPy kernel when written in the same
    order (verified at sf0.01 and sf0.1)."""
    from s2spark.ops import raster as _r
    grid, extent, level = 4, 2e-4, 14
    step = 2.0 * extent / grid
    off = -extent + step / 2.0
    _w = f"(256 + ({geo.mix_sql('id', 13)} % 768))"  # unused cols ok
    _ph = (f"({geo.mix_sql('id', 11)} * 2147483647 "
           f"+ {geo.mix_sql('id', 12)})")
    img_base = f"(SELECT o_orderkey AS id, {_ph} AS phash FROM orders)"
    img_geo = geo.geo_table_sql(img_base, "phash", ["id"],
                                with_xyz=True)
    sql = (
        # grid fan-out + tangent offsets (literal arithmetic mirrors
        # F.lit(off) + tx * F.lit(step))
        f"SELECT id, x, y, z, tx, ty, "
        f"({_f17(off)} + tx * {_f17(step)}) AS du, "
        f"({_f17(off)} + ty * {_f17(step)}) AS dv "
        f"FROM {img_geo}, (SELECT unnest(generate_series(0, {grid - 1}"
        f")) AS tx), (SELECT unnest(generate_series(0, {grid - 1})) "
        f"AS ty)")
    # tangent basis: ref = (1,0,0) near poles else (0,0,1)
    sql = (
        f"SELECT id, x, y, z, du, dv, "
        f"(CASE WHEN abs(z) >= 0.9 THEN 1.0 ELSE 0.0 END) AS rx, "
        f"0.0 AS ry, "
        f"(CASE WHEN abs(z) >= 0.9 THEN 0.0 ELSE 1.0 END) AS rz "
        f"FROM ({sql})")
    sql = (  # e1 = cross(c, ref)
        f"SELECT id, x, y, z, du, dv, "
        f"(y*rz - z*ry) AS ex, (z*rx - x*rz) AS ey, "
        f"(x*ry - y*rx) AS ez FROM ({sql})")
    sql = (f"SELECT *, sqrt(ex*ex + ey*ey + ez*ez) AS en "
           f"FROM ({sql})")
    sql = (f"SELECT id, x, y, z, du, dv, ex/en AS e1x, ey/en AS e1y, "
           f"ez/en AS e1z FROM ({sql})")
    sql = (  # e2 = cross(c, e1)
        f"SELECT *, (y*e1z - z*e1y) AS e2x, (z*e1x - x*e1z) AS e2y, "
        f"(x*e1y - y*e1x) AS e2z FROM ({sql})")
    sql = (  # p = c + du*e1 + dv*e2, then normalize
        f"SELECT id, ((x + du*e1x) + dv*e2x) AS px, "
        f"((y + du*e1y) + dv*e2y) AS py, "
        f"((z + du*e1z) + dv*e2z) AS pz FROM ({sql})")
    sql = (f"SELECT id, px, py, pz, "
           f"sqrt(px*px + py*py + pz*pz) AS pn FROM ({sql})")
    sql = (f"SELECT id, px/pn AS px, py/pn AS py, pz/pn AS pz "
           f"FROM ({sql})")
    # face = largest-|component| axis (+3 if negative), kernel order
    sql = (
        f"SELECT id, px, py, pz, "
        f"(CASE WHEN abs(px) > abs(py) THEN "
        f"(CASE WHEN abs(px) > abs(pz) THEN 0 ELSE 2 END) ELSE "
        f"(CASE WHEN abs(py) > abs(pz) THEN 1 ELSE 2 END) END) AS ax "
        f"FROM ({sql})")
    sql = (
        f"SELECT id, px, py, pz, "
        f"(CASE WHEN (CASE ax WHEN 0 THEN px WHEN 1 THEN py "
        f"ELSE pz END) < 0.0 THEN ax + 3 ELSE ax END) AS face "
        f"FROM ({sql})")
    u = ("(CASE face WHEN 0 THEN py/px WHEN 1 THEN -px/py "
         "WHEN 2 THEN -px/pz WHEN 3 THEN pz/px WHEN 4 THEN pz/py "
         "ELSE -py/pz END)")
    v = ("(CASE face WHEN 0 THEN pz/px WHEN 1 THEN pz/py "
         "WHEN 2 THEN -py/pz WHEN 3 THEN py/px WHEN 4 THEN -px/py "
         "ELSE -px/pz END)")
    sql = f"SELECT id, face, {u} AS u, {v} AS v FROM ({sql})"

    def uv2st(c):
        return (f"(CASE WHEN {c} >= 0.0 THEN "
                f"0.5*sqrt(GREATEST(1.0 + 3.0*{c}, 0.0)) "
                f"ELSE 1.0 - 0.5*sqrt(GREATEST(1.0 - 3.0*{c}, 0.0)) "
                f"END)")

    lim = 1 << 30
    sql = (f"SELECT id, face, {uv2st('u')} AS s, {uv2st('v')} AS t "
           f"FROM ({sql})")
    sql = (
        f"SELECT id, face, "
        f"LEAST(GREATEST(CAST(trunc({float(lim)} * s) AS BIGINT), 0), "
        f"{lim - 1}) AS i, "
        f"LEAST(GREATEST(CAST(trunc({float(lim)} * t) AS BIGINT), 0), "
        f"{lim - 1}) AS j FROM ({sql})")
    enc = geo.encode_table_sql(f"({sql})", ["id"])
    return (
        f"SELECT {geo.parent_sql('cell', level)} AS rcell, "
        f"CAST(COUNT(*) AS BIGINT) AS n_tiles, "
        f"CAST(COUNT(DISTINCT id) AS BIGINT) AS n_images "
        f"FROM {enc} GROUP BY 1")


def _track_clip_oracle() -> str:
    """Driver-kernel materialized expected rows for track_clip
    (clip semantics pinned against the reference's polyline fixtures
    in tests/test_builder_reference.py)."""
    from s2spark.kernels import builder as _bld
    from s2spark.kernels import cellid as _ck
    from s2spark.kernels.loops import Loop as _Loop
    from s2spark.kernels.loops import parse_vertices as _pv
    pdf = _synth_tracks_pdf()
    loops = [_Loop(_pv(TRACK_CLIP_LOOP))]
    snap = _bld.IntLatLngSnapFunction(1)
    rows = []
    for ent, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("ts")
        v = grp[["x", "y", "z"]].to_numpy()
        for li, chain in enumerate(_bld.clip_polyline(
                v, loops, "intersection", snap=snap)):
            cells = _ck.as_i64(_ck.parent(
                _ck.from_xyz(chain[:, 0], chain[:, 1], chain[:, 2]),
                14))
            rows.extend(f"({int(ent)}, {li}, {s}, {int(c)})"
                        for s, c in enumerate(cells))
    return ("SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(line_idx AS INTEGER) AS line_idx, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows) + ") AS _tc(user_id, line_idx, seq, "
            "site_cell)")


def _track_snap_simplify_oracle() -> str:
    """Materialized kernel rows for track_snap_simplify (algorithm
    pinned by the reference fixture battery)."""
    from s2spark.kernels import builder as _bld
    from s2spark.kernels import cellid as _ck
    pdf = _synth_tracks_pdf()
    rows = []
    for ent, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("ts")
        v = grp[["x", "y", "z"]].to_numpy()
        for li, chain in enumerate(_bld.simplify_polylines(
                [v], simplify_radius=SNAP_SIMPLIFY_RADIUS)):
            cells = _ck.as_i64(_ck.parent(
                _ck.from_xyz(chain[:, 0], chain[:, 1], chain[:, 2]),
                30))
            rows.extend(f"({int(ent)}, {li}, {s}, {int(c)})"
                        for s, c in enumerate(cells))
    return ("SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(line_idx AS INTEGER) AS line_idx, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows) + ") AS _ss(user_id, line_idx, seq, "
            "site_cell)")


def _track_simplify_oracle() -> str:
    """Materialized kernel rows for the fixed synthetic tracks."""
    import numpy as np

    from s2spark.kernels.simplify import subsample_vertices
    pdf = _synth_tracks_pdf()
    rows = []
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("ts", ignore_index=True)
        v = grp[["x", "y", "z"]].to_numpy(np.float64)
        for k in subsample_vertices(v, SIMPLIFY_TOL):
            rows.append(f"({int(uid)}, {k})")
    return ("SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(kept_seq AS INTEGER) AS kept_seq FROM (VALUES "
            + ", ".join(rows) + ") AS _t(user_id, kept_seq)")


def _track_dtw_oracle() -> str:
    """Materialized kernel DTW costs (same doubles: workers run the
    identical DP)."""
    import numpy as np

    from s2spark.kernels.simplify import dtw_cost
    pdf = _synth_tracks_pdf()
    tracks = {int(uid): grp.sort_values("ts")[["x", "y", "z"]]
              .to_numpy(np.float64)
              for uid, grp in pdf.groupby("user_id")}
    rows = []
    for a in range(8):
        for b in range(a + 1, 8):
            rows.append(f"({a}, {b}, "
                        f"{_f17(dtw_cost(tracks[a], tracks[b]))})")
    return ("SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS "
            "BIGINT) AS id_b, dtw_cost FROM (VALUES "
            + ", ".join(rows) + ") AS _d(id_a, id_b, dtw_cost)")


def _validation_oracle() -> str:
    import numpy as np

    from s2spark.ops import validate as _val
    rows = []
    for pid, flat in _validation_fixture_rows():
        err = _val._loop_error(np.asarray(flat,
                                          dtype=np.float64).reshape(-1, 3))
        rows.append(f"({pid}, {str(err is None).upper()}, "
                    f"'{err or 'ok'}')")
    return ("SELECT CAST(poly_id AS BIGINT) AS poly_id, is_valid, "
            "error FROM (VALUES " + ", ".join(rows)
            + ") AS _v(poly_id, is_valid, error)")


def _index_validation_oracle() -> str:
    from s2spark.kernels import validation as _vq
    rows = []
    for i, geom in enumerate(INDEX_VALIDATION_FIXTURES):
        shapes = _vq.parse_index(geom)
        ok, code = _vq.valid_query(shapes)
        lok, lcode = _vq.valid_query(shapes, legacy=True)
        rows.append(f"({i}, {str(ok).upper()}, '{code}', "
                    f"{str(lok).upper()}, '{lcode}')")
    return ("SELECT CAST(index_id AS BIGINT) AS index_id, is_valid, "
            "code, legacy_valid, legacy_code FROM (VALUES "
            + ", ".join(rows)
            + ") AS _v(index_id, is_valid, code, legacy_valid, "
              "legacy_code)")


def _buffer_oracle() -> str:
    """Driver-kernel materialized expected rows for polygon_buffer
    (guarantees pinned by tests/test_buffer.py sampling)."""
    import numpy as np

    from s2spark.kernels import buffer as _bu
    from s2spark.kernels import cellid as _ck
    from s2spark.ops import pip as _pip
    rows = []
    for lid, loop in _pip.synth_loops(N_BUFFER_LOOPS).items():
        interior, band = _bu.classify_buffer(loop, BUFFER_RADIUS,
                                             BUFFER_MAX_LEVEL)
        leaves = int(_ck.lsb(np.asarray(interior, dtype=np.int64)
                             .view(np.uint64)).sum()) \
            if len(interior) else 0
        rows.append(f"({lid}, {leaves}, {len(interior)}, {len(band)})")
    return ("SELECT CAST(loop_id AS BIGINT) AS loop_id, "
            "CAST(a AS BIGINT) AS interior_leaves, "
            "CAST(b AS BIGINT) AS interior_cells, "
            "CAST(c AS BIGINT) AS band_cells FROM (VALUES "
            + ", ".join(rows) + ") AS _b(loop_id, a, b, c)")


def _buffer_geom_oracle() -> str:
    """Driver-kernel materialized expected chain rows for
    polygon_buffer_geom (geometry pinned by tests/test_buffer.py cap
    fixture + certification sandwich)."""
    from s2spark.kernels import buffer as _bu
    from s2spark.kernels import cellid as _ck
    from s2spark.ops import pip as _pip
    rows = []
    for lid, loop in _pip.synth_loops(N_BUFFER_LOOPS).items():
        chain = _bu.buffer_geometry(loop, BUFFER_RADIUS)
        cells = _ck.as_i64(_ck.parent(
            _ck.from_xyz(chain[:, 0], chain[:, 1], chain[:, 2]),
            GEOM_SNAP_LEVEL))
        rows.extend(f"({lid}, {s}, {int(c)})"
                    for s, c in enumerate(cells))
    return ("SELECT CAST(loop_id AS BIGINT) AS loop_id, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows) + ") AS _bg(loop_id, seq, site_cell)")


def _closest_cell_oracle() -> str:
    """Brute-force S2ClosestCellQuery oracle: per point, min over each
    index cell's 4 boundary geodesics (the kernel's exact double op
    order via _seg_chord2_cte) with leaf-range containment override,
    ranked to k=CLOSEST_CELL_K."""
    import numpy as _np

    from s2spark.kernels import cellid as _ck
    from s2spark.kernels.region import Cell
    ev_geo = _geo_view("events", "event_id")
    rows = []
    for icell, label in _closest_cell_index_rows():
        cell = Cell(icell)
        vs = [cell.get_vertex(k) for k in range(4)]
        u = _np.array([icell], dtype=_np.int64).view(_np.uint64)
        lo = int(_ck.as_i64(_ck.range_min(u))[0])
        hi = int(_ck.as_i64(_ck.range_max(u))[0])
        for k in range(4):
            a, b = vs[k], vs[(k + 1) % 4]
            rows.append(f"({icell}, {label}, {lo}, {hi}, "
                        f"{_f17(a[0])}, {_f17(a[1])}, {_f17(a[2])}, "
                        f"{_f17(b[0])}, {_f17(b[1])}, {_f17(b[2])})")
    keep = "event_id, cell, icell, label, lo, hi"
    pairs = (f"(SELECT p.event_id, p.cell, p.x, p.y, p.z, e.icell, "
             f"e.label, e.lo, e.hi, e.ax, e.ay, e.az, e.bx, e.by, "
             f"e.bz FROM (SELECT * FROM {ev_geo} WHERE event_id % 10 "
             f"= 0) p, (VALUES " + ", ".join(rows)
             + ") AS e(icell, label, lo, hi, ax, ay, az, bx, by, bz))")
    return (
        f"WITH {_seg_chord2_cte(pairs, keep)}, "
        f"percell AS (SELECT event_id, icell, label, "
        f"CASE WHEN MAX(CASE WHEN cell BETWEEN lo AND hi THEN 1 "
        f"ELSE 0 END) = 1 THEN CAST(0.0 AS DOUBLE) ELSE MIN(dist2) "
        f"END AS dist2 FROM dist GROUP BY 1, 2, 3), "
        f"r AS (SELECT event_id, CAST(icell AS BIGINT) AS icell, "
        f"CAST(label AS BIGINT) AS label, dist2, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY "
        f"dist2, label, icell) AS INTEGER) AS rank FROM percell) "
        f"SELECT * FROM r WHERE rank <= {CLOSEST_CELL_K}")


def _overlay_exact_oracle() -> str:
    """Driver-kernel materialized expected rows for
    polygon_overlay_exact (exact_op_counts per pair; exactness vs the
    reference result loops is pinned in tests/test_boolean.py)."""
    from s2spark.kernels import boolean as _bk
    from s2spark.ops import pip as _pip
    la = _pip.synth_loops(N_OVERLAY_PAIRS)
    lb = _pip.synth_loops(N_OVERLAY_PAIRS, shift_u=OVERLAY_SHIFT)
    rows = []
    for pid in range(N_OVERLAY_PAIRS):
        counts = _bk.exact_op_counts(la[pid], lb[pid],
                                     OVERLAY_MAX_LEVEL)
        rows.extend(f"({pid}, {pid}, '{op}', {c['interior_leaves']}, "
                    f"{c['boundary_cells']})"
                    for op, c in counts.items())
    return ("SELECT CAST(a_id AS BIGINT) AS a_id, "
            "CAST(b_id AS BIGINT) AS b_id, op, "
            "CAST(interior_leaves AS BIGINT) AS interior_leaves, "
            "CAST(boundary_cells AS BIGINT) AS boundary_cells "
            "FROM (VALUES " + ", ".join(rows)
            + ") AS _x(a_id, b_id, op, interior_leaves, "
            "boundary_cells)")


def _polygon_codec_oracle() -> str:
    """Driver-kernel materialized expected rows for polygon_codec
    (codec.polygon_codec_rows shared verbatim; byte-format parity vs
    the reference goldens pinned in tests/test_codecs.py)."""
    from s2spark.ops import codec as _codec
    from s2spark.ops import pip as _pip
    rows = []
    for pid, lp in _pip.synth_loops(N_CODEC_POLYS).items():
        rows.extend(f"({p}, {s}, {c}, {n}, {ver})"
                    for p, s, c, n, ver in _codec.polygon_codec_rows(
                        pid, lp.vertices, GEOM_SNAP_LEVEL))
    return ("SELECT CAST(poly_id AS BIGINT) AS poly_id, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell, "
            "CAST(enc_len AS INTEGER) AS enc_len, "
            "CAST(version AS INTEGER) AS version FROM (VALUES "
            + ", ".join(rows)
            + ") AS _p(poly_id, seq, site_cell, enc_len, version)")


def _shape_index_cells_oracle() -> str:
    """Driver-kernel materialized expected rows for shape_index_cells
    (pip.mutable_index_rows shared verbatim; subdivision semantics
    pinned by the QuadraticValidate battery)."""
    from s2spark.ops import pip as _pip
    rows = []
    for pid, lp in _pip.synth_loops(N_CODEC_POLYS, min_vertices=24,
                                    max_vertices=48).items():
        rows.extend(
            f"({p}, {c}, {n}, {str(bool(cc)).upper()})"
            for p, c, n, cc in _pip.mutable_index_rows(
                pid, lp.vertices))
    return ("SELECT CAST(poly_id AS BIGINT) AS poly_id, "
            "CAST(icell AS BIGINT) AS icell, "
            "CAST(n_edges AS INTEGER) AS n_edges, "
            "CAST(contains_center AS BOOLEAN) AS contains_center "
            "FROM (VALUES " + ", ".join(rows)
            + ") AS _s(poly_id, icell, n_edges, contains_center)")


def _overlay_geom_oracle() -> str:
    """Driver-kernel materialized expected vertex-chain rows for
    polygon_overlay_geom (chains pinned against the reference's
    published result loops in tests/test_builder.py)."""
    from s2spark.kernels import builder as _bld
    from s2spark.kernels import cellid as _ck
    from s2spark.ops import pip as _pip
    la = _pip.synth_loops(N_OVERLAY_PAIRS)
    lb = _pip.synth_loops(N_OVERLAY_PAIRS, shift_u=OVERLAY_SHIFT)
    snap = _bld.CellIdSnapFunction(GEOM_SNAP_LEVEL)
    rows = []
    for pid in range(N_OVERLAY_PAIRS):
        for op in _bld.OPS:
            for li, chain in enumerate(_bld.overlay_geometry(
                    la[pid], lb[pid], op, snap=snap)):
                cells = _ck.as_i64(_ck.parent(
                    _ck.from_xyz(chain[:, 0], chain[:, 1], chain[:, 2]),
                    GEOM_SNAP_LEVEL))
                rows.extend(f"({pid}, {pid}, '{op}', {li}, {s}, "
                            f"{int(c)})"
                            for s, c in enumerate(cells))
    return ("SELECT CAST(a_id AS BIGINT) AS a_id, "
            "CAST(b_id AS BIGINT) AS b_id, op, "
            "CAST(loop_idx AS INTEGER) AS loop_idx, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows)
            + ") AS _g(a_id, b_id, op, loop_idx, seq, site_cell)")


def _overlay_models_oracle() -> str:
    """Driver-kernel materialized expected rows for
    polygon_overlay_models (model semantics pinned against reference
    fixtures in tests/test_builder_reference.py)."""
    from s2spark.kernels import builder as _bld
    from s2spark.kernels import cellid as _ck
    la, lb = _model_fixture_loops()
    snap = _bld.CellIdSnapFunction(GEOM_SNAP_LEVEL)
    rows = []
    for pid in range(N_MODEL_PAIRS):
        for model in _bld.POLYGON_MODELS:
            for op in _bld.OPS:
                chains = _bld.overlay_geometry(
                    la[pid], lb[pid], op, snap=snap,
                    polygon_model=model)
                if not chains:
                    st = _bld.overlay_result_state(la[pid], lb[pid],
                                                   op, chains)
                    rows.append(f"({pid}, '{op}', '{model}', -1, -1, "
                                f"{1 if st == 'full' else 0})")
                    continue
                for li, chain in enumerate(chains):
                    cells = _ck.as_i64(_ck.parent(_ck.from_xyz(
                        chain[:, 0], chain[:, 1], chain[:, 2]),
                        GEOM_SNAP_LEVEL))
                    rows.extend(
                        f"({pid}, '{op}', '{model}', {li}, {seq}, "
                        f"{int(c)})" for seq, c in enumerate(cells))
    return ("SELECT CAST(pair_id AS BIGINT) AS pair_id, op, model, "
            "CAST(loop_idx AS INTEGER) AS loop_idx, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows)
            + ") AS _m(pair_id, op, model, loop_idx, seq, site_cell)")


def _winding_geom_oracle() -> str:
    """Driver-kernel materialized expected rows for winding_geom."""
    import numpy as np

    from s2spark.kernels import builder as _bld
    from s2spark.kernels import cellid as _ck
    from s2spark.kernels import winding as _wd
    from s2spark.kernels.region import latlng_to_point as _llp
    from s2spark.ops import boolean as _bops
    rows = []
    for gid in range(N_WINDING_GROUPS):
        loops, (rlat, rlng), refw = _bops.winding_fixture(gid)
        ref = np.asarray(_llp(np.radians(rlat), np.radians(rlng)))
        snap = _bld.IntLatLngSnapFunction(6)
        for rule in _wd.RULES:
            chains, state = _wd.winding_operation(loops, ref, refw,
                                                  rule, snap=snap)
            if not chains:
                rows.append(f"({gid}, '{rule}', -1, -1, "
                            f"{1 if state == 'full' else 0})")
                continue
            for li, chain in enumerate(chains):
                cells = _ck.as_i64(_ck.from_xyz(
                    chain[:, 0], chain[:, 1], chain[:, 2]))
                rows.extend(f"({gid}, '{rule}', {li}, {seq}, {int(c)})"
                            for seq, c in enumerate(cells))
    return ("SELECT CAST(group_id AS BIGINT) AS group_id, rule, "
            "CAST(loop_idx AS INTEGER) AS loop_idx, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows)
            + ") AS _w(group_id, rule, loop_idx, seq, site_cell)")


def _shape_index_codec_oracle() -> str:
    """Driver-kernel materialized expected rows for shape_index_codec."""
    from s2spark.ops import codec as _codec
    from s2spark.ops import pip as _pip
    loops = _pip.synth_loops(N_CODEC_POLYS)
    rows = []
    for pid in sorted(loops):
        for (p, icell, ne, cc, nb) in _codec.shape_index_codec_rows(
                pid, loops[pid].vertices):
            rows.append(f"({p}, {int(icell)}, {ne}, {cc}, {nb})")
    return ("SELECT CAST(poly_id AS BIGINT) AS poly_id, "
            "CAST(icell AS BIGINT) AS icell, "
            "CAST(n_edges AS INTEGER) AS n_edges, contains_center, "
            "CAST(n_bytes AS INTEGER) AS n_bytes FROM (VALUES "
            + ", ".join(rows)
            + ") AS _si(poly_id, icell, n_edges, contains_center, "
            "n_bytes)")


def _track_alignment_approx_oracle() -> str:
    """Materialized kernel rows for track_alignment_approx."""
    import numpy as np

    from s2spark.kernels import alignment as _al
    pdf = _synth_tracks_pdf()
    tracks = {int(e): g.sort_values("ts")[["x", "y", "z"]]
              .to_numpy(np.float64) for e, g in pdf.groupby("user_id")}
    rows = []
    for a in range(8):
        for b in range(a + 1, 8):
            ac, path = _al.approx_vertex_alignment(tracks[a],
                                                   tracks[b], 2)
            ec = _al.exact_vertex_alignment_cost(tracks[a], tracks[b])
            rows.append(f"({a}, {b}, {_f17(ac)}, {_f17(ec)}, "
                        f"{len(path)})")
    return ("SELECT CAST(id_a AS BIGINT) AS id_a, "
            "CAST(id_b AS BIGINT) AS id_b, approx_cost, exact_cost, "
            "CAST(path_len AS INTEGER) AS path_len FROM (VALUES "
            + ", ".join(rows)
            + ") AS _ta(id_a, id_b, approx_cost, exact_cost, "
            "path_len)")


def _point_overlay_models_oracle() -> str:
    """Driver-kernel materialized expected rows for
    point_overlay_models."""
    from s2spark.kernels import builder as _bld
    from s2spark.kernels import layers as _ly
    from s2spark.ops import boolean as _bops
    rows = []
    for pid in range(N_POINT_PAIRS):
        loops, probes = _bops.point_fixture_probes(pid)
        for model in _bld.POLYGON_MODELS:
            contained = _ly.polygon_contains_points_model(
                loops, probes, model)
            for op in _bld.OPS:
                keep = contained if op == "intersection" else ~contained
                rows.extend(
                    f"({pid}, '{model}', '{op}', {i}, {bool(k)})"
                    for i, k in enumerate(keep))
    return ("SELECT CAST(pair_id AS BIGINT) AS pair_id, model, op, "
            "CAST(point_idx AS INTEGER) AS point_idx, survives "
            "FROM (VALUES " + ", ".join(rows)
            + ") AS _pm(pair_id, model, op, point_idx, survives)")


def _polyline_overlay_models_oracle() -> str:
    """Driver-kernel materialized expected rows for
    polyline_overlay_models."""
    from s2spark.kernels import builder as _bld
    from s2spark.kernels import cellid as _ck
    from s2spark.kernels import layers as _ly
    from s2spark.ops import boolean as _bops
    rows = []
    for pid in range(N_PLPL_PAIRS):
        a, b = _bops.polyline_pair_fixture(pid)
        for model in _ly.POLYLINE_MODELS:
            for op in _bld.OPS:
                chains = _ly.polyline_polyline_boolean(a, b, op, model)
                for li, chain in enumerate(chains):
                    cells = _ck.as_i64(_ck.from_xyz(
                        chain[:, 0], chain[:, 1], chain[:, 2]))
                    rows.extend(
                        f"({pid}, '{model}', '{op}', {li}, {sq}, "
                        f"{int(c)})" for sq, c in enumerate(cells))
                if not chains:
                    rows.append(f"({pid}, '{model}', '{op}', -1, -1, 0)")
    return ("SELECT CAST(pair_id AS BIGINT) AS pair_id, model, op, "
            "CAST(line_idx AS INTEGER) AS line_idx, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows)
            + ") AS _pp(pair_id, model, op, line_idx, seq, site_cell)")


def _closed_set_oracle() -> str:
    """Driver-kernel materialized expected rows for
    overlay_closed_set (normalizer semantics pinned against the
    reference's NormalizeTest table in tests/test_closed_set.py)."""
    from s2spark.kernels import builder as _bld
    from s2spark.kernels import cellid as _ck
    from s2spark.kernels import layers as _ly
    from s2spark.ops import boolean as _bops
    rows = []
    for gid in range(N_MIXED_GROUPS):
        a, b = _bops.mixed_fixture(gid)
        for op in _bld.OPS:
            pts, lines, chains, full = _ly.mixed_boolean_layers(
                a, b, op)
            if full:
                rows.append(f"({gid}, '{op}', 2, -1, -1, 1)")
            for i, p in enumerate(pts):
                c = _ck.as_i64(_ck.from_xyz(p[None, 0], p[None, 1],
                                            p[None, 2]))
                rows.append(f"({gid}, '{op}', 0, {i}, 0, {int(c[0])})")
            for dim, feats in ((1, lines), (2, chains)):
                for i, ch in enumerate(feats):
                    cells = _ck.as_i64(_ck.from_xyz(
                        ch[:, 0], ch[:, 1], ch[:, 2]))
                    rows.extend(
                        f"({gid}, '{op}', {dim}, {i}, {sq}, {int(c)})"
                        for sq, c in enumerate(cells))
    return ("SELECT CAST(group_id AS BIGINT) AS group_id, op, "
            "CAST(dim AS INTEGER) AS dim, "
            "CAST(feat_idx AS INTEGER) AS feat_idx, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(site_cell AS BIGINT) AS site_cell FROM (VALUES "
            + ", ".join(rows)
            + ") AS _cs(group_id, op, dim, feat_idx, seq, site_cell)")


def _shape_covering_oracle() -> str:
    """Driver-kernel materialized expected rows for
    shape_index_covering (kernel guarantees pinned in
    tests/test_shape_region.py)."""
    import numpy as np

    from s2spark.kernels import cellid as _ck
    from s2spark.kernels.coverer import RegionCoverer as _RC
    from s2spark.kernels.shape_region import (
        ShapeIndexBufferedRegion as _BR, ShapeIndexRegion as _SR)
    from s2spark.ops import boolean as _bops
    rows = []
    rc = _RC(max_cells=16)
    for gid in range(N_MIXED_GROUPS):
        col, _ = _bops.mixed_fixture(gid)
        for kind, radius in _bops.SHAPE_COV_RADII:
            reg = _SR(col) if radius is None else _BR(col, radius)
            cells = sorted(int(c) for c in _ck.as_i64(np.asarray(
                rc.get_covering(reg), dtype=np.uint64)))
            rows.extend(f"({gid}, '{kind}', {s}, {c})"
                        for s, c in enumerate(cells))
    return ("SELECT CAST(group_id AS BIGINT) AS group_id, kind, "
            "CAST(seq AS INTEGER) AS seq, "
            "CAST(cell AS BIGINT) AS cell FROM (VALUES "
            + ", ".join(rows)
            + ") AS _sc(group_id, kind, seq, cell)")


def _shape_measures_oracle() -> str:
    """Driver-kernel materialized expected rows for shape_measures
    (identities pinned in tests/test_shape_measures.py); doubles
    round-trip via %.17e."""
    from s2spark.kernels.shape_measures import collection_measures
    from s2spark.ops import boolean as _bops
    rows = []
    for gid in range(N_MIXED_GROUPS):
        a, b = _bops.mixed_fixture(gid)
        for side, col in (("a", a), ("b", b)):
            m = collection_measures(col)
            c = m["centroid"]
            rows.append(
                f"({gid}, '{side}', {m['dim']}, {m['num_points']}, "
                f"{_f17(m['length'])}, {_f17(m['perimeter'])}, "
                f"{_f17(m['area'])}, {_f17(c[0])}, {_f17(c[1])}, "
                f"{_f17(c[2])})")
    return ("SELECT CAST(group_id AS BIGINT) AS group_id, side, "
            "CAST(dim AS INTEGER) AS dim, "
            "CAST(num_points AS INTEGER) AS num_points, "
            "CAST(length AS DOUBLE) AS length, "
            "CAST(perimeter AS DOUBLE) AS perimeter, "
            "CAST(area AS DOUBLE) AS area, "
            "CAST(cx AS DOUBLE) AS cx, CAST(cy AS DOUBLE) AS cy, "
            "CAST(cz AS DOUBLE) AS cz FROM (VALUES "
            + ", ".join(rows)
            + ") AS _sm(group_id, side, dim, num_points, length, "
            "perimeter, area, cx, cy, cz)")


def _polygon_boundaries_oracle() -> str:
    """Driver-kernel materialized expected rows for
    polygon_boundaries (nesting pinned in
    tests/test_polygon_boundaries.py)."""
    from s2spark.kernels.shapeutil import build_polygon_boundaries
    from s2spark.ops import boolean as _bops
    rows = []
    for gid in range(N_MIXED_GROUPS):
        faces = build_polygon_boundaries(
            _bops.boundaries_fixture(gid))
        rows.extend(f"({gid}, {fi}, {ci}, {li})"
                    for fi, face in enumerate(faces)
                    for (ci, li) in face)
    return ("SELECT CAST(group_id AS BIGINT) AS group_id, "
            "CAST(face_idx AS INTEGER) AS face_idx, "
            "CAST(comp AS INTEGER) AS comp, "
            "CAST(loop_idx AS INTEGER) AS loop_idx FROM (VALUES "
            + ", ".join(rows)
            + ") AS _pb(group_id, face_idx, comp, loop_idx)")


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
    su_geo = geo.geo_table_sql(
        "supplier", dataset.geo_key_sql("s_suppkey", "supplier"),
        ["s_suppkey"])
    ev_track = geo.geo_table_sql(
        "events", dataset.geo_key_sql("event_id", "events"),
        ["event_id", "user_id", "ts"])

    d2cs = ("(c.x-s.x)*(c.x-s.x) + (c.y-s.y)*(c.y-s.y) "
            "+ (c.z-s.z)*(c.z-s.z)")
    lag2 = ("(x - LAG(x) OVER win)*(x - LAG(x) OVER win) "
            "+ (y - LAG(y) OVER win)*(y - LAG(y) OVER win) "
            "+ (z - LAG(z) OVER win)*(z - LAG(z) OVER win)")

    # image_meta: mirror synth_images_from column formulas exactly
    _w = f"(256 + ({geo.mix_sql('id', 13)} % 768))"
    _h = f"(256 + ({geo.mix_sql('id', 14)} % 768))"
    _fmt = (f"(CASE WHEN {geo.mix_sql('id', 15)} % 2 = 0 THEN 'png' "
            f"ELSE 'jpeg' END)")
    _ph = (f"({geo.mix_sql('id', 11)} * 2147483647 "
           f"+ {geo.mix_sql('id', 12)})")
    img_base = (f"(SELECT o_orderkey AS id, {_w} AS w, {_h} AS h, "
                f"{_fmt} AS fmt, {_ph} AS phash FROM orders)")
    img_geo = geo.geo_table_sql(img_base, "phash",
                                ["id", "w", "h", "fmt"], with_xyz=False)

    # audio_features: mirror synth_audio_from column formulas exactly
    aud_base = (f"(SELECT o_orderkey AS id, "
                f"{geo.mix_sql('o_orderkey', 21)} AS aseed, "
                f"120 + ({geo.mix_sql('o_orderkey', 22)} % 381) AS ns "
                f"FROM orders)")
    aud_geo = geo.geo_table_sql(aud_base, "aseed",
                                ["id", "aseed", "ns"], with_xyz=False)

    extra = _text_oracles()
    extra.update(_geometry_oracles())
    extra.update({
        "image_phash_near_dup": (
            f"WITH img AS (SELECT 'img' || lpad(CAST(id AS VARCHAR), "
            f"12, '0') AS image_id, {_ph} AS h FROM "
            f"(SELECT o_orderkey AS id FROM orders)), "
            f"bands AS (SELECT image_id, h, "
            + ", ".join(f"((h >> {b * 16}) & 65535) AS band{b}"
                        for b in range(4))
            + " FROM img), "
            f"pairs AS ("
            + " UNION ALL ".join(
                f"SELECT a.image_id AS id_a, b.image_id AS id_b, "
                f"bit_count(xor(a.h, b.h)) AS hamming "
                f"FROM bands a JOIN bands b ON a.band{b} = b.band{b} "
                f"AND a.image_id < b.image_id" for b in range(4))
            + ") SELECT id_a, id_b, CAST(MIN(hamming) AS BIGINT) AS "
            f"hamming FROM pairs GROUP BY 1, 2"),
        "image_meta": (
            f"SELECT {geo.parent_sql('cell', 6)} AS tile, "
            f"CAST(COUNT(*) AS BIGINT) AS n_images, "
            f"CAST(SUM(w) AS BIGINT) AS sum_w, "
            f"CAST(SUM(h) AS BIGINT) AS sum_h, "
            f"CAST(SUM(CASE WHEN fmt = 'png' THEN 1 ELSE 0 END) AS "
            f"BIGINT) AS n_png FROM {img_geo} GROUP BY 1"),
        # audio_features: re-derive every decoded WAV sample (synth
        # formula is tri-dialect; dataset.synth_audio_from /
        # audio.ops.synth_samples) — the WAV codec round-trip is inside
        # the hash check.  Integer features only (CLAUDE.md invariant).
        "audio_features": (
            f"WITH g AS (SELECT * FROM {aud_geo}), "
            f"idx AS (SELECT id, ns, cell, aseed, "
            f"unnest(generate_series(0, ns - 1)) AS i FROM g), "
            f"samp AS (SELECT id, ns, cell, i, "
            f"(({geo.mix_sql('aseed + i', 23)} % 65536) - 32768) AS s, "
            f"CASE WHEN i > 0 THEN "
            f"(({geo.mix_sql('aseed + i - 1', 23)} % 65536) - 32768) "
            f"END AS sp FROM idx) "
            f"SELECT 'aud' || lpad(CAST(id AS VARCHAR), 12, '0') AS "
            f"audio_id, CAST(ns AS BIGINT) AS n_samples, "
            f"CAST(SUM(s * s) AS BIGINT) AS sum_sq, "
            f"CAST(MAX(ABS(s)) AS BIGINT) AS peak, "
            f"CAST(SUM(CASE WHEN sp IS NOT NULL AND ((s < 0) != (sp < 0)) "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings, "
            f"{geo.parent_sql('cell', 6)} AS tile "
            f"FROM samp GROUP BY id, ns, cell"),
        # video_frames: re-derive every SAMPLED frame's pixels (frame f
        # = image-synth frame seeded vseed + f; stride 2 mirrors
        # frame_sample(every_k=2)).  NumPy %256 is non-negative; the
        # blue channel can go negative pre-mod, hence the +256 wrap.
        "video_frames": (
            f"WITH base AS (SELECT o_orderkey AS id, "
            f"{geo.mix_sql('o_orderkey', 34)} AS vseed, "
            f"2 + ({geo.mix_sql('o_orderkey', 31)} % 7) AS nf, "
            f"6 + ({geo.mix_sql('o_orderkey', 32)} % 11) AS w, "
            f"6 + ({geo.mix_sql('o_orderkey', 33)} % 11) AS h "
            f"FROM orders WHERE o_orderkey % 4 = 0), "
            f"fr AS (SELECT id, vseed, w, h, "
            f"unnest(generate_series(0, nf - 1, 2)) AS f FROM base), "
            f"seed AS (SELECT id, f, w, h, "
            f"({geo.mix_sql('vseed + f', 51)} % 256) AS r0, "
            f"({geo.mix_sql('vseed + f', 52)} % 256) AS g0, "
            f"({geo.mix_sql('vseed + f', 53)} % 256) AS b0 FROM fr), "
            f"px AS (SELECT id, f, w, h, r0, g0, b0, "
            f"unnest(generate_series(0, w * h - 1)) AS p FROM seed), "
            f"v AS (SELECT id, f, w, h, (p // w) AS y, (p % w) AS x, "
            f"r0, g0, b0 FROM px) "
            f"SELECT 'vid' || lpad(CAST(id AS VARCHAR), 12, '0') AS "
            f"video_id, CAST(f AS BIGINT) AS frame_idx, "
            f"CAST(h AS BIGINT) AS h, CAST(w AS BIGINT) AS w, "
            f"CAST(SUM(((y*7 + x*13 + r0) % 256) "
            f"+ (((y*7 + x*13)*3 + g0) % 256) "
            f"+ ((((y*11 - x*5 + b0) % 256) + 256) % 256)) AS BIGINT) "
            f"AS pix_sum FROM v GROUP BY id, f, h, w"),
        "hausdorff": (
            f"WITH m AS (SELECT c.c_custkey, MIN({d2cs}) AS md "
            f"FROM {cu_geo} c, {su_geo} s GROUP BY 1) "
            f"SELECT MAX(md) AS hausdorff2 FROM m"),
        "track_segments": (
            f"SELECT user_id, CAST(ROW_NUMBER() OVER win AS INTEGER) AS "
            f"seq, {lag2} AS dist2 FROM {ev_track} "
            f"WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id) "
            f"QUALIFY dist2 IS NOT NULL"),
        "cell_tokens": (
            f"SELECT event_id, rtrim(printf('%016x', cell), '0') AS "
            f"token FROM {ev_cells}"),
        # codec round-trip == identity, so the oracle is the plain
        # grouped enumeration (signed-ascending order matches
        # sort_array on BIGINT); the tile is Spark's
        # shiftrightunsigned mirrored per CLAUDE.md
        "cell_vector_codec": (
            f"SELECT ((cell >> {2 * (30 - CODEC_TILE_LEVEL) + 1}) & "
            f"{(1 << (64 - (2 * (30 - CODEC_TILE_LEVEL) + 1))) - 1}) "
            f"AS tile, CAST(ROW_NUMBER() OVER (PARTITION BY ((cell >> "
            f"{2 * (30 - CODEC_TILE_LEVEL) + 1}) & "
            f"{(1 << (64 - (2 * (30 - CODEC_TILE_LEVEL) + 1))) - 1}) "
            f"ORDER BY cell) - 1 AS INTEGER) AS seq, cell AS cell_id, "
            f"CAST(COUNT(*) OVER (PARTITION BY ((cell >> "
            f"{2 * (30 - CODEC_TILE_LEVEL) + 1}) & "
            f"{(1 << (64 - (2 * (30 - CODEC_TILE_LEVEL) + 1))) - 1})) "
            f"AS INTEGER) AS n_ids FROM {ev_cells}"),
        "chain_midpoint": (
            f"WITH seg AS (SELECT user_id, CAST(ROW_NUMBER() OVER win AS "
            f"INTEGER) AS seq, {lag2} AS dist2 FROM {ev_track} "
            f"WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id) "
            f"QUALIFY dist2 IS NOT NULL), "
            f"q AS (SELECT user_id, seq, CAST(floor(dist2 * 1.0e15) AS "
            f"BIGINT) AS qdist FROM seg), "
            f"c AS (SELECT user_id, seq, SUM(qdist) OVER "
            f"(PARTITION BY user_id ORDER BY seq ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND CURRENT ROW) AS cum FROM q), "
            f"ct AS (SELECT *, MAX(cum) OVER (PARTITION BY user_id) AS "
            f"total FROM c), "
            f"hit AS (SELECT * FROM ct WHERE cum * 2 >= total), "
            f"f AS (SELECT user_id, MIN(seq) AS mid_seq FROM hit "
            f"GROUP BY 1) "
            f"SELECT h.user_id, CAST(h.seq AS INTEGER) AS mid_seq, "
            f"CAST(h.cum AS BIGINT) AS cum_units, "
            f"CAST(h.total AS BIGINT) AS total_units "
            f"FROM hit h JOIN f ON h.user_id = f.user_id "
            f"AND h.seq = f.mid_seq"),
    })

    return extra | {
        "tile_counts": (
            f"SELECT {geo.parent_sql('cell', 8)} AS tile, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM {ev_cells} GROUP BY 1"),
        "tile_rollup": (
            f"WITH ev AS (SELECT cell FROM {ev_cells}) "
            f"{rollup_parts}"),
        "tile_grouping_sets": (
            f"WITH t AS (SELECT {geo.parent_sql('cell', 4)} AS t4, "
            f"{geo.parent_sql('cell', 8)} AS t8 FROM {ev_cells}) "
            f"SELECT COALESCE(t4, -1) AS t4, COALESCE(t8, -1) AS t8, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM t "
            f"GROUP BY GROUPING SETS ((t4), (t4, t8), ())"),
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
        "furthest_point": (
            f"WITH q AS (SELECT c_custkey, x AS qx, y AS qy, z AS qz "
            f"FROM {cu_geo} WHERE c_custkey % 10 = 0), "
            f"p AS (SELECT event_id, x AS px, y AS py, z AS pz "
            f"FROM {ev_geo}), "
            f"d AS (SELECT q.c_custkey, p.event_id, {_D2} AS dist2 "
            f"FROM q, p), "
            f"r AS (SELECT c_custkey, event_id, dist2, "
            f"CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey "
            f"ORDER BY dist2 DESC, event_id) AS INTEGER) AS rank "
            f"FROM d) "
            f"SELECT * FROM r WHERE rank <= {KNN_K}"),
    }
