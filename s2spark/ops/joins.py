"""Distributed spatial joins (SURVEY.md §2.3) — the heart of the graft.

Four join shapes, all reduced to relational primitives Catalyst can
optimize (equi-joins it can broadcast / shuffle-hash / sort-merge, with
AQE skew splitting), never nested-loop:

1. `cell_equi_join`     — both sides normalized to one level: plain
   hash equi-join (S2CellIteratorJoin option A, s2cell_iterator_join.h).
2. `containment_range_join` — Hilbert-interval containment expressed as
   BETWEEN range join (range_min/range_max, s2cell_id.h:630-648); for
   small region sets only (broadcast), since Spark has no range-join
   index — large region sets go through `term_join` instead.
3. `term_join`          — the S2RegionTermIndexer scheme
   (s2region_term_indexer.cc:132-289): points emit ancestor "terms" at
   each level in [min_level, max_level]; regions emit covering cells
   clamped to the same level range; candidates = equi-join on the term.
   Mixed-size regions and points meet in one shuffle.
4. `disc_join`          — tolerant join (pairs within chord radius):
   cap coverings on the query side + term join + exact chord^2 filter
   (the refine step, same triage→exact shape as the reference's
   TolerantJoin, s2cell_iterator_join.h:148-186).

Skew: `salt_hot_cells` computes a cheap per-cell histogram, replicates
the build side `factor` ways for hot cells, and splits the probe side
by a deterministic hash — explicit handling per the north rule, with
AQE skew-join as the backstop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import functions as s2f

# Term-indexer defaults (s2region_term_indexer.h:140-189)
MIN_TERM_LEVEL = 4
MAX_TERM_LEVEL = 16


def term_levels(min_level: int = MIN_TERM_LEVEL,
                max_level: int = MAX_TERM_LEVEL,
                level_mod: int = 1) -> list[int]:
    """The level lattice of the term indexer: min_level, min_level +
    level_mod, ... up to the true max (s2region_term_indexer.h:159-170
    — max_level is rounded DOWN onto the lattice).  level_mod in
    {1,2,3} trades index size against covering granularity exactly as
    the reference's Options::set_level_mod."""
    if not 1 <= level_mod <= 3:
        raise ValueError("level_mod must be 1..3")
    true_max = max_level - (max_level - min_level) % level_mod
    return list(range(min_level, true_max + 1, level_mod))


def _term_str(cell: int, ancestor: bool, marker: str, prefix: str) -> str:
    from ..kernels import cellid as _ci
    tok = _ci.to_token([int(cell)])[0]
    return prefix + tok if ancestor else prefix + marker + tok


def region_index_terms(covering, min_level: int = MIN_TERM_LEVEL,
                       max_level: int = MAX_TERM_LEVEL,
                       level_mod: int = 1,
                       optimize_for_space: bool = False,
                       marker: str = "$", prefix: str = "") -> list[str]:
    """String index terms for a canonical covering — the reference's
    GetIndexTermsForCanonicalCovering (s2region_term_indexer.cc:163-
    211): a covering term per cell (below the true max level), the
    cell's own ancestor term UNLESS optimize_for_space (true-max cells
    always, since no query cell can be their descendant), and ancestor
    terms for all proper lattice ancestors (prev-cell dedup).  Ancestor
    terms are bare tokens, covering terms carry the marker character
    (GetTerm, s2region_term_indexer.cc:121-131)."""
    from ..kernels import cellid as _ci
    lattice = term_levels(min_level, max_level, level_mod)
    true_max = lattice[-1]
    terms: list[str] = []
    prev: int | None = None
    prev_level = -1
    for cell in covering:
        cell = int(cell)
        level = int(_ci.level(np.array([cell], dtype=np.int64))[0])
        if level < true_max:
            terms.append(_term_str(cell, False, marker, prefix))
        if level == true_max or not optimize_for_space:
            terms.append(_term_str(cell, True, marker, prefix))
        while (level := level - level_mod) >= min_level:
            anc = int(_ci.as_i64(_ci.parent(
                np.array([cell], dtype=np.int64), level))[0])
            if prev is not None and prev_level > level and int(
                    _ci.as_i64(_ci.parent(np.array([prev],
                                          dtype=np.int64), level))[0]) == anc:
                break  # this ancestor chain is already emitted
            terms.append(_term_str(anc, True, marker, prefix))
        prev = cell
        prev_level = int(_ci.level(np.array([cell], dtype=np.int64))[0])
    return terms


def region_query_terms(covering, min_level: int = MIN_TERM_LEVEL,
                       max_level: int = MAX_TERM_LEVEL,
                       level_mod: int = 1, points_only: bool = False,
                       optimize_for_space: bool = False,
                       marker: str = "$", prefix: str = "") -> list[str]:
    """String query terms for a canonical covering — the reference's
    GetQueryTermsForCanonicalCovering (s2region_term_indexer.cc:
    214-258): an ancestor term per covering cell; then (unless the
    index holds only points) covering terms for the cell itself when
    optimize_for_space (below true max) and for all proper lattice
    ancestors."""
    from ..kernels import cellid as _ci
    lattice = term_levels(min_level, max_level, level_mod)
    true_max = lattice[-1]
    terms: list[str] = []
    prev: int | None = None
    prev_level = -1
    for cell in covering:
        cell = int(cell)
        level = int(_ci.level(np.array([cell], dtype=np.int64))[0])
        terms.append(_term_str(cell, True, marker, prefix))
        if points_only:
            continue
        if optimize_for_space and level < true_max:
            terms.append(_term_str(cell, False, marker, prefix))
        while (level := level - level_mod) >= min_level:
            anc = int(_ci.as_i64(_ci.parent(
                np.array([cell], dtype=np.int64), level))[0])
            if prev is not None and prev_level > level and int(
                    _ci.as_i64(_ci.parent(np.array([prev],
                                          dtype=np.int64), level))[0]) == anc:
                break
            terms.append(_term_str(anc, False, marker, prefix))
        prev = cell
        prev_level = int(_ci.level(np.array([cell], dtype=np.int64))[0])
    return terms


def point_index_terms(leaf_cell: int, min_level: int = MIN_TERM_LEVEL,
                      max_level: int = MAX_TERM_LEVEL,
                      level_mod: int = 1, marker: str = "$",
                      prefix: str = "") -> list[str]:
    """Index terms for a point: ancestor terms at every lattice level
    (s2region_term_indexer.cc:133-154 — the point's own cell is
    indexed as an ancestor term, never a covering term)."""
    from ..kernels import cellid as _ci
    out = []
    for lv in term_levels(min_level, max_level, level_mod):
        anc = int(_ci.as_i64(_ci.parent(
            np.array([int(leaf_cell)], dtype=np.int64), lv))[0])
        out.append(_term_str(anc, True, marker, prefix))
    return out


def point_query_terms(leaf_cell: int, min_level: int = MIN_TERM_LEVEL,
                      max_level: int = MAX_TERM_LEVEL,
                      level_mod: int = 1, points_only: bool = False,
                      marker: str = "$", prefix: str = "") -> list[str]:
    """Query terms for a point target: one ancestor term at the true
    max level, then (unless points-only) covering terms at every
    lattice level (s2region_term_indexer.cc GetQueryTerms(point))."""
    from ..kernels import cellid as _ci
    lattice = term_levels(min_level, max_level, level_mod)
    cell = np.array([int(leaf_cell)], dtype=np.int64)
    lv = lattice[-1]
    out = [_term_str(int(_ci.as_i64(_ci.parent(cell, lv))[0]),
                     True, marker, prefix)]
    if points_only:
        return out
    for lv in reversed(lattice):
        out.append(_term_str(int(_ci.as_i64(_ci.parent(cell, lv))[0]),
                             False, marker, prefix))
    return out


def cell_equi_join(left: DataFrame, right: DataFrame, level: int,
                   cell_left: str = "cell_id", cell_right: str = "cell_id",
                   how: str = "inner") -> DataFrame:
    """Normalize both sides to `level` and hash-equi-join.

    The join key is pure bit math, so it folds into the scan projection;
    Catalyst/AQE pick broadcast vs shuffle by size.
    """
    lk = s2f.prefix_col(F.col(cell_left), level).alias("_jcell")
    rk = s2f.prefix_col(F.col(cell_right), level).alias("_jcell")
    return (left.withColumn("_jcell", lk)
                .join(right.withColumn("_jcell", rk), "_jcell", how)
                .drop("_jcell"))


def containment_range_join(points: DataFrame, regions: DataFrame,
                           point_cell: str = "cell_id",
                           region_cell: str = "rcell",
                           broadcast_regions: bool = True) -> DataFrame:
    """All (point, region-cell) pairs where the region cell is an
    ancestor of the point's leaf cell — Hilbert interval containment.

    BETWEEN joins have no hash strategy; only safe when the region side
    broadcasts (coverings are small: <= max_cells per region).
    """
    r = F.broadcast(regions) if broadcast_regions else regions
    rc = F.col(region_cell)
    cond = F.col(point_cell).between(s2f.range_min_col(rc),
                                     s2f.range_max_col(rc))
    return points.join(r, cond)


def containment_join(points: DataFrame, regions: DataFrame,
                     point_cell: str = "cell_id",
                     region_cell: str = "rcell") -> DataFrame:
    """Same semantics as `containment_range_join`, executed as hash
    equi-joins: region cells are grouped by level (<=31 groups; the
    distinct-level list is a tiny agg) and each group joins on
    parent(point_cell, level).  No nested-loop — this is the scalable
    containment plan; BETWEEN stays for ad-hoc broadcast cases.
    """
    levels = [r[0] for r in
              regions.select(s2f.level_col(F.col(region_cell))
                             .alias("_lv")).distinct().collect()]
    out = None
    for lv in sorted(levels):
        lv = int(lv)
        r = regions.where(s2f.level_col(F.col(region_cell)) == lv) \
                   .withColumn("_jc", s2f.prefix_col(F.col(region_cell), lv)) \
                   .drop(region_cell)
        p = points.withColumn("_jc", s2f.prefix_col(F.col(point_cell), lv))
        j = p.join(r, "_jc").drop("_jc")
        out = j if out is None else out.unionByName(j)
    return out


def point_terms(points: DataFrame, cell_col: str = "cell_id",
                min_level: int = MIN_TERM_LEVEL,
                max_level: int = MAX_TERM_LEVEL,
                level_mod: int = 1) -> DataFrame:
    """Explode each point into ancestor terms at every lattice level
    (the "ancestor terms" fast path, s2region_term_indexer.cc:148-151;
    level_mod per Options::set_level_mod).

    Pure SQL: explode(levels) + dynamic-parent bit math — stays in
    whole-stage codegen; fan-out = |term_levels|.
    """
    lv = F.explode(F.array(*[F.lit(x) for x in
                             term_levels(min_level, max_level,
                                         level_mod)]))
    return (points.withColumn("_lv", lv)
            .withColumn("term", s2f.parent_dyn_col(F.col(cell_col),
                                                   F.col("_lv")))
            .drop("_lv"))


def term_join(points: DataFrame, region_cells: DataFrame,
              point_cell: str = "cell_id", region_cell: str = "rcell",
              min_level: int = MIN_TERM_LEVEL,
              max_level: int = MAX_TERM_LEVEL,
              level_mod: int = 1) -> DataFrame:
    """Candidate pairs: point ⋈ region-covering on the shared term.

    This IS the reference's `index_contains_points_only=true` regime
    (s2region_term_indexer.h:171-189): the point side emits only
    ancestor terms, the region side only covering terms — the general
    region×region two-sided scheme is cell_union_overlap_join.  With
    level_mod > 1 the point terms live on the level lattice and every
    region cell is SNAPPED UP to its nearest lattice ancestor (a
    superset — candidates stay complete, the exact refine filter
    decides).

    `region_cells` must hold one row per covering cell with levels
    within [min_level, max_level] (the coverer enforces this).  The
    guarantee mirrors s2region_term_indexer.h:18-95: every point inside
    any covering cell is matched, because the point emits that cell's id
    as an ancestor term.  Output may contain duplicates when coverings
    overlap — callers dedupe on their pair key after the exact filter.
    """
    pts = point_terms(points, point_cell, min_level, max_level,
                      level_mod)
    if level_mod > 1:
        # snap region cells up onto the lattice: largest allowed
        # level <= the cell's own level (conservative superset)
        allowed = term_levels(min_level, max_level, level_mod)
        lv = s2f.level_col(F.col(region_cell))
        snapped = F.lit(allowed[0])
        for a in allowed[1:]:
            snapped = F.when(lv >= a, F.lit(a)).otherwise(snapped)
        region_cells = region_cells.withColumn(
            region_cell, s2f.parent_dyn_col(F.col(region_cell),
                                            snapped))
    # guard: a region cell COARSER than min_level emits a term no point
    # generates -> silent pair loss.  Denormalize coarse cells to their
    # min_level descendants (bounded: coverer callers never trip this;
    # direct callers with level < min_level pay 4^Δ expansion).
    lv = s2f.level_col(F.col(region_cell))
    fine = region_cells.where(lv >= min_level)
    coarse = region_cells.where(lv < min_level)
    if not coarse.isEmpty():
        import pandas as _pd
        from ..kernels import cellunion as _cu

        rows = coarse.collect()
        other = [c for c in coarse.columns if c != region_cell]
        expanded = []
        for r in rows:
            kids = _cu.denormalize([r[region_cell]], min_level, 1)
            from ..kernels import cellid as _ci
            for k in _ci.as_i64(kids):
                expanded.append((int(k), *[r[c] for c in other]))
        fine = fine.unionByName(coarse.sparkSession.createDataFrame(
            _pd.DataFrame(expanded, columns=[region_cell] + other)))
    return pts.join(fine.withColumnRenamed(region_cell, "term"),
                    "term").drop("term")


def disc_level(radius_rad: float) -> int:
    """Coarsest level whose min cell width covers the radius, so a 3x3
    neighbor ring around the query's cell contains the whole disc
    (kMinWidth inversion, s2metrics.h:181-192)."""
    from ..kernels import metrics
    lv = metrics.MIN_WIDTH.get_level_for_min_value(radius_rad)
    return max(0, min(lv, 30))


def disc_join(points: DataFrame, queries: DataFrame, radius_rad: float,
              query_id: str, point_id: str,
              level: int | None = None,
              broadcast_queries: bool = True) -> DataFrame:
    """Exact tolerant join: all (query, point) pairs with chord^2 <= r2.

    points:  (point_id, cell_id, x, y, z, ...)
    queries: (query_id, cell_id, x, y, z, ...)

    Plan: candidates = 3x3 neighbor ring of level-ℓ cells per query
    (ℓ from the radius via kMinWidth — ring covers the disc; tiny
    pandas-UDF only on the query side) equi-joined against
    parent(point_cell, ℓ); then the exact chord^2 filter.  Each point
    lives in exactly one level-ℓ cell and ring cells are distinct, so
    pairs are already unique — no dedup shuffle.  Correctness rests on
    the exact filter alone (same doubles as the DuckDB oracle); the
    ring is only a candidate superset (TolerantJoin analogue,
    s2cell_iterator_join.h:148-186).
    """
    import math

    from ..kernels import metrics
    r2 = (2.0 * math.sin(0.5 * min(radius_rad, math.pi))) ** 2
    lv = disc_level(radius_rad) if level is None else level
    # coverage guarantee: escaping an r-ring crosses >= r cells, each
    # >= kMinWidth(lv) wide.  lv is chosen so r=1 — EXCEPT when the
    # radius exceeds kMinWidth(0) (~54 deg): level clamps at 0 and one
    # ring of face cells misses the antipodal face, so widen the ring
    # until r * kMinWidth covers the radius (2 rings already span all
    # 6 faces).
    rings = max(1, math.ceil(radius_rad / metrics.MIN_WIDTH.get_value(lv)))
    # ring cells the disc cannot touch (exact min-chord² > r²) are
    # pruned per query BEFORE the join — ~half the 3x3 ring on
    # average, so ~half the candidate rows through the chord² filter.
    # The pad absorbs the distance kernel's float rounding; the exact
    # r² filter below is unchanged, so results are identical.
    r2pad = r2 * (1.0 + 1e-9) + 1e-12
    q = (queries.select(query_id,
                        F.col("x").alias("_qx"), F.col("y").alias("_qy"),
                        F.col("z").alias("_qz"),
                        F.explode(s2f.s2_disk_cells_within(
                            F.col("cell_id"), F.lit(lv), F.lit(rings),
                            F.col("x"), F.col("y"), F.col("z"),
                            F.lit(r2pad))).alias("_rc"))
         .select(query_id, "_qx", "_qy", "_qz",
                 s2f.prefix_col(F.col("_rc"), lv).alias("_jc")))
    if broadcast_queries:
        # the exploded ring table is |queries| * 9 rows — broadcasting
        # it turns the join map-side: the big point table is never
        # shuffled (statistics after an explode+UDF are too opaque for
        # AQE to pick this on its own)
        q = F.broadcast(q)
    p = points.withColumn("_jc", s2f.prefix_col(F.col("cell_id"), lv))
    d2 = s2f.chord2_col(F.col("_qx"), F.col("_qy"), F.col("_qz"),
                        F.col("x"), F.col("y"), F.col("z"))
    return (p.join(q, "_jc")
             .where(d2 <= F.lit(r2))
             .select(query_id, point_id, d2.alias("dist2")))


def disc_join_km(points: DataFrame, queries: DataFrame, radius_km: float,
                 query_id: str, point_id: str, **kw) -> DataFrame:
    """disc_join with a metric radius (S2Earth conversion,
    s2earth.h:147-183; earth radius 6,371,010 m)."""
    from ..kernels import earth
    return disc_join(points, queries, earth.km_to_radians(radius_km),
                     query_id, point_id, **kw)


def salt_hot_cells(probe: DataFrame, build: DataFrame, key: str,
                   probe_uid: str, factor: int = 8,
                   hot_threshold: int = 100_000
                   ) -> tuple[DataFrame, DataFrame, list]:
    """Explicit hot-key salting for cell equi-joins (north rule).

    A cheap pre-pass histograms the probe side per cell (map-side
    combine makes this one small shuffle); cells above `hot_threshold`
    get split `factor` ways: probe rows pick a deterministic salt from
    their uid hash, build rows replicate across all salts.  Returns the
    salted frames joined on (key, _salt) plus the hot-cell list for
    metrics.  Mirrors S2RegionSharder's weight-balanced assignment
    (s2region_sharder.cc:114-136) in spirit; AQE skew-join remains on as
    backstop for moderate skew.
    """
    hot = [r[0] for r in (probe.groupBy(key).count()
                          .where(F.col("count") > hot_threshold)
                          .select(key).collect())]
    if not hot:
        z = F.lit(0)
        return probe.withColumn("_salt", z), build.withColumn("_salt", z), []
    hot_col = F.col(key).isin(hot)
    p = probe.withColumn(
        "_salt", F.when(hot_col, F.pmod(F.xxhash64(F.col(probe_uid)),
                                        F.lit(factor)).cast("int"))
                  .otherwise(F.lit(0)))
    salts = F.when(hot_col, F.array(*[F.lit(i) for i in range(factor)])) \
             .otherwise(F.array(F.lit(0)))
    b = build.withColumn("_salt", F.explode(salts))
    return p, b, hot


def cell_union_overlap_join(a_cells: DataFrame, b_cells: DataFrame,
                            a_id: str, b_id: str,
                            cell_a: str = "cell",
                            cell_b: str = "cell") -> DataFrame:
    """Region × region intersection join over CELL-UNION regions —
    the S2CellIndex / s2cell_iterator_join regime
    (s2cell_iterator_join.h:148-186, s2region_term_indexer.h:18-95):
    two normalized cell unions intersect iff some cell of one
    CONTAINS a cell of the other (S2 cells are nested — overlap is
    always containment), so candidates come from TWO ancestor-term
    equi-joins (A-ancestors ⋈ B-cells and B-ancestors ⋈ A-cells), no
    cross join and no geometry kernel.  Exact by construction — no
    refine filter needed.  -> distinct (a_id, b_id) pairs.

    Each side fans out by its cell level (ancestors down to level 0)
    and stays in whole-stage codegen.  The join key is the COMPOSITE
    (level, shifted Hilbert prefix) — never a parent cell id, whose
    constant lsb-marker low bits collapse long-keyed join hashmaps
    into collision chains (ADVICE r4; measured 31x on prefix_col)."""
    def ancestors(df, idc, cellc):
        lv = F.explode(F.sequence(
            F.lit(0), s2f.level_col(F.col(cellc)))).alias("_lv")
        return (df.select(idc, F.col(cellc), lv)
                .select(idc, F.col("_lv").alias("lv"),
                        s2f.prefix_dyn_col(F.col(cellc), F.col("_lv"))
                        .alias("pfx")))

    def keys(df, idc, cellc):
        lv = s2f.level_col(F.col(cellc))
        return df.select(idc, lv.alias("lv"),
                         s2f.prefix_dyn_col(F.col(cellc), lv)
                         .alias("pfx"))

    a_terms = ancestors(a_cells, a_id, cell_a)
    b_keys = keys(b_cells, b_id, cell_b)
    b_terms = ancestors(b_cells, b_id, cell_b)
    a_keys = keys(a_cells, a_id, cell_a)
    d1 = a_terms.join(b_keys, ["lv", "pfx"]).select(a_id, b_id)
    d2 = b_terms.join(a_keys, ["lv", "pfx"]).select(a_id, b_id)
    return d1.unionByName(d2).distinct()
