"""Spark column functions for S2 cell ids.

Two tiers, chosen by what keeps the 100 TB hot path fastest:

1. **Pure Spark SQL expressions** (this module's `*_col` builders): all
   cell-id hierarchy math (level/parent/range/contains) is closed-form
   bit arithmetic on int64 — expressed with shifts/masks so Catalyst
   folds it into whole-stage codegen.  Even the Hilbert encode
   (face,i,j) -> cell id runs JVM-side: the 1024-entry nibble lookup
   table becomes a literal array + `element_at`, unrolled 8 rounds.
   No Python, no Arrow transfer, fully vectorized by Tungsten.

2. **Arrow-batched pandas UDFs** for paths that need doubles + trig
   (lat/lng -> cell id, cell center), backed by the bit-exact NumPy
   kernels in s2spark.kernels.cellid.

Cell ids are stored as int64 (two's-complement view of the reference's
uint64; all bit identities hold).  See SURVEY.md §2.2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                               StringType, StructField, StructType)

_LATLNG = StructType([StructField("lat", DoubleType()),
                      StructField("lng", DoubleType())])
_XYZ = StructType([StructField("x", DoubleType()),
                   StructField("y", DoubleType()),
                   StructField("z", DoubleType())])

from .kernels import cellid

MAX_LEVEL = cellid.MAX_LEVEL


def spread(df, parts: int | None = None):
    """Widen the map side of a broadcast sweep to the session's
    default parallelism.

    A crossJoin/broadcast-hash-join inherits the streaming side's
    partitioning; a small single-file table scans as ONE split, so the
    whole sweep (candidate expansion + distance expressions) runs in
    one task no matter how many cores exist.  Round-robin repartition
    up to defaultParallelism — a shuffle of just the probe rows, paid
    once, never on the broadcast side.  No-op when the side is already
    at least that wide (cluster-scale inputs with natural splits keep
    their partitioning and skip the exchange)."""
    sess = df.sparkSession
    want = int(parts or sess.sparkContext.defaultParallelism)
    try:
        have = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(want)
    return df if have >= want else df.repartition(want)


# ---------------------------------------------------------------------------
# tier 1: pure SQL bit math (JVM codegen, no UDF)
# ---------------------------------------------------------------------------

def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def parent_col(cell: Column, level: int) -> Column:
    """Ancestor at a fixed level: (id & -lsb) | lsb — pure bit math
    (s2cell_id.h:650-658)."""
    lsb = lsb_for_level(level)
    return (cell.bitwiseAND(F.lit(-lsb))).bitwiseOR(F.lit(lsb))


def parent_dyn_col(cell: Column, level: Column) -> Column:
    """Ancestor at a per-row level column — lsb via a 31-entry literal
    lookup (shiftleft takes no Column shift), then the same bit math."""
    lut = F.array(*[F.lit(1 << (2 * (30 - lv))) for lv in range(31)])
    lsb = F.element_at(lut, (level + F.lit(1)).cast("int"))
    return cell.bitwiseAND(-lsb).bitwiseOR(lsb)


def prefix_col(cell: Column, level: int) -> Column:
    """Hash-friendly equi-join key for a fixed level: the Hilbert
    prefix  id >>> (2*(30-level)+1).

    Equal iff the two cells share the same level-`level` ancestor (for
    cells at levels >= `level`).  Join on THIS, not on parent_col: a
    parent id keeps the constant lsb marker in its low bits, so every
    level-ℓ key is congruent mod 2^(2*(30-ℓ)+1) — Spark's long-keyed
    join maps degenerate into collision chains (measured 31x slower on
    a 20M-row broadcast join).  The shifted prefix is dense and
    well-distributed."""
    return F.shiftrightunsigned(cell, 2 * (MAX_LEVEL - level) + 1)


def prefix_dyn_col(cell: Column, level: Column) -> Column:
    """prefix_col with a per-row level column: the shifted Hilbert
    prefix id >>> (2*(30-level)+1).  Pair it with the level itself as
    a composite join key — (level, prefix) is dense where the
    parent_dyn_col id keeps the constant lsb marker in its low bits
    and collapses long-keyed join hashmaps into collision chains."""
    shift = (F.lit(2) * (F.lit(MAX_LEVEL) - level) + F.lit(1)).cast("int")
    return F.call_function("shiftrightunsigned", cell, shift)


def lsb_col(cell: Column) -> Column:
    return cell.bitwiseAND(-cell)


def level_col(cell: Column) -> Column:
    """level = 30 - ctz(id)/2, ctz via bit_count(lsb-1)."""
    return (F.lit(MAX_LEVEL)
            - F.bit_count(lsb_col(cell) - F.lit(1)).cast("long") / F.lit(2)
            ).cast("long")


def range_min_col(cell: Column) -> Column:
    return cell - (lsb_col(cell) - F.lit(1))


def range_max_col(cell: Column) -> Column:
    return cell + (lsb_col(cell) - F.lit(1))


def contains_cond(ancestor: Column, descendant: Column) -> Column:
    """Join/filter condition: ancestor contains descendant.

    Sign-safe for int64 storage: a cell's range never crosses the
    signed/unsigned boundary because range endpoints share the cell's
    face bits."""
    return descendant.between(range_min_col(ancestor),
                              range_max_col(ancestor))


_LOOKUP_POS_SQL = "array(" + ",".join(
    str(int(v)) + "L" for v in cellid.LOOKUP_POS) + ")"


def from_face_ij_col(face: Column, i: Column, j: Column) -> Column:
    """Hilbert encode (face,i,j)->leaf id in pure Spark SQL.

    Mirrors the kernel's 8 lookup rounds (s2cell_id.cc:271-313) with the
    nibble table inlined as a literal array; Java long arithmetic wraps
    exactly like the reference's uint64 (two's complement)."""
    f = face.cast("long")
    i = i.cast("long")
    j = j.cast("long")
    n = F.shiftleft(f, 60)
    bits = f.bitwiseAND(F.lit(1))
    lookup = F.expr(_LOOKUP_POS_SQL)
    for k in range(7, -1, -1):
        idx = (bits
               + F.shiftleft(F.shiftrightunsigned(i, 4 * k)
                             .bitwiseAND(F.lit(15)), 6)
               + F.shiftleft(F.shiftrightunsigned(j, 4 * k)
                             .bitwiseAND(F.lit(15)), 2))
        val = F.element_at(lookup, (idx + F.lit(1)).cast("int"))
        n = n.bitwiseOR(F.shiftleft(F.shiftrightunsigned(val, 2), 8 * k))
        bits = val.bitwiseAND(F.lit(3))
    # id = n*2 + 1 wraps into the sign bit for faces 4-5; spell out the
    # two's-complement wrap so the expression is ANSI-mode safe
    half = F.lit(1 << 62)
    return F.when(n >= half, (n - half - half) * F.lit(2) + F.lit(1)) \
        .otherwise(n * F.lit(2) + F.lit(1))


def face_col(cell: Column) -> Column:
    return F.shiftrightunsigned(cell, 61)


# ---------------------------------------------------------------------------
# tier 2: Arrow-batched pandas UDFs over the NumPy kernels
# ---------------------------------------------------------------------------

@pandas_udf(LongType())
def s2_cellid_from_latlng(lat: pd.Series, lng: pd.Series) -> pd.Series:
    ids = cellid.from_latlng(lat.to_numpy(np.float64),
                             lng.to_numpy(np.float64))
    return pd.Series(cellid.as_i64(ids))


@pandas_udf(LongType())
def s2_cellid_from_xyz(x: pd.Series, y: pd.Series,
                       z: pd.Series) -> pd.Series:
    ids = cellid.from_xyz(x.to_numpy(np.float64),
                          y.to_numpy(np.float64),
                          z.to_numpy(np.float64))
    return pd.Series(cellid.as_i64(ids))


@pandas_udf(StringType())
def s2_token(cell: pd.Series) -> pd.Series:
    return pd.Series(cellid.to_token(cell.to_numpy(np.int64)))


@pandas_udf(LongType())
def s2_from_token(token: pd.Series) -> pd.Series:
    return pd.Series(cellid.as_i64(cellid.from_token(token.tolist())))


@pandas_udf(_LATLNG)
def s2_cell_center(cell: pd.Series) -> pd.DataFrame:
    lat, lng = cellid.to_latlng(cell.to_numpy(np.int64))
    return pd.DataFrame({"lat": lat, "lng": lng})


@pandas_udf(_XYZ)
def s2_cell_center_xyz(cell: pd.Series) -> pd.DataFrame:
    x, y, z = cellid.to_point(cell.to_numpy(np.int64))
    return pd.DataFrame({"x": x, "y": y, "z": z})


@pandas_udf(ArrayType(LongType()))
def s2_all_neighbors(cell: pd.Series, level: pd.Series) -> pd.Series:
    arrs = cellid.append_all_neighbors(cell.to_numpy(np.int64),
                                       level.to_numpy(np.int64))
    return pd.Series([cellid.as_i64(a).tolist() for a in arrs])


@pandas_udf(_XYZ)
def s2_xyz_from_latlng(lat: pd.Series, lng: pd.Series) -> pd.DataFrame:
    from .kernels import coords
    x, y, z = coords.latlng_to_xyz(lat.to_numpy(np.float64),
                                   lng.to_numpy(np.float64))
    return pd.DataFrame({"x": x, "y": y, "z": z})


def make_covering_udf(max_cells: int = 8, min_level: int = 0,
                      max_level: int = MAX_LEVEL, level_mod: int = 1,
                      interior: bool = False):
    """Per-row cap covering: (lat, lng, radius_rad) -> array<long>.

    The coverer recursion is bounded (max_cells * levels), so each row is
    O(1); rows stream through Arrow batches."""

    @pandas_udf(ArrayType(LongType()))
    def s2_cap_covering(lat: pd.Series, lng: pd.Series,
                        radius: pd.Series) -> pd.Series:
        from .kernels.coverer import RegionCoverer
        from .kernels.region import Cap
        rc = RegionCoverer(max_cells=max_cells, min_level=min_level,
                           max_level=max_level, level_mod=level_mod)
        out = []
        for la, ln, r in zip(lat.to_numpy(np.float64),
                             lng.to_numpy(np.float64),
                             radius.to_numpy(np.float64)):
            cap = Cap.from_latlng_radius(la, ln, r)
            cells = (rc.get_interior_covering(cap) if interior
                     else rc.get_covering(cap))
            out.append(cellid.as_i64(cells).tolist())
        return pd.Series(out)

    return s2_cap_covering


def make_cap_covering_xyz_udf(max_cells: int = 8, min_level: int = 0,
                              max_level: int = MAX_LEVEL, level_mod: int = 1,
                              interior: bool = False):
    """Per-row cap covering from a unit axis: (x,y,z,radius2) -> array<long>.

    radius2 is the squared-chord radius (the S1ChordAngle proxy used by
    every distance filter), so covering + exact filter share one unit.
    """

    @pandas_udf(ArrayType(LongType()))
    def s2_cap_covering_xyz(x: pd.Series, y: pd.Series, z: pd.Series,
                            radius2: pd.Series) -> pd.Series:
        from .kernels.coverer import RegionCoverer
        from .kernels.region import Cap
        rc = RegionCoverer(max_cells=max_cells, min_level=min_level,
                           max_level=max_level, level_mod=level_mod)
        out = []
        for xx, yy, zz, r2 in zip(x.to_numpy(np.float64),
                                  y.to_numpy(np.float64),
                                  z.to_numpy(np.float64),
                                  radius2.to_numpy(np.float64)):
            cap = Cap((xx, yy, zz), r2)
            cells = (rc.get_interior_covering(cap) if interior
                     else rc.get_covering(cap))
            out.append(cellid.as_i64(cells).tolist())
        return pd.Series(out)

    return s2_cap_covering_xyz


@pandas_udf(ArrayType(LongType()))
def s2_disk_cells(cell: pd.Series, level: pd.Series,
                  rings: pd.Series) -> pd.Series:
    """All cells at `level` within `rings` neighbor-rings of the cell's
    ancestor — the kNN candidate frontier (SURVEY.md §3.3).

    ring r ∪= AppendAllNeighbors(ring r-1); cross-face wrap handled by
    the kernel (s2cell_id.cc:569-610).  Bounded: (2r+1)^2 cells/row.
    """
    lv = level.to_numpy(np.int64)
    rg = rings.to_numpy(np.int64)
    rows, cells = cellid.disk_cells_batch(
        cell.to_numpy(np.int64), lv, rg)
    counts = np.bincount(rows, minlength=len(cell))
    splits = np.split(cellid.as_i64(cells), np.cumsum(counts)[:-1])
    return pd.Series([a.tolist() for a in splits])


@pandas_udf(ArrayType(LongType()))
def s2_disk_cells_within(cell: pd.Series, level: pd.Series,
                         rings: pd.Series, x: pd.Series, y: pd.Series,
                         z: pd.Series, r2pad: pd.Series) -> pd.Series:
    """s2_disk_cells pruned to cells whose exact min chord² to the
    row's point is <= r2pad (S2Cell::GetDistance semantics,
    s2cell.cc:389-416) — the disc_join candidate ring minus the cells
    the disc cannot touch (~half of a 3x3 ring on average).

    Conservative: any point within chord² r2 of the query lies in a
    ring cell whose min distance <= r2 <= r2pad, so pruning preserves
    the candidate-superset guarantee (callers pad r2 by a relative
    epsilon to absorb the distance kernel's float rounding)."""
    from .ops.cells import point_cell_chord2  # lazy: ops imports us
    lv = level.to_numpy(np.int64)
    rg = rings.to_numpy(np.int64)
    rows, cells = cellid.disk_cells_batch(
        cell.to_numpy(np.int64), lv, rg)
    p = np.column_stack([x.to_numpy(np.float64),
                         y.to_numpy(np.float64),
                         z.to_numpy(np.float64)])[rows]
    keep = (point_cell_chord2(p, cellid.as_i64(cells))
            <= r2pad.to_numpy(np.float64)[rows])
    rows, cells = rows[keep], cells[keep]
    counts = np.bincount(rows, minlength=len(cell))
    splits = np.split(cellid.as_i64(cells), np.cumsum(counts)[:-1])
    return pd.Series([a.tolist() for a in splits])


def chord2_col(x1: Column, y1: Column, z1: Column,
               x2: Column, y2: Column, z2: Column) -> Column:
    """Squared chord distance |a-b|^2 — the S1ChordAngle proxy; pure SQL
    so kNN / disc filters stay in codegen."""
    dx, dy, dz = x1 - x2, y1 - y2, z1 - z2
    return dx * dx + dy * dy + dz * dz


def seg_chord2_col(px: Column, py: Column, pz: Column,
                   ax: Column, ay: Column, az: Column,
                   bx: Column, by: Column, bz: Column) -> Column:
    """Point→segment chord² (kernels.edges.point_segment_chord2) as a
    pure SQL expression — IDENTICAL double operation order to the
    NumPy kernel and the DuckDB oracle CTE (_seg_chord2_cte), so the
    three dialects stay bit-exact while the Spark side rides
    WholeStageCodegen instead of an Arrow UDF round-trip."""
    nx = ay * bz - az * by
    ny = az * bx - ax * bz
    nz = ax * by - ay * bx
    nn = nx * nx + ny * ny + nz * nz
    pn = px * nx + py * ny + pz * nz
    w1 = (ny * az - nz * ay) * px + (nz * ax - nx * az) * py \
        + (nx * ay - ny * ax) * pz
    w2 = (by * nz - bz * ny) * px + (bz * nx - bx * nz) * py \
        + (bx * ny - by * nx) * pz
    d2a = chord2_col(px, py, pz, ax, ay, az)
    d2b = chord2_col(px, py, pz, bx, by, bz)
    sin2 = F.least(F.greatest((pn * pn) / nn, F.lit(0.0)), F.lit(1.0))
    perp = F.lit(2.0) - F.lit(2.0) * F.sqrt(
        F.least(F.greatest(F.lit(1.0) - sin2, F.lit(0.0)), F.lit(1.0)))
    ends = F.least(d2a, d2b)
    return F.when((w1 > 0) & (w2 > 0),
                  F.least(perp, ends)).otherwise(ends)


def make_edge_covering_udf(max_cells: int = 8, min_level: int = 0,
                           max_level: int = MAX_LEVEL):
    """Batched covering of geodesic segments: (ax..az, bx..bz) ->
    array<long>.  Candidate generation for the indexed
    S2CrossingEdgeQuery plan (s2crossing_edge_query.h:17-24).

    min_level > 0 selects the FIXED-LEVEL regime (all min_level cells
    each edge may touch — the track_edge_index contract); otherwise
    the adaptive per-edge `max_cells` budget down to max_level.  Both
    run the level-synchronous pair-BFS kernel (kernels/edge_cover.py)
    — one NumPy pass per Arrow batch instead of ~10 ms/edge of
    per-row RegionCoverer Python (VERDICT r4 #2)."""
    from .kernels import edge_cover

    @pandas_udf(ArrayType(LongType()))
    def s2_edge_covering(ax: pd.Series, ay: pd.Series, az: pd.Series,
                         bx: pd.Series, by: pd.Series, bz: pd.Series
                         ) -> pd.Series:
        a = np.column_stack([ax.to_numpy(np.float64),
                             ay.to_numpy(np.float64),
                             az.to_numpy(np.float64)])
        b = np.column_stack([bx.to_numpy(np.float64),
                             by.to_numpy(np.float64),
                             bz.to_numpy(np.float64)])
        eidx, cells = edge_cover.edge_coverings_batch(
            a, b,
            level=min_level if min_level > 0 else None,
            max_cells=max_cells,
            max_level=max_level)
        out = [[] for _ in range(len(a))]
        for i, c in zip(eidx.tolist(), cells.tolist()):
            out[i].append(c)
        return pd.Series(out)

    return s2_edge_covering


def make_edge_ring_covering_udf(level: int, rings: int):
    """Fixed-level edge covering expanded by `rings` neighbor rings,
    deduped per edge — the candidate frontier of the edge-target
    distance join (ops/edges.edge_within_join) in ONE Arrow stage
    (covering kernel + disk_cells_batch fused; a separate
    s2_disk_cells stage paid a second Python worker pass plus a
    dropDuplicates shuffle of the exploded intermediate)."""
    from .kernels import cellid as _ck
    from .kernels import edge_cover

    @pandas_udf(ArrayType(LongType()))
    def s2_edge_ring_covering(ax: pd.Series, ay: pd.Series,
                              az: pd.Series, bx: pd.Series,
                              by: pd.Series, bz: pd.Series
                              ) -> pd.Series:
        a = np.column_stack([ax.to_numpy(np.float64),
                             ay.to_numpy(np.float64),
                             az.to_numpy(np.float64)])
        b = np.column_stack([bx.to_numpy(np.float64),
                             by.to_numpy(np.float64),
                             bz.to_numpy(np.float64)])
        eidx, cells = edge_cover.edge_coverings_batch(a, b,
                                                      level=level)
        rows, disk = _ck.disk_cells_batch(cells, level, rings)
        e2 = eidx[rows]
        disk = _ck.as_i64(disk)
        order = np.lexsort((disk, e2))
        e2, disk = e2[order], disk[order]
        keep = np.ones(e2.size, dtype=bool)
        keep[1:] = (e2[1:] != e2[:-1]) | (disk[1:] != disk[:-1])
        e2, disk = e2[keep], disk[keep]
        out = [[] for _ in range(len(a))]
        for i, c in zip(e2.tolist(), disk.tolist()):
            out[i].append(c)
        return pd.Series(out)

    return s2_edge_ring_covering
