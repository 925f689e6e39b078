"""Deterministic synthetic geotagging: integer key -> (face, i, j) -> cell.

The benchmark/correctness tables carry no coordinates, so the engine
derives them deterministically from integer keys (the same role the
north-star's phash-seeded coordinates play).  The derivation is specified
in pure <2^63 integer arithmetic (Lehmer steps + xor-shift nonlinearity)
so that **Spark SQL, NumPy, and DuckDB compute bit-identical values** —
no 64-bit wraparound, no trig, ANSI-mode safe.  This makes every spatial
query oracle-checkable value-for-value.

Three dialect emitters per function: NumPy (tests/oracles in-process),
Spark Column (JVM codegen hot path), DuckDB SQL string (driver oracle).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels import cellid

P = 2147483647  # 2^31 - 1
M = 48271       # MINSTD multiplier; products < 2^47, BIGINT-safe


# ---------------------------------------------------------------------------
# NumPy dialect
# ---------------------------------------------------------------------------

def _lcg_np(x: np.ndarray) -> np.ndarray:
    return (x % P) * M % P


def _mod_p_inplace(h: np.ndarray, t: np.ndarray) -> None:
    """h %= P in place, for 0 <= h < 2^62, without integer division:
    P = 2^31 - 1 is Mersenne, so 2^31 ≡ 1 (mod P) and folding the high
    bits onto the low bits preserves the residue.  Two folds bring h
    below 2^31 + 1; one conditional subtract lands in [0, P)."""
    np.right_shift(h, 31, out=t)
    np.bitwise_and(h, P, out=h)
    np.add(h, t, out=h)
    np.right_shift(h, 31, out=t)
    np.bitwise_and(h, P, out=h)
    np.add(h, t, out=h)
    np.subtract(h, P, out=h, where=h >= P)


def mix_np(key: np.ndarray, salt: int) -> np.ndarray:
    """Semantically  lcg(xor-fold(lcg(key + c1))) + salt  with
    lcg(x) = (x % P) * M % P — identical values to the Spark/DuckDB
    dialects, computed divisionless (Mersenne fold) and in place."""
    k = np.asarray(key, dtype=np.int64)
    neg = k.min() < 0 if k.size else False
    h = k + (salt * 1000003 + 12345)
    t = np.empty_like(h)
    if neg:  # rare: fall back to true division semantics for negatives
        np.mod(h, P, out=h)
    else:
        _mod_p_inplace(h, t)
    np.multiply(h, M, out=h)
    _mod_p_inplace(h, t)
    np.right_shift(h, 13, out=t)
    np.bitwise_xor(h, t, out=h)
    np.add(h, salt, out=h)
    _mod_p_inplace(h, t)
    np.multiply(h, M, out=h)
    _mod_p_inplace(h, t)
    return h


def geo_np(key) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """key -> (face, i, j) with i,j uniform in [0, 2^30).

    % 32768 == & 32767 and *32768 == <<15 for the nonneg mix outputs —
    same values as the Spark/DuckDB dialects, no integer division."""
    k = np.asarray(key, dtype=np.int64)
    face = mix_np(k, 1) % 6
    i = mix_np(k, 2)
    np.bitwise_and(i, 32767, out=i)
    np.left_shift(i, 15, out=i)
    i3 = mix_np(k, 3)
    np.bitwise_and(i3, 32767, out=i3)
    np.add(i, i3, out=i)
    j = mix_np(k, 4)
    np.bitwise_and(j, 32767, out=j)
    np.left_shift(j, 15, out=j)
    j5 = mix_np(k, 5)
    np.bitwise_and(j5, 32767, out=j5)
    np.add(j, j5, out=j)
    return face, i, j


def cell_np(key) -> np.ndarray:
    """key -> leaf cell id (int64 view)."""
    f, i, j = geo_np(key)
    return cellid.as_i64(cellid.from_face_ij(f, i, j))


def xyz_np(key) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """key -> unit (x,y,z) of the leaf cell center... actually of the
    (face, s, t) midpoint — uses only +,-,*,/ and sqrt (IEEE-exact),
    so DuckDB reproduces it bit-for-bit."""
    from ..kernels import coords
    f, i, j = geo_np(key)
    s = (np.asarray(i, dtype=np.float64) + 0.5) / coords.LIMIT_IJ
    t = (np.asarray(j, dtype=np.float64) + 0.5) / coords.LIMIT_IJ
    u = coords.st_to_uv(s)
    v = coords.st_to_uv(t)
    x, y, z = coords.face_uv_to_xyz(f, u, v)
    return coords.normalize_xyz(x, y, z)


# ---------------------------------------------------------------------------
# Arrow-batched dialect (the default hot path)
#
# The pure-SQL encode below is correct and JVM-resident, but its 8x1024
# literal lookup array costs ~10 s of Catalyst *analysis* per derived
# DataFrame — fine amortized over a 10^12-row cluster job, dominant in
# short benchmark queries.  The pandas-UDF form keeps the plan tiny and
# runs the identical NumPy kernel arithmetic (bit-exact), vectorized
# over Arrow batches — the north-star's stated execution model.
# ---------------------------------------------------------------------------

_GEO_STRUCT = None


def geo_struct_udf():
    """key:int64 -> struct<cell_id:long, x:double, y:double, z:double>."""
    global _GEO_STRUCT
    if _GEO_STRUCT is None:
        import pandas as pd
        from pyspark.sql.pandas.functions import pandas_udf
        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType)
        ret = StructType([StructField("cell_id", LongType()),
                          StructField("x", DoubleType()),
                          StructField("y", DoubleType()),
                          StructField("z", DoubleType())])

        @pandas_udf(ret)
        def _geo(key):
            from ..kernels import cellid as _cellid
            from ..kernels import coords as _coords
            k = key.to_numpy(np.int64)
            f, i, j = geo_np(k)     # the 5 LCG mixes, computed ONCE
            cell = _cellid.as_i64(_cellid.from_face_ij(f, i, j))
            s = (np.asarray(i, dtype=np.float64) + 0.5) / _coords.LIMIT_IJ
            t = (np.asarray(j, dtype=np.float64) + 0.5) / _coords.LIMIT_IJ
            u = _coords.st_to_uv(s)
            v = _coords.st_to_uv(t)
            x, y, z = _coords.face_uv_to_xyz(f, u, v)
            x, y, z = _coords.normalize_xyz(x, y, z)
            return pd.DataFrame({"cell_id": cell, "x": x, "y": y, "z": z})

        _GEO_STRUCT = _geo
    return _GEO_STRUCT


_GEO_CELL = None


def geo_cell_udf():
    """key:int64 -> leaf cell_id:long — the encode kernel alone.

    Catalyst cannot prune struct fields through a pandas UDF, so a
    consumer that needs only the cell id would otherwise pay the full
    geo_struct_udf: 4x the Arrow return bytes plus the xyz flops
    (st_to_uv, face_uv_to_xyz, normalize).  Same mixes, same
    from_face_ij — bit-identical to geo_struct_udf().cell_id."""
    global _GEO_CELL
    if _GEO_CELL is None:
        import pandas as pd
        from pyspark.sql.pandas.functions import pandas_udf
        from pyspark.sql.types import LongType

        @pandas_udf(LongType())
        def _geo_cell(key):
            k = key.to_numpy(np.int64)
            return pd.Series(cell_np(k))

        _GEO_CELL = _geo_cell
    return _GEO_CELL


# ---------------------------------------------------------------------------
# Spark SQL dialect (pure Column expressions -> whole-stage codegen)
# ---------------------------------------------------------------------------

def _lcg_col(x: Column) -> Column:
    return (x % F.lit(P)) * F.lit(M) % F.lit(P)


def mix_col(key: Column, salt: int) -> Column:
    h = _lcg_col(key.cast("long") + F.lit(salt * 1000003 + 12345))
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 13))
    return _lcg_col(h + F.lit(salt))


def geo_cols(key: Column) -> tuple[Column, Column, Column]:
    face = mix_col(key, 1) % F.lit(6)
    i = (mix_col(key, 2) % F.lit(32768)) * F.lit(32768) \
        + (mix_col(key, 3) % F.lit(32768))
    j = (mix_col(key, 4) % F.lit(32768)) * F.lit(32768) \
        + (mix_col(key, 5) % F.lit(32768))
    return face, i, j


def cell_col(key: Column) -> Column:
    from .. import functions as s2f
    face, i, j = geo_cols(key)
    return s2f.from_face_ij_col(face, i, j)


def xyz_cols(key: Column) -> tuple[Column, Column, Column]:
    """key -> unit xyz, same arithmetic as xyz_np (sqrt-only, bit-exact)."""
    face, i, j = geo_cols(key)
    lim = float(1 << 30)
    s = (i.cast("double") + F.lit(0.5)) / F.lit(lim)
    t = (j.cast("double") + F.lit(0.5)) / F.lit(lim)
    u = _st_to_uv_col(s)
    v = _st_to_uv_col(t)
    x, y, z = _face_uv_to_xyz_cols(face, u, v)
    n = F.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def _st_to_uv_col(s: Column) -> Column:
    third = F.lit(1.0) / F.lit(3.0)
    return F.when(s >= 0.5, third * (F.lit(4.0) * s * s - F.lit(1.0))) \
        .otherwise(third * (F.lit(1.0)
                            - F.lit(4.0) * (F.lit(1.0) - s)
                            * (F.lit(1.0) - s)))


def _face_uv_to_xyz_cols(face: Column, u: Column, v: Column):
    one = F.lit(1.0)
    x = (F.when(face == 0, one).when(face == 1, -u).when(face == 2, -u)
         .when(face == 3, -one).when(face == 4, v).otherwise(v))
    y = (F.when(face == 0, u).when(face == 1, one).when(face == 2, -v)
         .when(face == 3, -v).when(face == 4, -one).otherwise(u))
    z = (F.when(face == 0, v).when(face == 1, v).when(face == 2, one)
         .when(face == 3, -u).when(face == 4, -u).otherwise(-one))
    return x, y, z


# ---------------------------------------------------------------------------
# DuckDB SQL dialect (oracle strings)
# ---------------------------------------------------------------------------

def lcg_sql(x: str) -> str:
    return f"((({x}) % {P}) * {M} % {P})"


def mix_sql(key: str, salt: int) -> str:
    h = lcg_sql(f"({key}) + {salt * 1000003 + 12345}")
    hx = f"xor({h}, ({h}) >> 13)"
    return lcg_sql(f"{hx} + {salt}")


def geo_sql(key: str) -> tuple[str, str, str]:
    face = f"({mix_sql(key, 1)} % 6)"
    i = f"(({mix_sql(key, 2)} % 32768) * 32768 + ({mix_sql(key, 3)} % 32768))"
    j = f"(({mix_sql(key, 4)} % 32768) * 32768 + ({mix_sql(key, 5)} % 32768))"
    return face, i, j


_LOOKUP_POS_LIST = "[" + ",".join(str(int(v)) for v in cellid.LOOKUP_POS) + "]"


def cell_sql(key: str) -> str:
    """DuckDB expression: key -> leaf cell id (signed int64), identical to
    cell_np/cell_col.  Uses a literal 1024-entry list for the Hilbert
    nibble table; BIGINT-safe except the final *2+1 which is spelled as a
    two's-complement CASE."""
    face, i, j = geo_sql(key)
    lut = _LOOKUP_POS_LIST
    n = f"(({face}) << 60)"
    bits = f"(({face}) & 1)"
    for k in range(7, -1, -1):
        idx = (f"({bits} + (((({i}) >> {4 * k}) & 15) << 6)"
               f" + (((({j}) >> {4 * k}) & 15) << 2))")
        val = f"(({lut}[{idx} + 1])::BIGINT)"
        n = f"({n} | (({val} >> 2) << {8 * k}))"
        bits = f"({val} & 3)"
    half = 1 << 62
    return (f"(CASE WHEN {n} >= {half} THEN ({n} - {half} - {half}) * 2 + 1 "
            f"ELSE {n} * 2 + 1 END)")


def xyz_sql(key: str) -> tuple[str, str, str]:
    """DuckDB expressions for the unit xyz (sqrt-only arithmetic)."""
    face, i, j = geo_sql(key)
    lim = float(1 << 30)
    s = f"((({i}) + 0.5) / {lim})"
    t = f"((({j}) + 0.5) / {lim})"
    u = _st_to_uv_sql(s)
    v = _st_to_uv_sql(t)
    fx = (f"(CASE WHEN {face}=0 THEN 1.0 WHEN {face}=1 THEN -({u}) "
          f"WHEN {face}=2 THEN -({u}) WHEN {face}=3 THEN -1.0 "
          f"WHEN {face}=4 THEN ({v}) ELSE ({v}) END)")
    fy = (f"(CASE WHEN {face}=0 THEN ({u}) WHEN {face}=1 THEN 1.0 "
          f"WHEN {face}=2 THEN -({v}) WHEN {face}=3 THEN -({v}) "
          f"WHEN {face}=4 THEN -1.0 ELSE ({u}) END)")
    fz = (f"(CASE WHEN {face}=0 THEN ({v}) WHEN {face}=1 THEN ({v}) "
          f"WHEN {face}=2 THEN 1.0 WHEN {face}=3 THEN -({u}) "
          f"WHEN {face}=4 THEN -({u}) ELSE -1.0 END)")
    norm = f"sqrt({fx}*{fx} + {fy}*{fy} + {fz}*{fz})"
    return f"({fx}/{norm})", f"({fy}/{norm})", f"({fz}/{norm})"


def _st_to_uv_sql(s: str) -> str:
    return (f"(CASE WHEN {s} >= 0.5 THEN (1.0/3.0)*(4.0*{s}*{s} - 1.0) "
            f"ELSE (1.0/3.0)*(1.0 - 4.0*(1.0-{s})*(1.0-{s})) END)")


def parent_sql(cell: str, level: int) -> str:
    """DuckDB: ancestor at level (bit math, sign-safe)."""
    lsb = 1 << (2 * (30 - level))
    return f"((({cell}) & {-lsb}) | {lsb})"


def encode_table_sql(table: str, keep: list[str]) -> str:
    """Derived-table SQL running the Hilbert ENCODE over an input
    relation that already provides integer `face, i, j` columns ->
    (keep..., cell).  Same chained-SELECT structure as geo_table_sql
    (the 1024-entry lookup literal appears once; arithmetic identical
    to the NumPy kernel, so results are bit-exact)."""
    k = ", ".join(keep)
    cur = (f"SELECT {k}, face, i, j, {_LOOKUP_POS_LIST} AS lt "
           f"FROM {table}")
    cur = (f"SELECT {k}, face, i, j, lt, (face::BIGINT << 60) AS n, "
           f"(face & 1)::BIGINT AS bits FROM ({cur})")
    for r in range(7, -1, -1):
        idx = (f"(bits + (((i >> {4 * r}) & 15) << 6)"
               f" + (((j >> {4 * r}) & 15) << 2))")
        val = f"((lt[{idx} + 1])::BIGINT)"
        cur = (f"SELECT {k}, face, i, j, lt, "
               f"(n | (({val} >> 2) << {8 * r})) AS n, "
               f"({val} & 3) AS bits FROM ({cur})")
    half = 1 << 62
    cell = (f"(CASE WHEN n >= {half} THEN (n - {half} - {half}) * 2 + 1 "
            f"ELSE n * 2 + 1 END)")
    return f"(SELECT {k}, {cell} AS cell FROM ({cur}))"


def geo_table_sql(table: str, key_sql: str, keep: list[str],
                  with_xyz: bool = True) -> str:
    """Compact oracle emitter: a derived-table SQL string computing
    (keep..., cell[, x, y, z]) for every row of `table`.

    Unlike the single-expression emitters above (which expand the
    Hilbert `bits` recurrence exponentially — MBs of SQL), this chains
    nested SELECTs so every intermediate is referenced *by column name*:
    the 1024-entry lookup table literal appears exactly once and each of
    the 8 encode rounds is ~300 chars.  Arithmetic is identical, so
    results stay bit-exact with the NumPy/Spark dialects.
    """
    k = ", ".join(keep)
    face, i, j = geo_sql(key_sql)
    cur = (f"SELECT {k}, {face} AS face, {i} AS i, {j} AS j, "
           f"{_LOOKUP_POS_LIST} AS lt FROM {table}")
    cur = (f"SELECT {k}, face, i, j, lt, (face::BIGINT << 60) AS n, "
           f"(face & 1)::BIGINT AS bits FROM ({cur})")
    for r in range(7, -1, -1):
        idx = (f"(bits + (((i >> {4 * r}) & 15) << 6)"
               f" + (((j >> {4 * r}) & 15) << 2))")
        val = f"((lt[{idx} + 1])::BIGINT)"
        cur = (f"SELECT {k}, face, i, j, lt, "
               f"(n | (({val} >> 2) << {8 * r})) AS n, "
               f"({val} & 3) AS bits FROM ({cur})")
    half = 1 << 62
    cell = (f"(CASE WHEN n >= {half} THEN (n - {half} - {half}) * 2 + 1 "
            f"ELSE n * 2 + 1 END)")
    if not with_xyz:
        return f"(SELECT {k}, {cell} AS cell FROM ({cur}))"
    lim = float(1 << 30)
    cur = (f"SELECT {k}, face, {cell} AS cell, "
           f"((i + 0.5) / {lim}) AS s, ((j + 0.5) / {lim}) AS t "
           f"FROM ({cur})")
    cur = (f"SELECT {k}, face, cell, {_st_to_uv_sql('s')} AS u, "
           f"{_st_to_uv_sql('t')} AS v FROM ({cur})")
    fx = ("(CASE WHEN face=0 THEN 1.0 WHEN face=1 THEN -u "
          "WHEN face=2 THEN -u WHEN face=3 THEN -1.0 "
          "WHEN face=4 THEN v ELSE v END)")
    fy = ("(CASE WHEN face=0 THEN u WHEN face=1 THEN 1.0 "
          "WHEN face=2 THEN -v WHEN face=3 THEN -v "
          "WHEN face=4 THEN -1.0 ELSE u END)")
    fz = ("(CASE WHEN face=0 THEN v WHEN face=1 THEN v "
          "WHEN face=2 THEN 1.0 WHEN face=3 THEN -u "
          "WHEN face=4 THEN -u ELSE -1.0 END)")
    cur = (f"SELECT {k}, cell, {fx} AS fx, {fy} AS fy, {fz} AS fz "
           f"FROM ({cur})")
    cur = (f"SELECT {k}, cell, fx, fy, fz, "
           f"sqrt(fx*fx + fy*fy + fz*fz) AS nrm FROM ({cur})")
    return (f"(SELECT {k}, cell, fx/nrm AS x, fy/nrm AS y, fz/nrm AS z "
            f"FROM ({cur}))")
