"""Distributed surface for the S2 binary codecs (kernels/codecs.py).

Two shapes:

- cell-vector codec: per-group sorted cell_id arrays round-tripped
  through the EncodedS2CellIdVector wire format
  (encoded_s2cell_id_vector.cc:61-180) as Arrow-batched pandas UDFs
  over a ``binary`` column.  This is the storage contract for compact
  covering/index payloads in parquet: one groupBy (map-side combined
  collect_list), two narrow UDF projections, one posexplode — no extra
  shuffle beyond the agg, so the plan scales with the number of
  groups.

- polygon codec: per-polygon S2Polygon compressed encoding (v4,
  s2polygon.cc:1475-1500) round-tripped inside one applyInPandas group
  per polygon, vertices arriving as a DataFrame column (no closure
  capture; same distribution shape as ops/boolean.polygon_overlay).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, LongType

from ..kernels import cellid as ck
from ..kernels import codecs as cx


# ---------------------------------------------------------------------------
# cell-vector codec UDFs
# ---------------------------------------------------------------------------

@F.pandas_udf(BinaryType())
def encode_cell_vector(ids: pd.Series) -> pd.Series:
    return ids.map(lambda v: cx.encode_cellid_vector(
        np.asarray(v, dtype=np.int64)))


@F.pandas_udf(ArrayType(LongType()))
def decode_cell_vector(buf: pd.Series) -> pd.Series:
    return buf.map(lambda b: cx.decode_cellid_vector(b)
                   .astype(np.int64).tolist())


def cell_vector_roundtrip(df: DataFrame, group_col: str,
                          cell_col: str = "cell_id") -> DataFrame:
    """Group rows, pack each group's sorted cell ids through the
    EncodedS2CellIdVector codec, unpack, and re-emit one row per id:
    (group, seq, cell_id, n_ids).  Bit-exact round-trip is the
    correctness contract; n_ids rides along so the oracle also pins
    group sizes."""
    packed = (df.groupBy(group_col)
              .agg(F.sort_array(F.collect_list(cell_col)).alias("ids"))
              .withColumn("enc", encode_cell_vector(F.col("ids")))
              .withColumn("dec", decode_cell_vector(F.col("enc")))
              .withColumn("n_ids", F.size("dec").cast("int")))
    return (packed.select(group_col, "n_ids",
                          F.posexplode("dec").alias("seq", "cell_id"))
            .select(F.col(group_col),
                    F.col("seq").cast("int").alias("seq"),
                    F.col("cell_id"), F.col("n_ids")))


# ---------------------------------------------------------------------------
# polygon codec
# ---------------------------------------------------------------------------

POLY_CODEC_SCHEMA = ("poly_id long, seq int, site_cell long, "
                     "enc_len int, version int")


def polygon_codec_roundtrip(spark: SparkSession, loops: dict | DataFrame,
                            snap_level: int) -> DataFrame:
    """Per polygon: snap vertices to `snap_level` cell centers, encode
    with the compressed S2Polygon coder (v4 — compact hint picks it
    because every vertex is then a cell center), decode, and emit each
    decoded vertex's leaf cell id plus the encoded length and version
    byte.  All-integer output -> tri-dialect-safe value hash."""
    from .pip import loops_to_df
    vdf = loops if isinstance(loops, DataFrame) else \
        loops_to_df(spark, loops)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        verts = np.asarray(pdf["vertices"].iloc[0],
                           dtype=np.float64).reshape(-1, 3)
        rows = polygon_codec_rows(pid, verts, snap_level)
        return pd.DataFrame(rows, columns=["poly_id", "seq",
                                           "site_cell", "enc_len",
                                           "version"])

    return vdf.groupBy("poly_id").applyInPandas(run, POLY_CODEC_SCHEMA)


def polygon_codec_rows(pid: int, verts: np.ndarray,
                       snap_level: int) -> list[tuple]:
    """Driver-side kernel shared verbatim by the distributed op and
    the materialized oracle."""
    cid = ck.parent(ck.from_xyz(verts[:, 0], verts[:, 1], verts[:, 2]),
                    snap_level)
    x, y, z = ck.to_point(cid)
    snapped = np.stack([x, y, z], axis=1)
    enc = cx.encode_polygon([snapped], hint="compact")
    dec = cx.decode_polygon(enc)
    out = []
    for lp in dec:
        v = lp["vertices"]
        leaf = ck.as_i64(ck.from_xyz(v[:, 0], v[:, 1], v[:, 2]))
        out.extend((pid, s, int(c), len(enc), int(enc[0]))
                   for s, c in enumerate(leaf))
    return out


def shape_index_codec_rows(pid: int, verts: np.ndarray) -> list[tuple]:
    """Build the loop's MutableS2ShapeIndex analogue, encode it in the
    EncodedS2ShapeIndex wire format, decode it back and emit one row
    per indexed (cell, shape) with the decoded edge count and
    contains_center bit plus the encoded byte length — any bit error
    anywhere in the three-layer format (header varint / cell-id
    vector / string vector / cell encodings) changes the rows."""
    from collections import defaultdict

    from ..kernels import codecs as cx
    from ..kernels.loops import Loop
    from . import pip
    cell_rows, edge_rows = pip._index_loop_rows(0, Loop(verts))
    per_cell: dict = defaultdict(lambda: [False, []])
    for (cid, _p, cc, _x, _y, _z) in cell_rows:
        per_cell[int(cid)][0] = bool(cc)
    for (cid, _p, e, *_rest) in edge_rows:
        per_cell[int(cid)][1].append(int(e))
    u64 = (1 << 64) - 1
    cells = [(cid & u64, [(0, cc, sorted(ed))])
             for cid, (cc, ed) in sorted(
                 per_cell.items(), key=lambda kv: kv[0] & u64)]
    buf = cx.encode_shape_index(cells, num_shape_ids=1)
    max_edges, back = cx.decode_shape_index(buf, num_shape_ids=1)
    assert max_edges == 10
    out = []
    for (cid, cl) in back:
        (sid, cc, edges) = cl[0]
        out.append((pid, np.uint64(cid).astype(np.int64),
                    len(edges), bool(cc), len(buf)))
    return out


def shape_index_codec_roundtrip(spark: SparkSession,
                                loops: dict | DataFrame) -> DataFrame:
    """Distributed EncodedS2ShapeIndex round-trip: one applyInPandas
    group per polygon (the parallel axis at a million polygons)."""
    from . import pip
    df = loops if isinstance(loops, DataFrame) \
        else pip.loops_to_df(spark, loops)
    schema = ("poly_id long, icell long, n_edges int, "
              "contains_center boolean, n_bytes int")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        v = np.asarray(pdf["vertices"].iloc[0],
                       dtype=np.float64).reshape(-1, 3)
        return pd.DataFrame(
            shape_index_codec_rows(pid, v),
            columns=["poly_id", "icell", "n_edges",
                     "contains_center", "n_bytes"])

    return df.groupBy("poly_id").applyInPandas(run, schema)
