"""Table loading + deterministic geotagging for the engine's inputs.

The driver's synthetic tables (TPC-H-ish star schema, see TESTDATA.md)
carry no coordinates.  Every spatial operator therefore runs over a
*geotagged view*: a deterministic, oracle-reproducible derivation of
(leaf cell id, unit xyz) from an integer key — the same role the
north-star's phash-seeded coordinates play for the image table
(BASELINE.json `input_hint`).  The derivation (s2spark.sources.geo) is
bit-exact across NumPy / Spark SQL / DuckDB, which makes every join,
tile assignment, and kNN ordering value-checkable by the DuckDB oracle.

Scale notes: geotagging is a pure projection (no shuffle); the derived
`cell_id` column is the engine's partitioning/sort key.  On a real
deployment the leaf cell id would be computed once at ingest and stored
(Iceberg sort order + bucket(cell_id)), so every downstream join starts
from a cell-clustered table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import functions as s2f
from .sources import geo

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# Key-space offsets so two tables never share a derived location
# (customer 42 must not sit exactly on event 42).  Kept < 2^31 so every
# intermediate in the LCG mix stays BIGINT-exact in all three dialects.
OFFSETS = {"events": 0, "customer": 1_000_000_007, "supplier": 2_000_000_011,
           "orders": 3_000_000_019, "part": 4_000_000_007}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footers (the "stored table stats"
    a catalog would provide) — no Spark scan, so density-derived plan
    parameters (e.g. kNN ring level) cost nothing in the hot path."""
    import os

    import pyarrow.parquet as pq
    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        return sum(pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                   for f in os.listdir(path) if f.endswith(".parquet"))
    return pq.ParquetFile(path).metadata.num_rows


def geotag(df: DataFrame, key_col: str, table: str,
           mode: str = "udf") -> DataFrame:
    """Attach (cell_id, x, y, z) derived from an integer key column.

    mode="udf" (default): one Arrow-batched struct UDF over the bit-exact
    NumPy kernels — tiny plan, vectorized execution.
    mode="sql": pure Spark SQL bit math (whole-stage codegen, zero
    Python) — same values; pays ~10 s Catalyst analysis for the inlined
    Hilbert lookup table, so reserve it for long-running cluster jobs.
    `cell_id` is the level-30 leaf id in both modes.
    """
    key = F.col(key_col) + F.lit(OFFSETS.get(table, 0))
    if mode == "sql":
        x, y, z = geo.xyz_cols(key)
        return (df.withColumn("cell_id", geo.cell_col(key))
                  .withColumn("x", x).withColumn("y", y).withColumn("z", z))
    g = geo.geo_struct_udf()(key).alias("_g")
    return df.select("*", g).select(*df.columns, "_g.*")


def geo_key_sql(key_col: str, table: str) -> str:
    """DuckDB expression for the offset key (oracle side)."""
    return f"(({key_col}) + {OFFSETS.get(table, 0)})"


def synth_images_from(keyed: DataFrame, key_col: str = "id") -> DataFrame:
    """Deterministic image-metadata rows from any integer-keyed frame
    (BASELINE.json `input_hint` schema minus bytes): (image_id, w, h,
    fmt, caption, phash) + phash-seeded geo (cell_id, x, y, z).  Every
    column is tri-dialect reproducible (see oracle in __spark_entry__).
    """
    key = F.col(key_col)
    m1 = geo.mix_col(key, 11)
    m2 = geo.mix_col(key, 12)
    df = keyed.select(
        F.format_string("img%012d", key).alias("image_id"),
        (F.lit(256) + (geo.mix_col(key, 13) % 768))
        .cast("int").alias("w"),
        (F.lit(256) + (geo.mix_col(key, 14) % 768))
        .cast("int").alias("h"),
        F.when(geo.mix_col(key, 15) % 2 == 0, "png")
        .otherwise("jpeg").alias("fmt"),
        F.format_string("synthetic caption %d", key).alias("caption"),
        (m1 * F.lit(2147483647) + m2).alias("phash"))
    return geotag(df, "phash", "images")


def synth_images(spark: SparkSession, n_rows: int,
                 partitions: int | None = None) -> DataFrame:
    """The scaling-benchmark input: synth_images_from over a range.
    `bytes` is intentionally absent — payload codecs are exercised by
    the small-scale image tests, not the throughput job."""
    dp = spark.sparkContext.defaultParallelism
    # small test tables: don't scatter a few hundred rows over dp*4
    # near-empty splits — every downstream Python-UDF stage pays a
    # worker launch per split.  Large inputs keep dp*4 for AQE slack.
    auto = min(dp * 4, max(dp, n_rows // 64 + 1))
    base = spark.range(0, n_rows, numPartitions=partitions or auto)
    return synth_images_from(base, "id")


def synth_images_with_bytes(spark: SparkSession, n_rows: int) -> DataFrame:
    """Small-scale image table WITH real PNG payloads (deterministic
    pixels from phash; fmt forced to png so every row decodes).
    Images are capped at 64x64 here to keep test tables light."""
    from .image.ops import synth_png_udf
    base = synth_images(spark, n_rows)
    w = (F.col("w") % 49 + 16).cast("int")
    h = (F.col("h") % 49 + 16).cast("int")
    return (base
            .withColumn("w", w).withColumn("h", h)
            .withColumn("fmt", F.lit("png"))
            .withColumn("bytes", synth_png_udf(F.col("phash"),
                                               F.col("w"), F.col("h")))
            .select("image_id", "bytes", "w", "h", "fmt", "caption",
                    "phash", "cell_id", "x", "y", "z"))


def synth_audio_from(keyed: DataFrame, key_col: str = "id") -> DataFrame:
    """Deterministic audio-metadata rows from any integer-keyed frame
    (audio leg of the multimodal contract): (audio_id, sr, n_samples,
    fmt, aseed) + aseed-seeded geo.  Tri-dialect reproducible — sample
    values derive from aseed via the mix hash (audio.ops.synth_samples),
    so a DuckDB oracle can re-derive every decoded sample."""
    key = F.col(key_col)
    df = keyed.select(
        F.format_string("aud%012d", key).alias("audio_id"),
        F.lit(8000).alias("sr"),
        (F.lit(120) + (geo.mix_col(key, 22) % 381))
        .cast("int").alias("n_samples"),
        F.when(geo.mix_col(key, 24) % 2 == 0, "wav")
        .otherwise("flac").alias("fmt"),
        geo.mix_col(key, 21).alias("aseed"))
    return geotag(df, "aseed", "audio")


def synth_audio_with_bytes(keyed: DataFrame, key_col: str = "id"
                           ) -> DataFrame:
    """Audio table WITH real RIFF/PCM16 WAV payloads (deterministic
    samples from aseed; fmt forced to wav so every row decodes)."""
    from .audio.ops import synth_wav_udf
    base = synth_audio_from(keyed, key_col)
    return (base.withColumn("fmt", F.lit("wav"))
            .withColumn("bytes", synth_wav_udf(F.col("aseed"),
                                               F.col("n_samples"))))


def synth_video_with_bytes(keyed: DataFrame, key_col: str = "id"
                           ) -> DataFrame:
    """Deterministic video rows WITH RV01 container payloads: frame f
    is the image-modality synth frame seeded by vseed + f (PNG, exact
    round-trip).  (video_id, n_frames, w, h, fmt, vseed, video)."""
    from .video.ops import synth_video_udf
    key = F.col(key_col)
    df = keyed.select(
        F.format_string("vid%012d", key).alias("video_id"),
        (F.lit(2) + (geo.mix_col(key, 31) % 7))
        .cast("int").alias("n_frames"),
        (F.lit(6) + (geo.mix_col(key, 32) % 11)).cast("int").alias("w"),
        (F.lit(6) + (geo.mix_col(key, 33) % 11)).cast("int").alias("h"),
        F.lit("rv01").alias("fmt"),
        geo.mix_col(key, 34).alias("vseed"))
    return df.withColumn("video", synth_video_udf(
        F.col("vseed"), F.col("n_frames"), F.col("w"), F.col("h")))


def geotagged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return geotag(load(spark, sf_dir, "events"), "event_id", "events")


def geotagged_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return geotag(load(spark, sf_dir, "customer"), "c_custkey", "customer")
