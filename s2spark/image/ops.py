"""Image payload operators (BASELINE.json input_hint): multimodal
columns as opaque binary + typed metadata, processed by Arrow-batched
kernels — never per-row Python in the driver.

- synth_pixels / synth_png_udf : deterministic pixel generation from
  phash (LCG-seeded gradient+texture), PNG-encoded — the benchmark's
  image bytes, reproducible everywhere.
- decode_fields_udf : bytes -> (h, w, mean_r, mean_g, mean_b).  PNG is
  decoded for real (s2spark.image.png); any other format raises
  NotImplementedError per row batch — the dispatch/plumbing (schema,
  batch shape, null handling) is the real, tested part.
- avg_phash_udf : 64-bit average-hash over an 8x8 block-mean grayscale
  (the perceptual-hash role of the input table's phash column).
- resize/mapInPandas feature extraction in `image_features` — schema'd
  batch pipeline for downstream training-data work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

from . import png
from ..sources import geo


def synth_pixels(phash: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image from a phash seed."""
    ph = np.int64(phash)
    yy = np.arange(h, dtype=np.int64)[:, None]
    xx = np.arange(w, dtype=np.int64)[None, :]
    base = (yy * 7 + xx * 13)
    r = (base + int(geo.mix_np(np.array([ph]), 51)[0] % 256)) % 256
    g = (base * 3 + int(geo.mix_np(np.array([ph]), 52)[0] % 256)) % 256
    b = (yy * 11 - xx * 5 + int(geo.mix_np(np.array([ph]), 53)[0]
                                % 256)) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


_DECODE_SCHEMA = StructType([
    StructField("h", IntegerType()), StructField("w", IntegerType()),
    StructField("mean_r", DoubleType()), StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType())])


@pandas_udf(BinaryType())
def synth_png_udf(phash, w, h):
    out = []
    for p, ww, hh in zip(phash.to_numpy(np.int64),
                         w.to_numpy(np.int64), h.to_numpy(np.int64)):
        out.append(png.encode_rgb(synth_pixels(int(p), int(ww), int(hh)),
                                  compress_level=1))
    return pd.Series(out)


@pandas_udf(_DECODE_SCHEMA)
def decode_fields_udf(data, fmt):
    rows = []
    for blob, f in zip(data, fmt):
        if blob is None:
            rows.append((None, None, None, None, None))
            continue
        if f != "png":
            raise NotImplementedError(
                f"decode for fmt={f!r} not available in this container "
                f"(no image libraries); PNG path is real")
        img = png.decode_rgb(bytes(blob))
        m = img.reshape(-1, 3).mean(axis=0)
        rows.append((img.shape[0], img.shape[1],
                     float(m[0]), float(m[1]), float(m[2])))
    return pd.DataFrame(rows, columns=["h", "w", "mean_r", "mean_g",
                                       "mean_b"])


def block_mean_resize(img: np.ndarray, out_h: int, out_w: int
                      ) -> np.ndarray:
    """Area-ish resize by block means (pure NumPy)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w) + img.shape[2:], dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                            xs[j]:max(xs[j + 1], xs[j] + 1)].mean(
                axis=(0, 1))
    return out


def avg_phash(img: np.ndarray) -> int:
    """64-bit average hash: 8x8 block-mean gray, bit = pixel > mean."""
    gray = img.astype(np.float64).mean(axis=2)
    small = block_mean_resize(gray[..., None], 8, 8)[..., 0]
    bits = (small > small.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for k, b in enumerate(bits):
        val |= b << np.uint64(k)
    return int(val.view(np.int64))


@pandas_udf(LongType())
def avg_phash_udf(data):
    out = []
    for blob in data:
        if blob is None:
            out.append(None)
        else:
            out.append(avg_phash(png.decode_rgb(bytes(blob))))
    return pd.Series(out, dtype="Int64")


def image_features(df: DataFrame, bytes_col: str = "bytes",
                   fmt_col: str = "fmt",
                   passthrough: tuple = ()) -> DataFrame:
    """mapInPandas feature pipeline: decode -> 4x4 block-mean RGB grid
    (48 doubles) + perceptual hash.  Demonstrates the multimodal batch
    shape: opaque binary in, fixed-width features out.

    passthrough: extra input columns echoed to the output unchanged,
    so downstream rollups (e.g. a tile key) ride the single decode
    pass instead of re-deriving the image frame and joining back —
    the payload column is scanned once, not twice."""
    fields = [StructField("image_id", df.schema["image_id"].dataType),
              StructField("phash64", LongType())]
    fields += [StructField(f"f{i}", DoubleType()) for i in range(48)]
    fields += [StructField(c, df.schema[c].dataType) for c in passthrough]
    schema = StructType(fields)

    def gen(batches):
        for pdf in batches:
            rows = []
            # zip over materialized columns, not iterrows (decode is
            # inherently per-row; the row-access idiom need not be)
            extras = [pdf[c].to_numpy() for c in passthrough]
            for img_id, blob, fmt, *ex in zip(pdf["image_id"].to_numpy(),
                                              pdf[bytes_col].to_numpy(),
                                              pdf[fmt_col].to_numpy(),
                                              *extras):
                if fmt != "png":
                    raise NotImplementedError("non-PNG decode unavailable")
                img = png.decode_rgb(bytes(blob))
                grid = block_mean_resize(img, 4, 4).ravel()
                rows.append((img_id, avg_phash(img), *grid, *ex))
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    return df.select("image_id", bytes_col, fmt_col, *passthrough) \
        .mapInPandas(gen, schema=schema)
