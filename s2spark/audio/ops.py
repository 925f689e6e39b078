"""Audio payload operators: opaque WAV binary columns processed by
Arrow-batched kernels (the audio leg of the multimodal contract;
mirrors s2spark.image.ops).

- synth_samples / synth_wav_udf : deterministic int16 PCM from a
  per-row seed via the tri-dialect mix hash — sample i of row with
  seed `aseed` is  (mix(aseed + i, 23) % 65536) - 32768,  so a DuckDB
  oracle can re-derive every sample with unnest(generate_series) and
  the identical BIGINT arithmetic (see __spark_entry__ audio_features
  oracle).  Bytes are real RIFF/PCM16 WAV (s2spark.audio.wav).
- audio_features : mapInPandas decode -> INTEGER features
  (n_samples, sum of squares, peak amplitude, zero crossings).
  Integer features on purpose: float aggregates (RMS, spectral
  moments) are engine-order-dependent and would break the value-hash
  oracle (CLAUDE.md invariant); sum_sq/n is RMS^2 exactly, derivable
  downstream.  Passthrough columns ride the single decode pass so
  rollup keys never force a second payload scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StructField, StructType)

from . import wav
from ..sources import geo

SAMPLE_RATE = 8000


def synth_samples(aseed: int, n: int) -> np.ndarray:
    """Deterministic int16 PCM: mix(aseed + i, 23) % 65536 - 32768."""
    idx = np.int64(aseed) + np.arange(n, dtype=np.int64)
    return ((geo.mix_np(idx, 23) % 65536) - 32768).astype(np.int16)


@pandas_udf(BinaryType())
def synth_wav_udf(aseed, n_samples):
    out = []
    for a, n in zip(aseed.to_numpy(np.int64),
                    n_samples.to_numpy(np.int64)):
        out.append(wav.encode_pcm16(synth_samples(int(a), int(n)),
                                    SAMPLE_RATE))
    return pd.Series(out)


def clip_features(samples: np.ndarray) -> tuple[int, int, int, int]:
    """(n_samples, sum_sq, peak, zero_crossings) — all exact ints."""
    s = samples.astype(np.int64)
    n = int(s.size)
    sum_sq = int((s * s).sum())
    peak = int(np.abs(s).max()) if n else 0
    zc = int(np.count_nonzero((s[1:] < 0) != (s[:-1] < 0)))
    return n, sum_sq, peak, zc


def audio_features(df: DataFrame, bytes_col: str = "bytes",
                   fmt_col: str = "fmt",
                   passthrough: tuple = ()) -> DataFrame:
    """mapInPandas feature pipeline: WAV decode -> integer clip stats.

    Output: (audio_id, n_samples, sum_sq, peak, zero_crossings,
    *passthrough).  Non-wav fmt raises NotImplementedError (no audio
    libraries in this container; the WAV path is real)."""
    fields = [StructField("audio_id", df.schema["audio_id"].dataType),
              StructField("n_samples", IntegerType()),
              StructField("sum_sq", LongType()),
              StructField("peak", IntegerType()),
              StructField("zero_crossings", IntegerType())]
    fields += [StructField(c, df.schema[c].dataType) for c in passthrough]
    schema = StructType(fields)

    def gen(batches):
        for pdf in batches:
            rows = []
            extras = [pdf[c].to_numpy() for c in passthrough]
            for aid, blob, fmt, *ex in zip(pdf["audio_id"].to_numpy(),
                                           pdf[bytes_col].to_numpy(),
                                           pdf[fmt_col].to_numpy(),
                                           *extras):
                if fmt != "wav":
                    raise NotImplementedError(
                        f"decode for fmt={fmt!r} not available in this "
                        f"container (no audio libraries); WAV is real")
                samples, _ = wav.decode_pcm16(bytes(blob))
                rows.append((aid, *clip_features(samples), *ex))
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    return df.select("audio_id", bytes_col, fmt_col, *passthrough) \
        .mapInPandas(gen, schema=schema)
