"""Audio modality: WAV codec round-trip, synth determinism, feature
kernel parity, and the Spark mapInPandas pipeline contract."""

import struct

import numpy as np
import pytest

from s2spark.audio import wav
from s2spark.audio.ops import clip_features, synth_samples


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    for n in (1, 5, 256, 4001):
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        dec, rate = wav.decode_pcm16(wav.encode_pcm16(s, 16000))
        assert rate == 16000
        assert np.array_equal(dec, s)
    # extreme values survive
    s = np.array([-32768, 32767, 0, -1, 1], dtype=np.int16)
    dec, _ = wav.decode_pcm16(wav.encode_pcm16(s))
    assert np.array_equal(dec, s)


def test_wav_tolerates_extra_chunks():
    s = np.arange(10, dtype=np.int16)
    data = wav.encode_pcm16(s, 8000)
    # splice a LIST chunk (odd-length, exercises word-align skip)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = data[:12] + extra + data[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    dec, rate = wav.decode_pcm16(spliced)
    assert rate == 8000 and np.array_equal(dec, s)


def test_wav_guards():
    s = np.zeros(4, dtype=np.int16)
    good = wav.encode_pcm16(s)
    with pytest.raises(ValueError):
        wav.decode_pcm16(b"OggS" + good[4:])
    # audio_format=3 (IEEE float) -> NotImplementedError
    bad = bytearray(good)
    fmt_off = good.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off, 3)
    with pytest.raises(NotImplementedError):
        wav.decode_pcm16(bytes(bad))
    # stereo -> NotImplementedError
    bad = bytearray(good)
    struct.pack_into("<H", bad, fmt_off + 2, 2)
    with pytest.raises(NotImplementedError):
        wav.decode_pcm16(bytes(bad))
    # 8-bit -> NotImplementedError
    bad = bytearray(good)
    struct.pack_into("<H", bad, fmt_off + 14, 8)
    with pytest.raises(NotImplementedError):
        wav.decode_pcm16(bytes(bad))


def test_synth_samples_pinned():
    # frozen fixture: any drift breaks the DuckDB oracle's re-derivation
    assert list(synth_samples(12345, 8)) == [
        12091, 21893, 12242, -15150, -20140, -2560, -13620, -23672]
    assert clip_features(synth_samples(7, 300)) == (
        300, 105920946600, 32600, 142)


def test_clip_features_matches_numpy():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=777).astype(np.int16)
    n, ss, pk, zc = clip_features(s)
    s64 = s.astype(np.int64)
    assert n == 777
    assert ss == int((s64 * s64).sum())
    assert pk == int(np.abs(s64).max())
    assert zc == int(np.count_nonzero((s64[1:] < 0) != (s64[:-1] < 0)))


def test_audio_features_spark(spark):
    from pyspark.sql import functions as F

    from s2spark import dataset, functions as s2f
    from s2spark.audio import ops as audops

    base = spark.range(0, 25)
    aud = dataset.synth_audio_with_bytes(base, "id") \
        .withColumn("tile", s2f.parent_col(F.col("cell_id"), 6))
    out = audops.audio_features(aud, passthrough=("tile",)).toPandas() \
        .set_index("audio_id").sort_index()
    ref = aud.select("audio_id", "aseed", "n_samples", "tile") \
        .toPandas().set_index("audio_id").sort_index()
    assert len(out) == 25
    # passthrough column rides unchanged
    assert (out["tile"] == ref["tile"]).all()
    for aid, row in ref.iterrows():
        n, ss, pk, zc = clip_features(
            synth_samples(int(row["aseed"]), int(row["n_samples"])))
        got = out.loc[aid]
        assert (got["n_samples"], got["sum_sq"], got["peak"],
                got["zero_crossings"]) == (n, ss, pk, zc)


def test_audio_features_non_wav_raises(spark):
    from pyspark.sql import functions as F

    from s2spark import dataset
    from s2spark.audio import ops as audops

    aud = dataset.synth_audio_with_bytes(spark.range(0, 3), "id") \
        .withColumn("fmt", F.lit("mp3"))
    with pytest.raises(Exception, match="NotImplementedError|mp3"):
        audops.audio_features(aud).collect()
