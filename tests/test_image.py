"""Image payload invariants (BASELINE.json input_hint): decoded-pixel
exactness (PSNR = ∞ for lossless PNG), caption byte-equality through a
parquet round-trip, feature-pipeline batch shape."""

import numpy as np
import pytest

from s2spark.image import ops, png


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    data = png.encode_rgb(img)
    back = png.decode_rgb(data)
    assert back.shape == img.shape
    assert (back == img).all()
    assert png.psnr(img, back) == float("inf")  # >= 40 dB trivially


def test_png_filters_decode():
    """Decoder handles Sub/Up/Average/Paeth scanlines (re-filtered by
    hand so external PNGs decode too)."""
    import struct
    import zlib
    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3) * 3
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3).astype(np.int32)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4]
    for y, ft in enumerate(filters):
        raw[y, 0] = ft
        prev = flat[y - 1] if y else np.zeros(w * 3, np.int32)
        line = flat[y].copy()
        enc = line.copy()
        for x in range(w * 3):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ft == 1:
                enc[x] = (line[x] - a) & 0xFF
            elif ft == 2:
                enc[x] = (line[x] - b) & 0xFF
            elif ft == 3:
                enc[x] = (line[x] - ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[x] = (line[x] - pred) & 0xFF
        raw[y, 1:] = enc.astype(np.uint8)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + chunk(b"IEND", b""))
    assert (png.decode_rgb(data) == img).all()


def test_synth_images_with_bytes_invariants(spark):
    from s2spark import dataset
    import tempfile
    df = dataset.synth_images_with_bytes(spark, 24)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/img.parquet")
        back = spark.read.parquet(f"{d}/img.parquet")
        rows = {r["image_id"]: r for r in back.collect()}
    assert len(rows) == 24
    for iid, r in rows.items():
        img = png.decode_rgb(bytes(r["bytes"]))
        expect = ops.synth_pixels(r["phash"], r["w"], r["h"])
        assert img.shape == (r["h"], r["w"], 3)
        assert (img == expect).all()          # pixel-exact through parquet
        assert png.psnr(img, expect) == float("inf")
        key = int(iid[3:])
        assert r["caption"] == f"synthetic caption {key}"  # byte-equal


def test_decode_fields_and_features(spark):
    from pyspark.sql import functions as F
    from s2spark import dataset
    df = dataset.synth_images_with_bytes(spark, 12)
    dec = df.select("image_id", "w", "h",
                    ops.decode_fields_udf(F.col("bytes"),
                                          F.col("fmt")).alias("d"))
    for r in dec.collect():
        assert r["d"]["h"] == r["h"] and r["d"]["w"] == r["w"]
        assert 0.0 <= r["d"]["mean_r"] <= 255.0
    feats = ops.image_features(df)
    out = feats.collect()
    assert len(out) == 12
    assert len(out[0]) == 2 + 48  # image_id + phash64 + 4x4x3 grid
    # phash64 deterministic: same pixels -> same hash
    again = {r["image_id"]: r["phash64"]
             for r in ops.image_features(df).collect()}
    for r in out:
        assert again[r["image_id"]] == r["phash64"]


def test_image_features_passthrough(spark):
    """Passthrough columns ride the single decode pass unchanged —
    values, dtype, and schema position (appended after the features),
    so rollup keys never need a re-derive + join-back."""
    from pyspark.sql import functions as F
    from s2spark import dataset
    df = dataset.synth_images_with_bytes(spark, 12) \
        .withColumn("tile", F.col("w").cast("long") * 1000) \
        .withColumn("tag", F.concat(F.lit("t-"), F.col("image_id")))
    feats = ops.image_features(df, passthrough=("tile", "tag"))
    assert feats.columns[-2:] == ["tile", "tag"]
    assert dict(feats.dtypes)["tile"] == "bigint"
    got = {r["image_id"]: (r["tile"], r["tag"]) for r in feats.collect()}
    want = {r["image_id"]: (r["w"] * 1000, f"t-{r['image_id']}")
            for r in df.select("image_id", "w").collect()}
    assert got == want


def test_non_png_decode_raises(spark):
    from pyspark.sql import functions as F
    from s2spark import dataset
    df = dataset.synth_images_with_bytes(spark, 3) \
        .withColumn("fmt", F.lit("jpeg"))
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        df.select(ops.decode_fields_udf(F.col("bytes"),
                                        F.col("fmt"))).collect()
