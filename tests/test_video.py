"""Video modality: RV01 container framing, seek-table frame access,
lossless frame round-trip, and the Spark frame-sampling pipeline."""

import numpy as np
import pytest

from s2spark.image import png
from s2spark.image.ops import synth_pixels
from s2spark.video import container


def _frames(seed, n, w, h):
    return [png.encode_rgb(synth_pixels(seed + f, w, h), compress_level=1)
            for f in range(n)]


def test_container_roundtrip():
    blobs = _frames(99, 5, 11, 7)
    data = container.pack(blobs, 10, 11, 7)
    fps, w, h, n, offsets = container.unpack_meta(data)
    assert (fps, w, h, n) == (10, 11, 7, 5)
    for i, b in enumerate(blobs):
        assert container.get_frame(data, offsets, i) == b


def test_container_guard():
    with pytest.raises(ValueError):
        container.unpack_meta(b"MP4\x00" + b"\x00" * 64)


def test_frame_decode_lossless():
    # PNG frames are intra-coded lossless: decoded pixels are EXACT
    # (PSNR infinite; the >=40 dB bar of the input_hint is trivially met)
    img = synth_pixels(1234, 16, 9)
    data = container.pack([png.encode_rgb(img)], 10, 16, 9)
    _, _, _, _, offsets = container.unpack_meta(data)
    dec = png.decode_rgb(container.get_frame(data, offsets, 0))
    assert np.array_equal(dec, img)
    assert png.psnr(dec, img) == float("inf")


def test_seek_table_skips_payload():
    # unpack_meta must read only header + length table: corrupting every
    # payload byte cannot affect it, and get_frame on a sampled index
    # still slices the right (corrupted) range.
    blobs = _frames(5, 4, 8, 8)
    data = container.pack(blobs, 10, 8, 8)
    fps, w, h, n, offsets = container.unpack_meta(data)
    corrupted = data[:offsets[0]] + b"\xff" * (len(data) - offsets[0])
    assert container.unpack_meta(corrupted)[:4] == (fps, w, h, n)
    assert container.get_frame(corrupted, offsets, 2) == \
        b"\xff" * len(blobs[2])


def test_frame_sample_spark(spark):
    from s2spark import dataset
    from s2spark.video import ops as vidops

    vid = dataset.synth_video_with_bytes(spark.range(0, 20), "id")
    meta = vid.select("video_id", "vseed", "n_frames", "w", "h") \
        .toPandas().set_index("video_id").sort_index()
    out = vidops.frame_sample(vid, every_k=2).toPandas()
    for vid_id, grp in out.groupby("video_id"):
        m = meta.loc[vid_id]
        want_idx = list(range(0, int(m["n_frames"]), 2))
        assert sorted(grp["frame_idx"]) == want_idx  # sampling stride
        for _, r in grp.iterrows():
            img = synth_pixels(int(m["vseed"]) + int(r["frame_idx"]),
                               int(m["w"]), int(m["h"]))
            assert r["pix_sum"] == int(img.astype(np.int64).sum())
            assert (r["h"], r["w"]) == (m["h"], m["w"])
    assert set(out["video_id"]) == set(meta.index)


def test_frame_sample_passthrough_and_stride(spark):
    from pyspark.sql import functions as F

    from s2spark import dataset
    from s2spark.video import ops as vidops

    vid = dataset.synth_video_with_bytes(spark.range(0, 8), "id") \
        .withColumn("bucket", F.col("n_frames") % 3)
    out = vidops.frame_sample(vid, every_k=3, passthrough=("bucket",)) \
        .toPandas()
    ref = vid.select("video_id", "n_frames", "bucket").toPandas() \
        .set_index("video_id")
    for vid_id, grp in out.groupby("video_id"):
        m = ref.loc[vid_id]
        assert sorted(grp["frame_idx"]) == \
            list(range(0, int(m["n_frames"]), 3))
        assert (grp["bucket"] == m["bucket"]).all()
    with pytest.raises(ValueError):
        vidops.frame_sample(vid, every_k=0)
