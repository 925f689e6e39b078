"""Video payload operators: frame synthesis and frame-sampling as
Arrow-batched kernels (the video leg of the multimodal contract).

- synth_video_udf : deterministic RV01 container from a per-row seed —
  frame f of row with seed `vseed` is the image-modality synth frame
  synth_pixels(vseed + f, w, h) (s2spark.image.ops), PNG-encoded.
  Every sampled-frame pixel is therefore re-derivable in DuckDB with
  the same BIGINT arithmetic (see __spark_entry__ video_frames
  oracle) — the oracle checks container framing + PNG round-trip +
  sampling end-to-end.
- frame_sample : mapInPandas; decodes ONLY frames 0, k, 2k, ... using
  the container's seek table (skipped frames are never even sliced)
  and emits one row per sampled frame with an exact integer pixel
  checksum.  Integer on purpose — float frame stats would break the
  value-hash oracle (CLAUDE.md unordered-float invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StructField, StructType)

from . import container
from ..image import png
from ..image.ops import synth_pixels

FPS = 10


@pandas_udf(BinaryType())
def synth_video_udf(vseed, n_frames, w, h):
    out = []
    for v, n, ww, hh in zip(vseed.to_numpy(np.int64),
                            n_frames.to_numpy(np.int64),
                            w.to_numpy(np.int64), h.to_numpy(np.int64)):
        frames = [png.encode_rgb(synth_pixels(int(v) + f, int(ww),
                                              int(hh)), compress_level=1)
                  for f in range(int(n))]
        out.append(container.pack(frames, FPS, int(ww), int(hh)))
    return pd.Series(out)


def frame_sample(df: DataFrame, every_k: int = 2,
                 bytes_col: str = "video",
                 passthrough: tuple = ()) -> DataFrame:
    """mapInPandas frame-sampling pipeline: one output row per sampled
    frame — (video_id, frame_idx, h, w, pix_sum, *passthrough), where
    pix_sum is the exact int64 sum of all RGB values of the decoded
    frame.  Only frames 0, k, 2k, ... are decoded."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    fields = [StructField("video_id", df.schema["video_id"].dataType),
              StructField("frame_idx", IntegerType()),
              StructField("h", IntegerType()),
              StructField("w", IntegerType()),
              StructField("pix_sum", LongType())]
    fields += [StructField(c, df.schema[c].dataType) for c in passthrough]
    schema = StructType(fields)

    def gen(batches):
        for pdf in batches:
            rows = []
            extras = [pdf[c].to_numpy() for c in passthrough]
            for vid, blob, *ex in zip(pdf["video_id"].to_numpy(),
                                      pdf[bytes_col].to_numpy(),
                                      *extras):
                data = bytes(blob)
                _, w, h, n, offsets = container.unpack_meta(data)
                for f in range(0, n, every_k):
                    img = png.decode_rgb(
                        container.get_frame(data, offsets, f))
                    rows.append((vid, f, h, w,
                                 int(img.astype(np.int64).sum()), *ex))
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    return df.select("video_id", bytes_col, *passthrough) \
        .mapInPandas(gen, schema=schema)
