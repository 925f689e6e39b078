"""Pure-NumPy RIFF/WAVE PCM codec (mono, 16-bit).

Real encode + decode with no audio libraries — the same role
s2spark.image.png plays for the image modality: the benchmark's audio
bytes are genuine WAV files any player can open, and the decode path
the feature kernels exercise is a real parser (chunk walk, fmt
validation), not a stub.  Non-PCM / non-16-bit payloads raise
NotImplementedError per the multimodal contract (the dispatch and
schema plumbing is the tested part; exotic codecs are out of scope in
this container).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    s = np.ascontiguousarray(np.asarray(samples, dtype="<i2"))
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2,
                      2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 sample array, sample_rate).

    Walks the chunk list (tolerates extra chunks, odd-length padding);
    requires audio_format=1 (PCM), 1 channel, 16 bits — anything else
    raises NotImplementedError with the offending field named.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate: int | None = None
    raw: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            afmt, nch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if afmt != 1:
                raise NotImplementedError(
                    f"audio_format={afmt} (non-PCM) not available in "
                    f"this container; PCM path is real")
            if nch != 1:
                raise NotImplementedError(f"channels={nch}; mono only")
            if bits != 16:
                raise NotImplementedError(f"bits={bits}; 16-bit only")
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    return np.frombuffer(raw, dtype="<i2").astype(np.int16), rate
