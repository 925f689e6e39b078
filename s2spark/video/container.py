"""Deterministic seekable video container ("RV01").

No pure-NumPy implementation of a real video codec is feasible here
(and the container image has no av libraries), so per the multimodal
contract the *codec* is a deterministic stand-in while everything a
distributed engine actually touches — framing, metadata, the seek
table, per-frame random access — is real:

    magic "RV01" | u16 fps | u16 w | u16 h | u32 n_frames
    | u32 frame_len[n_frames]        <- seek table BEFORE payload
    | frame payloads (PNG, s2spark.image.png)

The length table precedes the payload so frame-sampling reads only the
header + the sampled frames' byte ranges: `get_frame` slices without
parsing (or decoding) the skipped frames — the property that matters
when the sample stride is large and the payload is MBs per row.
Frames are intra-coded PNG (lossless), so decoded pixels are exact.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RV01"
_HDR = struct.Struct("<HHHI")  # fps, w, h, n_frames (after magic)


def pack(frames_png: list[bytes], fps: int, w: int, h: int) -> bytes:
    head = MAGIC + _HDR.pack(fps, w, h, len(frames_png))
    lens = struct.pack(f"<{len(frames_png)}I",
                       *[len(b) for b in frames_png])
    return head + lens + b"".join(frames_png)


def unpack_meta(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """-> (fps, w, h, n_frames, byte offsets[n_frames+1]); payload-free
    (reads only the fixed header + length table)."""
    if data[:4] != MAGIC:
        raise ValueError("not an RV01 payload")
    fps, w, h, n = _HDR.unpack_from(data, 4)
    base = 4 + _HDR.size
    lens = np.frombuffer(data, dtype="<u4", count=n, offset=base)
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = base + 4 * n
    np.cumsum(lens, out=offsets[1:])
    offsets[1:] += offsets[0]
    return fps, w, h, n, offsets


def get_frame(data: bytes, offsets: np.ndarray, idx: int) -> bytes:
    """Sliced PNG blob for frame idx — skipped frames are never read."""
    return data[offsets[idx]:offsets[idx + 1]]
