"""Binary codecs for S2 types, re-derived from the reference's wire
formats (format parity, independent implementation):

- varint64            little-endian base-128 (util/coding/varint.h)
- EncodedUintVector   encoded_uint_vector.h:166-188 — varint header
                      ``(n * 8) | (len - 1)`` followed by n fixed-width
                      little-endian values of ``len`` bytes each, where
                      ``len`` is the byte width of the largest value
- EncodedS2CellIdVector  encoded_s2cell_id_vector.cc:61-180 — values
                      decoded as ``base + (delta << shift)``; header
                      byte ``(shift_code << 3) | base_len`` with the
                      5-bit shift_code scheme (<=28 even shifts, 29/30
                      odd shifts 1/3, 31 = extended byte), then the
                      base_len most-significant bytes of base, then an
                      EncodedUintVector of deltas
- S2PointCompression  s2point_compression.h:16-40 / .cc — (face,si,ti)
                      decomposition, run-length faces as
                      varint(6*count+face), (pi,qi) = si,ti >> (31-level),
                      2nd-derivative coding, zig-zag, bit interleave,
                      first point fixed-length, rest varint64, exact
                      off-center points appended as raw doubles
- S2Loop lossless v1  s2loop.cc:623-680 — version byte, u32 count, raw
                      vertex doubles, origin_inside byte, u32 depth,
                      S2LatLngRect bound
- S2Polygon v1 / v4   s2polygon.cc:712-800 (uncompressed) and
                      s2polygon.cc:1475-1500 + s2loop.cc:1360-1426
                      (compressed: snap-level byte, per-loop compressed
                      points + properties/depth varints, bound only for
                      loops with >= 64 vertices)
- S2LatLngRect v1     s2latlng_rect.cc:360-370 — version byte + 4 raw
                      doubles (lat lo/hi, lng lo/hi)

Everything integer-heavy is vectorized NumPy; the sequential pieces
(varint streams) run per-geometry, which at the Spark layer means per
row inside an Arrow batch — the scale dimension is rows, not vertices.
"""
from __future__ import annotations

import numpy as np

from . import cellid, coords

MAX_LEVEL = coords.MAX_CELL_LEVEL          # 30
MAX_SI_TI = coords.MAX_SI_TI               # 2^31
_U64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# varints (little-endian base 128)
# ---------------------------------------------------------------------------

def put_varint(out: bytearray, v: int) -> None:
    v = int(v)
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def get_varint(buf, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, pos
        shift += 7


# ---------------------------------------------------------------------------
# EncodedUintVector<uint64>
# ---------------------------------------------------------------------------

def encode_uint_vector(vals: np.ndarray) -> bytes:
    """varint((n * 8) | (len-1)) + n * len bytes (LE, truncated)."""
    vals = np.ascontiguousarray(np.asarray(vals).view(np.uint64)
                                if np.asarray(vals).dtype == np.int64
                                else np.asarray(vals, dtype=np.uint64))
    n = len(vals)
    one_bits = int(np.bitwise_or.reduce(vals)) | 1 if n else 1
    length = ((one_bits.bit_length() - 1) >> 3) + 1
    out = bytearray()
    put_varint(out, (n * 8) | (length - 1))
    if n:
        raw = vals.astype("<u8").view(np.uint8).reshape(n, 8)
        out += raw[:, :length].tobytes()
    return bytes(out)


def decode_uint_vector(buf, pos: int = 0) -> tuple[np.ndarray, int]:
    size_len, pos = get_varint(buf, pos)
    n = size_len >> 3                       # size_len / sizeof(uint64)
    length = (size_len & 7) + 1
    if n == 0:
        return np.empty(0, dtype=np.uint64), pos
    raw = np.frombuffer(buf, dtype=np.uint8, count=n * length,
                        offset=pos).reshape(n, length)
    full = np.zeros((n, 8), dtype=np.uint8)
    full[:, :length] = raw
    return full.view("<u8").ravel(), pos + n * length


# ---------------------------------------------------------------------------
# EncodedS2CellIdVector
# ---------------------------------------------------------------------------

def encode_cellid_vector(ids) -> bytes:
    """ids (any level, need not be valid/sorted) -> compact bytes."""
    v = cellid.as_u64(np.atleast_1d(np.asarray(ids)))
    n = len(v)
    e_base = 0
    e_base_len = 0
    e_shift = 0
    e_max_delta_msb = 0
    if n:
        v_or = int(np.bitwise_or.reduce(v))
        v_and = int(np.bitwise_and.reduce(v))
        v_min = int(v.min())
        v_max = int(v.max())
    else:
        v_or = 0
    if v_or > 0:
        ctz = (v_or & -v_or).bit_length() - 1
        e_shift = min(56, ctz & ~1)
        if (v_and >> e_shift) & 1:
            e_shift += 1                    # all ids at the same level
        best = None
        for blen in range(8):
            t_base = v_min & ~(_U64 >> (8 * blen)) if blen else 0
            t_msb = max(0, ((v_max - t_base) >> e_shift).bit_length() - 1)
            t_bytes = blen + n * ((t_msb >> 3) + 1)
            if best is None or t_bytes < best:
                e_base, e_base_len, e_max_delta_msb = t_base, blen, t_msb
                best = t_bytes
        # odd shifts cost an extra header byte; drop to even if the
        # per-delta width wouldn't grow
        if (e_shift & 1) and (e_max_delta_msb & 7) != 7:
            e_shift -= 1
    out = bytearray()
    _encode_base_shift(out, e_shift, e_base, e_base_len)
    deltas = (v - np.uint64(e_base)) >> np.uint64(e_shift)
    return bytes(out) + encode_uint_vector(deltas)


def _encode_base_shift(out: bytearray, shift: int, base: int,
                       base_len: int) -> None:
    shift_code = shift >> 1
    if shift & 1:
        shift_code = min(31, shift_code + 29)
    out.append((shift_code << 3) | base_len)
    if shift_code == 31:
        out.append(shift >> 1)              # odd; low bit implicit
    base_bytes = base >> (64 - 8 * max(1, base_len))
    out += base_bytes.to_bytes(8, "little")[:base_len]


def _decode_base_shift(buf, pos: int) -> tuple[int, int, int]:
    code_plus_len = buf[pos]
    pos += 1
    shift_code = code_plus_len >> 3
    if shift_code == 31:
        shift_code = 29 + buf[pos]
        pos += 1
        if shift_code > 56:
            raise ValueError("cellid vector shift out of range")
    base_len = code_plus_len & 7
    base = int.from_bytes(bytes(buf[pos:pos + base_len]) +
                          b"\x00" * (8 - base_len), "little") \
        if base_len else 0
    pos += base_len
    base <<= 64 - 8 * max(1, base_len)
    base &= _U64
    if shift_code >= 29:
        shift = 2 * (shift_code - 29) + 1
        base |= 1 << (shift - 1)
    else:
        shift = 2 * shift_code
    return shift, base, pos


def decode_cellid_vector(buf) -> np.ndarray:
    shift, base, pos = _decode_base_shift(buf, 0)
    deltas, _ = decode_uint_vector(buf, pos)
    return (deltas << np.uint64(shift)) + np.uint64(base)


def cellid_vector_lower_bound(buf, target: int) -> int:
    """Index of first element >= target WITHOUT materializing the ids
    (requires the encoded vector to be sorted) — the decode-on-demand
    access pattern of the reference class."""
    shift, base, pos = _decode_base_shift(buf, 0)
    deltas, _ = decode_uint_vector(buf, pos)
    target = int(target)
    if target <= base:
        return 0
    end_leaf = 6 << 61                      # End(kMaxLevel).id()
    if target >= end_leaf:
        return len(deltas)
    t = (target - base + (1 << shift) - 1) >> shift
    return int(np.searchsorted(deltas, np.uint64(t), side="left"))


# ---------------------------------------------------------------------------
# S2PointCompression
# ---------------------------------------------------------------------------

def xyz_to_face_si_ti(pts: np.ndarray):
    """Vectorized XYZtoFaceSiTi (s2coords.cc:118-141): (face, si, ti,
    cell_level) with cell_level = -1 when the point is not exactly a
    cell center."""
    pts = np.asarray(pts, dtype=np.float64)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    face, u, v = coords.xyz_to_face_uv(x, y, z)
    si = coords.st_to_si_ti(coords.uv_to_st(u)).astype(np.int64)
    ti = coords.st_to_si_ti(coords.uv_to_st(v)).astype(np.int64)
    or_si = si | MAX_SI_TI
    or_ti = ti | MAX_SI_TI
    # exact log2 of the low bit (values <= 2^31 -> float64 is exact)
    ctz_si = np.log2((or_si & -or_si).astype(np.float64)).astype(np.int64)
    ctz_ti = np.log2((or_ti & -or_ti).astype(np.float64)).astype(np.int64)
    lev = MAX_LEVEL - ctz_si
    bad = (lev < 0) | (lev != MAX_LEVEL - ctz_ti)
    cx, cy, cz = coords.normalize_xyz(
        *coords.face_uv_to_xyz(face,
                               coords.st_to_uv(coords.si_ti_to_st(si)),
                               coords.st_to_uv(coords.si_ti_to_st(ti))))
    off = bad | (cx != x) | (cy != y) | (cz != z)
    return face, si, ti, np.where(off, -1, lev)


def _si_ti_to_pi_qi(si: np.ndarray, level: int) -> np.ndarray:
    si = np.minimum(si, MAX_SI_TI - 1)
    return (si >> (MAX_LEVEL + 1 - level)).astype(np.int64)


def _pi_qi_to_st(pi: np.ndarray, level: int) -> np.ndarray:
    return (pi + 0.5) / (1 << level)


def _nth_derivative_encode(vals: np.ndarray) -> np.ndarray:
    """Order-2 derivative coding with ramp-up (nth-derivative.h):
    out = [v0, v1-v0, 2nd diffs...], int32 wraparound."""
    v = np.asarray(vals, dtype=np.uint32)
    out = v.copy()
    if len(v) > 1:
        d1 = v[1:] - v[:-1]
        out[1:] = d1
        if len(d1) > 1:
            out[2:] = d1[1:] - d1[:-1]
    return out.view(np.int32)


def _nth_derivative_decode(vals: np.ndarray) -> np.ndarray:
    v = np.asarray(vals, dtype=np.uint32)
    out = v.copy()
    if len(v) > 2:
        # integrate 2nd diffs -> 1st diffs, then 1st diffs -> values
        out[2:] = np.cumsum(v[2:], dtype=np.uint32) + v[1]
        out[1:] = np.cumsum(out[1:], dtype=np.uint32) + v[0]
    elif len(v) == 2:
        out[1] = v[1] + v[0]
    return out.view(np.int32)


def _zigzag_encode(k: np.ndarray) -> np.ndarray:
    k = np.asarray(k, dtype=np.int32)
    return ((k.astype(np.uint32) << np.uint32(1))
            ^ (k >> np.int32(31)).astype(np.uint32))


def _zigzag_decode(z: np.ndarray) -> np.ndarray:
    z = np.asarray(z, dtype=np.uint32)
    return ((z >> np.uint32(1)) ^ (np.uint32(0) - (z & np.uint32(1)))) \
        .view(np.int32)


_SPREAD_MASKS = [(np.uint64(16), np.uint64(0x0000FFFF0000FFFF)),
                 (np.uint64(8), np.uint64(0x00FF00FF00FF00FF)),
                 (np.uint64(4), np.uint64(0x0F0F0F0F0F0F0F0F)),
                 (np.uint64(2), np.uint64(0x3333333333333333)),
                 (np.uint64(1), np.uint64(0x5555555555555555))]


def _spread_bits(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    for shift, mask in _SPREAD_MASKS:
        x = (x | (x << shift)) & mask
    return x


def _compact_bits(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def _interleave_u32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """bit0(a)->bit0, bit0(b)->bit1 (util/bits/bit-interleave.h)."""
    return _spread_bits(a) | (_spread_bits(b) << np.uint64(1))


def _deinterleave_u32(x: np.ndarray):
    return (_compact_bits(x).astype(np.uint32),
            _compact_bits(np.asarray(x, dtype=np.uint64)
                          >> np.uint64(1)).astype(np.uint32))


def encode_points_compressed(pts: np.ndarray, level: int) -> bytes:
    """S2EncodePointsCompressed (s2point_compression.cc:317-344)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 3)
    n = len(pts)
    face, si, ti, cell_level = xyz_to_face_si_ti(pts)
    out = bytearray()
    # faces: run-length varint(6*count + face)
    i = 0
    while i < n:
        j = i
        while j < n and face[j] == face[i]:
            j += 1
        put_varint(out, 6 * (j - i) + int(face[i]))
        i = j
    pi = _si_ti_to_pi_qi(si, level)
    qi = _si_ti_to_pi_qi(ti, level)
    dpi = _nth_derivative_encode(pi)
    dqi = _nth_derivative_encode(qi)
    if n:
        # first point: fixed length, NOT zig-zagged (cannot be negative)
        first = int(_interleave_u32(
            np.array([dpi[0]], dtype=np.uint32).astype(np.uint64),
            np.array([dqi[0]], dtype=np.uint32).astype(np.uint64))[0])
        nbytes = (level + 7) // 8 * 2
        out += first.to_bytes(8, "little")[:nbytes]
        rest = _interleave_u32(_zigzag_encode(dpi[1:]).astype(np.uint64),
                               _zigzag_encode(dqi[1:]).astype(np.uint64))
        for v in rest:
            put_varint(out, int(v))
    off = np.flatnonzero(cell_level != level)
    put_varint(out, len(off))
    for idx in off:
        put_varint(out, int(idx))
        out += pts[idx].astype("<f8").tobytes()
    return bytes(out)


def decode_points_compressed(buf, level: int, n: int,
                             pos: int = 0) -> tuple[np.ndarray, int]:
    faces = np.empty(n, dtype=np.int64)
    got = 0
    while got < n:
        fc, pos = get_varint(buf, pos)
        count = fc // 6
        faces[got:got + count] = fc % 6
        got += count
    pts = np.empty((n, 3), dtype=np.float64)
    if n:
        nbytes = (level + 7) // 8 * 2
        first = int.from_bytes(bytes(buf[pos:pos + nbytes]) +
                               b"\x00" * (8 - nbytes), "little")
        pos += nbytes
        rest = np.empty(max(0, n - 1), dtype=np.uint64)
        for k in range(n - 1):
            v, pos = get_varint(buf, pos)
            rest[k] = v
        f_pi, f_qi = _deinterleave_u32(np.array([first], dtype=np.uint64))
        zz_pi, zz_qi = _deinterleave_u32(rest)
        dpi = np.concatenate([f_pi.view(np.int32),
                              _zigzag_decode(zz_pi)])
        dqi = np.concatenate([f_qi.view(np.int32),
                              _zigzag_decode(zz_qi)])
        pi = _nth_derivative_decode(dpi).astype(np.int64)
        qi = _nth_derivative_decode(dqi).astype(np.int64)
        x, y, z = coords.face_uv_to_xyz(
            faces, coords.st_to_uv(_pi_qi_to_st(pi, level)),
            coords.st_to_uv(_pi_qi_to_st(qi, level)))
        x, y, z = coords.normalize_xyz(x, y, z)
        pts[:, 0], pts[:, 1], pts[:, 2] = x, y, z
    n_off, pos = get_varint(buf, pos)
    for _ in range(n_off):
        idx, pos = get_varint(buf, pos)
        pts[idx] = np.frombuffer(buf, dtype="<f8", count=3, offset=pos)
        pos += 24
    return pts, pos


# ---------------------------------------------------------------------------
# S2LatLngRect coder (v1)
# ---------------------------------------------------------------------------

_RECT_VERSION = 1


def encode_rect(lat_lo, lat_hi, lng_lo, lng_hi) -> bytes:
    return bytes([_RECT_VERSION]) + np.array(
        [lat_lo, lat_hi, lng_lo, lng_hi], dtype="<f8").tobytes()


def decode_rect(buf, pos: int) -> tuple[tuple, int]:
    if buf[pos] != _RECT_VERSION:
        raise ValueError("bad rect version")
    vals = np.frombuffer(buf, dtype="<f8", count=4, offset=pos + 1)
    return tuple(vals), pos + 33


# ---------------------------------------------------------------------------
# S2Loop coder (lossless v1) and S2Polygon coder (v1 / v4)
# ---------------------------------------------------------------------------

_LOSSLESS_VERSION = 1
_COMPRESSED_VERSION = 4
_MIN_VERTICES_FOR_BOUND = 64


def _loop_bound(vertices: np.ndarray) -> tuple:
    from .rect_bounder import loop_rect_bound
    r = loop_rect_bound(vertices)
    return (r.lat.lo, r.lat.hi, r.lng.lo, r.lng.hi)


def _origin_inside(vertices: np.ndarray) -> bool:
    from .loops import Loop
    return bool(Loop(vertices).origin_inside)


def encode_loop(vertices: np.ndarray, depth: int = 0) -> bytes:
    """Lossless v1: version, u32 n, raw vertices, origin_inside byte,
    u32 depth, bound (s2loop.cc:623-633)."""
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    out = bytearray([_LOSSLESS_VERSION])
    out += len(v).to_bytes(4, "little")
    out += v.astype("<f8").tobytes()
    out.append(1 if _origin_inside(v) else 0)
    out += int(depth).to_bytes(4, "little")
    out += encode_rect(*_loop_bound(v))
    return bytes(out)


def decode_loop(buf, pos: int = 0) -> tuple[dict, int]:
    if buf[pos] != _LOSSLESS_VERSION:
        raise ValueError("bad loop version")
    pos += 1
    n = int.from_bytes(bytes(buf[pos:pos + 4]), "little")
    pos += 4
    v = np.frombuffer(buf, dtype="<f8", count=3 * n,
                      offset=pos).reshape(n, 3).copy()
    pos += 24 * n
    origin_inside = bool(buf[pos])
    pos += 1
    depth = int.from_bytes(bytes(buf[pos:pos + 4]), "little")
    pos += 4
    bound, pos = decode_rect(buf, pos)
    return {"vertices": v, "origin_inside": origin_inside,
            "depth": depth, "bound": bound}, pos


def _encode_loop_compressed(out: bytearray, vertices: np.ndarray,
                            snap_level: int, depth: int) -> None:
    """s2loop.cc:1360-1381: varint n, compressed points, varint
    properties (bit0 origin_inside, bit1 bound encoded for n >= 64),
    varint depth, optional bound."""
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    put_varint(out, len(v))
    out += encode_points_compressed(v, snap_level)
    props = (1 if _origin_inside(v) else 0)
    if len(v) >= _MIN_VERTICES_FOR_BOUND:
        props |= 2
    put_varint(out, props)
    put_varint(out, depth)
    if props & 2:
        out += encode_rect(*_loop_bound(v))


def _decode_loop_compressed(buf, pos: int,
                            snap_level: int) -> tuple[dict, int]:
    n, pos = get_varint(buf, pos)
    v, pos = decode_points_compressed(buf, snap_level, n, pos)
    props, pos = get_varint(buf, pos)
    depth, pos = get_varint(buf, pos)
    bound = None
    if props & 2:
        bound, pos = decode_rect(buf, pos)
    return {"vertices": v, "origin_inside": bool(props & 1),
            "depth": depth, "bound": bound}, pos


def encode_polygon(loops: list[np.ndarray], depths: list[int] | None = None,
                   hint: str = "compact") -> bytes:
    """S2Polygon::Encode (s2polygon.cc:712-766): FAST -> uncompressed
    v1; COMPACT picks the snap level where most vertices are exact
    cell centers and compares estimated sizes (4 bytes/vertex + 26 per
    unsnapped vs 24/vertex lossless)."""
    depths = depths or [0] * len(loops)
    if hint == "fast":
        return _encode_polygon_uncompressed(loops, depths)
    all_v = (np.concatenate([np.asarray(lp, dtype=np.float64)
                             .reshape(-1, 3) for lp in loops])
             if loops else np.empty((0, 3)))
    nv = len(all_v)
    if nv == 0:
        return _encode_polygon_compressed(loops, depths, MAX_LEVEL)
    _, _, _, cell_level = xyz_to_face_si_ti(all_v)
    hist = np.bincount(cell_level + 1, minlength=MAX_LEVEL + 2)
    snap_level = int(np.argmax(hist[1:]))
    num_snapped = int(hist[1:][snap_level])
    compressed_size = 4 * nv + 26 * (nv - num_snapped)
    lossless_size = 24 * nv
    if compressed_size < lossless_size:
        return _encode_polygon_compressed(loops, depths, snap_level)
    return _encode_polygon_uncompressed(loops, depths)


def _encode_polygon_uncompressed(loops, depths) -> bytes:
    out = bytearray([_LOSSLESS_VERSION, 1,
                     1 if any(d & 1 for d in depths) else 0])
    out += len(loops).to_bytes(4, "little")
    for lp, d in zip(loops, depths):
        out += encode_loop(lp, d)
    # polygon bound: S2LatLngRect UNION of shell-loop bounds with
    # proper S1Interval longitude semantics (inverted/antimeridian-
    # crossing intervals union correctly instead of snapping to full
    # — ADVICE r3: restores byte parity with the reference encoder
    # for multi-loop and antimeridian polygons)
    from .rect_bounder import loop_rect_bound
    from .region import LatLngRect, R1Interval, S1Interval
    acc = LatLngRect(R1Interval.empty(), S1Interval.empty())
    for lp, d in zip(loops, depths):
        if d & 1:
            continue
        r = loop_rect_bound(np.asarray(lp, dtype=np.float64)
                            .reshape(-1, 3))
        acc = LatLngRect(acc.lat.union(r.lat), acc.lng.union(r.lng))
    if acc.lat.is_empty():
        # no shells: the reference encodes the empty rect
        out += encode_rect(1.0, -1.0, np.pi, -np.pi)
    else:
        out += encode_rect(acc.lat.lo, acc.lat.hi,
                           acc.lng.lo, acc.lng.hi)
    return bytes(out)


def _encode_polygon_compressed(loops, depths, snap_level: int) -> bytes:
    out = bytearray([_COMPRESSED_VERSION, snap_level])
    put_varint(out, len(loops))
    for lp, d in zip(loops, depths):
        _encode_loop_compressed(out, lp, snap_level, d)
    return bytes(out)


def decode_polygon(buf) -> list[dict]:
    version = buf[0]
    if version == _LOSSLESS_VERSION:
        pos = 3                              # version, owns_loops, has_holes
        n = int.from_bytes(bytes(buf[pos:pos + 4]), "little")
        pos += 4
        loops = []
        for _ in range(n):
            lp, pos = decode_loop(buf, pos)
            loops.append(lp)
        return loops
    if version == _COMPRESSED_VERSION:
        snap_level = buf[1]
        pos = 2
        n, pos = get_varint(buf, pos)
        loops = []
        for _ in range(n):
            lp, pos = _decode_loop_compressed(buf, pos, snap_level)
            loops.append(lp)
        return loops
    raise ValueError(f"bad polygon version {version}")


# ---------------------------------------------------------------------------
# EncodedStringVector (encoded_string_vector.cc:40-54)
# ---------------------------------------------------------------------------

def encode_string_vector(items: list[bytes]) -> bytes:
    """EncodedUintVector of end-offsets (leading zero omitted) followed
    by the concatenated data."""
    ends = np.cumsum([len(b) for b in items]).astype(np.uint64) \
        if items else np.empty(0, dtype=np.uint64)
    return encode_uint_vector(ends) + b"".join(items)


def decode_string_vector(buf, pos: int = 0) -> tuple[list[bytes], int]:
    ends, pos = decode_uint_vector(buf, pos)
    out = []
    prev = 0
    for e in ends:
        out.append(bytes(buf[pos + prev:pos + int(e)]))
        prev = int(e)
    return out, pos + prev


# ---------------------------------------------------------------------------
# EncodedS2PointVector (encoded_s2point_vector.cc)
# ---------------------------------------------------------------------------

_PV_UNCOMPRESSED = 0
_PV_CELL_IDS = 1
_PV_FORMAT_BITS = 3
_PV_BLOCK_SHIFT = 4
_PV_BLOCK_SIZE = 1 << _PV_BLOCK_SHIFT      # 16 values per block
_PV_EXCEPTION = _U64


def _bit_mask(n: int) -> int:
    return 0 if n == 0 else _U64 >> (64 - n)


def _max_bits_for_level(level: int) -> int:
    return 2 * level + 3


def _base_shift(level: int, base_bits: int) -> int:
    return max(0, _max_bits_for_level(level) - base_bits)


def _interleave_bit_pairs(sj: int, tj: int) -> int:
    """Interleave bit PAIRS (encoded_s2point_vector.cc:53-65): bits
    1:0 of sj -> 1:0, bits 1:0 of tj -> 3:2, ..."""
    def spread2(x: int) -> int:
        x &= 0xFFFFFFFF
        x = (x | (x << 16)) & 0x0000FFFF0000FFFF
        x = (x | (x << 8)) & 0x00FF00FF00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
        x = (x | (x << 2)) & 0x3333333333333333
        return x
    return spread2(sj) | (spread2(tj) << 2)


def _deinterleave_bit_pairs(code: int) -> tuple[int, int]:
    def compact2(x: int) -> int:
        x &= 0x3333333333333333
        x |= x >> 2
        x &= 0x0F0F0F0F0F0F0F0F
        x |= x >> 4
        x &= 0x00FF00FF00FF00FF
        x |= x >> 8
        x &= 0x0000FFFF0000FFFF
        x |= x >> 16
        return x & 0xFFFFFFFF
    return compact2(code), compact2(code >> 2)


def _pv_can_encode(d_min: int, d_max: int, delta_bits: int,
                   overlap_bits: int, have_exceptions: bool) -> bool:
    d_min &= ~_bit_mask(delta_bits - overlap_bits) & _U64
    max_delta = _bit_mask(delta_bits)
    if have_exceptions:
        if max_delta < _PV_BLOCK_SIZE:
            return False
        max_delta -= _PV_BLOCK_SIZE
    return (d_min > (_U64 ^ max_delta)) or (d_min + max_delta >= d_max)


def _pv_block_code(values: list[int], base: int,
                   have_exceptions: bool) -> tuple[int, int, int]:
    """(delta_bits, offset_bits, overlap_bits) for one block
    (encoded_s2point_vector.cc GetBlockCode)."""
    enc = [v for v in values if v != _PV_EXCEPTION]
    if not enc:
        return 4, 0, 0
    b_min = min(enc) - base
    b_max = max(enc) - base
    delta_bits = (max(1, (b_max - b_min).bit_length() - 1) + 3) & ~3
    overlap_bits = 0
    if not _pv_can_encode(b_min, b_max, delta_bits, 0, have_exceptions):
        if _pv_can_encode(b_min, b_max, delta_bits, 4, have_exceptions):
            overlap_bits = 4
        else:
            delta_bits += 4
            if not _pv_can_encode(b_min, b_max, delta_bits, 0,
                                  have_exceptions):
                overlap_bits = 4
    if len(values) == 1 and not have_exceptions:
        delta_bits = 8       # singleton blocks waste 4 bits otherwise
    max_delta = _bit_mask(delta_bits) - \
        (_PV_BLOCK_SIZE if have_exceptions else 0)
    offset_bits = 0
    if b_max > max_delta:
        offset_shift = delta_bits - overlap_bits
        mask = _bit_mask(offset_shift)
        min_offset = (b_max - max_delta + mask) & ~mask
        offset_bits = (min_offset.bit_length() - offset_shift + 7) & ~7
        if offset_bits == 64:
            overlap_bits = 4
    return delta_bits, offset_bits, overlap_bits


def encode_point_vector(pts: np.ndarray, hint: str = "compact") -> bytes:
    """EncodeS2PointVector: UNCOMPRESSED (varint size|format + raw
    doubles) for `fast`, CELL_IDS block format for `compact` when
    enough points are cell centers (>=5%)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 3)
    n = len(pts)

    def fast() -> bytes:
        out = bytearray()
        put_varint(out, (n << _PV_FORMAT_BITS) | _PV_UNCOMPRESSED)
        return bytes(out) + pts.astype("<f8").tobytes()

    if hint == "fast" or n == 0:
        return fast()
    face, si, ti, cell_level = xyz_to_face_si_ti(pts)
    counts = np.bincount(cell_level[cell_level >= 0], minlength=31) \
        if (cell_level >= 0).any() else np.zeros(31, dtype=np.int64)
    level = int(np.argmax(counts))
    if counts[level] <= 0.05 * n:
        return fast()
    shift = MAX_LEVEL - level
    values = []
    have_exceptions = False
    for k in range(n):
        if cell_level[k] != level:
            values.append(_PV_EXCEPTION)
            have_exceptions = True
        else:
            sj = ((((int(face[k]) & 3) << 30) | (int(si[k]) >> 1))
                  & 0xFFFFFFFF) >> shift
            tj = ((((int(face[k]) & 4) << 29) | int(ti[k]))
                  & 0xFFFFFFFF) >> (shift + 1)
            values.append(_interleave_bit_pairs(sj, tj))
    # global base: shared prefix of non-exception values, 0-7 bytes
    enc_vals = [v for v in values if v != _PV_EXCEPTION]
    v_min, v_max = min(enc_vals), max(enc_vals)
    min_delta_bits = 8 if (have_exceptions or n == 1) else 4
    excluded_bits = max((v_min ^ v_max).bit_length(),
                        min_delta_bits, _base_shift(level, 56))
    base = v_min & ~_bit_mask(excluded_bits)
    if base == 0:
        base_bits = 0
    else:
        low_bit = (base & -base).bit_length() - 1
        base_bits = (_max_bits_for_level(level) - low_bit + 7) & ~7
    base = v_min & ~_bit_mask(_base_shift(level, base_bits))
    base_bytes = base_bits >> 3
    num_blocks = (n + _PV_BLOCK_SIZE - 1) >> _PV_BLOCK_SHIFT
    last_block_count = n - _PV_BLOCK_SIZE * (num_blocks - 1)
    out = bytearray()
    out.append(_PV_CELL_IDS | (int(have_exceptions) << 3)
               | ((last_block_count - 1) << 4))
    out.append(base_bytes | (level << 3))
    out += (base >> _base_shift(level, base_bits)) \
        .to_bytes(8, "little")[:base_bytes]
    blocks = []
    for i in range(0, n, _PV_BLOCK_SIZE):
        bvals = values[i:i + _PV_BLOCK_SIZE]
        delta_bits, offset_bits, overlap_bits = \
            _pv_block_code(bvals, base, have_exceptions)
        offset_bytes = offset_bits >> 3
        delta_nibbles = delta_bits >> 2
        overlap_nibbles = overlap_bits >> 2
        block = bytearray()
        block.append((offset_bytes - overlap_nibbles)
                     | (overlap_nibbles << 3) | (delta_nibbles - 1) << 4)
        enc_b = [v - base for v in bvals if v != _PV_EXCEPTION]
        offset = min(enc_b) if enc_b else 0
        offset_shift = delta_bits - overlap_bits
        offset &= ~_bit_mask(offset_shift)
        if offset > 0:
            block += (offset >> offset_shift) \
                .to_bytes(8, "little")[:offset_bytes]
        delta_bytes = (delta_nibbles + 1) >> 1
        exceptions = []
        for j, v in enumerate(bvals):
            if v == _PV_EXCEPTION:
                delta = len(exceptions)
                exceptions.append(pts[i + j])
            else:
                delta = v - (offset + base)
                if have_exceptions:
                    delta += _PV_BLOCK_SIZE
            if (delta_nibbles & 1) and (j & 1):
                # share a byte with the previous delta's high nibble
                last = block.pop()
                delta = (delta << 4) | (last & 0xF)
            block += delta.to_bytes(8, "little")[:delta_bytes]
        for exc in exceptions:
            block += np.asarray(exc, dtype="<f8").tobytes()
        blocks.append(bytes(block))
    return bytes(out) + encode_string_vector(blocks)


def decode_point_vector(buf, start: int = 0,
                        return_pos: bool = False):
    fmt = buf[start] & ((1 << _PV_FORMAT_BITS) - 1)
    if fmt == _PV_UNCOMPRESSED:
        size_fmt, pos = get_varint(buf, start)
        n = size_fmt >> _PV_FORMAT_BITS
        pts = np.frombuffer(buf, dtype="<f8", count=3 * n,
                            offset=pos).reshape(n, 3).copy()
        return (pts, pos + 24 * n) if return_pos else pts
    if fmt != _PV_CELL_IDS:
        raise ValueError(f"bad point vector format {fmt}")
    header1, header2 = buf[start], buf[start + 1]
    have_exceptions = (header1 & 8) != 0
    last_block_count = (header1 >> 4) + 1
    base_bytes = header2 & 7
    level = header2 >> 3
    pos = start + 2
    base = int.from_bytes(bytes(buf[pos:pos + base_bytes]) +
                          b"\x00" * (8 - base_bytes), "little") \
        << _base_shift(level, base_bytes << 3)
    pos += base_bytes
    blocks, end_pos = decode_string_vector(buf, pos)
    n = _PV_BLOCK_SIZE * (len(blocks) - 1) + last_block_count
    shift = MAX_LEVEL - level
    pts = np.empty((n, 3), dtype=np.float64)
    for bi, block in enumerate(blocks):
        header = block[0]
        overlap_nibbles = (header >> 3) & 1
        offset_bytes = (header & 7) + overlap_nibbles
        delta_nibbles = (header >> 4) + 1
        p = 1
        offset = 0
        if offset_bytes > 0:
            offset_shift = (delta_nibbles - overlap_nibbles) << 2
            offset = int.from_bytes(
                bytes(block[p:p + offset_bytes]) +
                b"\x00" * (8 - offset_bytes), "little") << offset_shift
            p += offset_bytes
        block_size = min(_PV_BLOCK_SIZE, n - bi * _PV_BLOCK_SIZE)
        deltas_end = p + ((block_size * delta_nibbles + 1) >> 1)
        delta_bytes = (delta_nibbles + 1) >> 1
        for j in range(block_size):
            nib_off = j * delta_nibbles
            dptr = p + (nib_off >> 1)
            delta = int.from_bytes(
                bytes(block[dptr:dptr + delta_bytes]) +
                b"\x00" * (8 - delta_bytes), "little")
            delta >>= (nib_off & 1) << 2
            delta &= _bit_mask(delta_nibbles << 2)
            idx = bi * _PV_BLOCK_SIZE + j
            if have_exceptions:
                if delta < _PV_BLOCK_SIZE:
                    eptr = deltas_end + delta * 24
                    pts[idx] = np.frombuffer(block, dtype="<f8",
                                             count=3, offset=eptr)
                    continue
                delta -= _PV_BLOCK_SIZE
            value = base + offset + delta
            sj, tj = _deinterleave_bit_pairs(value)
            si = (((sj << 1) | 1) << shift) & 0x7FFFFFFF
            ti = (((tj << 1) | 1) << shift) & 0x7FFFFFFF
            f = (((sj << shift) & 0xFFFFFFFF) >> 30) \
                | ((((tj << (shift + 1)) & 0xFFFFFFFF) >> 29) & 4)
            x, y, z = coords.face_uv_to_xyz(
                np.array([f]),
                coords.st_to_uv(coords.si_ti_to_st(np.array([si]))),
                coords.st_to_uv(coords.si_ti_to_st(np.array([ti]))))
            x, y, z = coords.normalize_xyz(x, y, z)
            pts[idx] = [x[0], y[0], z[0]]
    return (pts, end_pos) if return_pos else pts


# ---------------------------------------------------------------------------
# trivial S2CellId coder (8 bytes, little-endian)
# ---------------------------------------------------------------------------

def encode_cellid(cid: int) -> bytes:
    return int(np.uint64(np.int64(cid))).to_bytes(8, "little")


def decode_cellid(buf) -> int:
    return int.from_bytes(bytes(buf[:8]), "little")


# ---------------------------------------------------------------------------
# EncodedS2ShapeIndex (mutable_s2shape_index.cc:1958-2020 Encode/Init,
# s2shape_index.cc:69-360 S2ShapeIndexCell/S2ClippedShape encodings,
# encoded_s2shape_index.h:128): varint64(max_edges << 2 | version=0),
# EncodedS2CellIdVector of cell ids, EncodedStringVector of per-cell
# encodings.  A clipped shape is (shape_id, contains_center, edge_ids).

SHAPE_INDEX_VERSION = 0


def _encode_edges(out: bytearray, edges: list[int]) -> None:
    """(edge_id, count) contiguous-range runs, delta-encoded; the last
    edge omits its count (s2shape_index.cc:290-329)."""
    base = 0
    n = len(edges)
    i = 0
    while i < n:
        eid = edges[i]
        delta = eid - base
        if i + 1 == n:
            put_varint(out, delta)
            i += 1
            continue
        count = 1
        while i + 1 < n and edges[i + 1] == eid + count:
            count += 1
            i += 1
        if count < 8:
            put_varint(out, delta << 3 | (count - 1))
        else:
            put_varint(out, (count - 8) << 3 | 7)
            put_varint(out, delta)
        base = eid + count
        i += 1


def _decode_edges(buf, pos: int, num_edges: int
                  ) -> tuple[list[int], int]:
    edges: list[int] = []
    eid = 0
    while len(edges) < num_edges:
        v, pos = get_varint(buf, pos)
        if len(edges) + 1 == num_edges:
            eid += v
            edges.append(eid)
            break
        count = (v & 7) + 1
        v >>= 3
        if count == 8:
            count += v
            v, pos = get_varint(buf, pos)
        eid += v
        edges.extend(range(eid, eid + count))
        eid += count
    return edges, pos


def encode_shape_index_cell(clipped: list[tuple], num_shape_ids: int
                            ) -> bytes:
    """clipped: [(shape_id, contains_center, [edge_ids...])...] sorted
    by shape_id (s2shape_index.cc:69-190)."""
    out = bytearray()
    if num_shape_ids == 1:
        assert len(clipped) == 1 and clipped[0][0] == 0
        _, cc, edges = clipped[0]
        n = len(edges)
        if n >= 2 and n <= 17 and edges[-1] - edges[0] == n - 1:
            put_varint(out, edges[0] << 6 | (n - 2) << 2 | int(cc) << 1)
        elif n == 1:
            put_varint(out, edges[0] << 3 | int(cc) << 2 | 1)
        else:
            put_varint(out, n << 3 | int(cc) << 2 | 3)
            _encode_edges(out, list(edges))
        return bytes(out)
    if len(clipped) > 1:
        put_varint(out, len(clipped) << 3 | 3)
    base = 0
    for shape_id, cc, edges in clipped:
        delta = shape_id - base
        base = shape_id + 1
        n = len(edges)
        if n >= 1 and n <= 16 and edges[-1] - edges[0] == n - 1:
            put_varint(out, edges[0] << 2 | int(cc) << 1)
            put_varint(out, delta << 4 | (n - 1))
        elif n == 0:
            put_varint(out, delta << 4 | int(cc) << 3 | 7)
        else:
            put_varint(out, (n - 1) << 3 | int(cc) << 2 | 1)
            put_varint(out, delta)
            _encode_edges(out, list(edges))
    return bytes(out)


def decode_shape_index_cell(buf, num_shape_ids: int, pos: int = 0
                            ) -> list[tuple]:
    clipped: list[tuple] = []
    if num_shape_ids == 1:
        header, pos = get_varint(buf, pos)
        if (header & 1) == 0:
            n = ((header >> 2) & 15) + 2
            e0 = header >> 6
            return [(0, bool(header & 2), list(range(e0, e0 + n)))]
        if (header & 2) == 0:
            return [(0, bool(header & 4), [header >> 3])]
        n = header >> 3
        edges, pos = _decode_edges(buf, pos, n)
        return [(0, bool(header & 4), edges)]
    v, pos = get_varint(buf, pos)
    if (v & 7) == 3:
        num_clipped = v >> 3
        v, pos = get_varint(buf, pos)
    else:
        num_clipped = 1
    base = 0
    for _ in range(num_clipped):
        if (v & 1) == 0:
            cc = bool(v & 2)
            e0 = v >> 2
            v2, pos = get_varint(buf, pos)
            n = (v2 & 15) + 1
            delta = v2 >> 4
            clipped.append((base + delta, cc,
                            list(range(e0, e0 + n))))
            base += delta + 1
        elif (v & 7) == 7:
            cc = bool(v & 8)
            delta = v >> 4
            clipped.append((base + delta, cc, []))
            base += delta + 1
        else:  # (v & 3) == 1 general case
            cc = bool(v & 4)
            n = (v >> 3) + 1
            delta, pos = get_varint(buf, pos)
            edges, pos = _decode_edges(buf, pos, n)
            clipped.append((base + delta, cc, edges))
            base += delta + 1
        if len(clipped) < num_clipped:
            v, pos = get_varint(buf, pos)
    return clipped


def encode_shape_index(cells: list[tuple], num_shape_ids: int,
                       max_edges_per_cell: int = 10) -> bytes:
    """cells: [(cell_id, clipped_list)...] sorted by cell id.
    Layout: varint64(max_edges << 2 | version) + cell-id vector +
    string vector of cell encodings."""
    out = bytearray()
    put_varint(out, max_edges_per_cell << 2 | SHAPE_INDEX_VERSION)
    ids = np.array([c[0] for c in cells], dtype=np.uint64)
    out += encode_cellid_vector(ids)
    out += encode_string_vector([
        encode_shape_index_cell(cl, num_shape_ids)
        for _, cl in cells])
    return bytes(out)


def decode_shape_index(buf, num_shape_ids: int
                       ) -> tuple[int, list[tuple]]:
    """-> (max_edges_per_cell, [(cell_id, clipped_list)...])."""
    v, pos = get_varint(buf, 0)
    if (v & 3) != SHAPE_INDEX_VERSION:
        raise ValueError("bad version")
    max_edges = v >> 2
    shift, base, pos = _decode_base_shift(buf, pos)
    deltas, pos = decode_uint_vector(buf, pos)
    ids = (deltas << np.uint64(shift)) + np.uint64(base)
    blobs, pos = decode_string_vector(buf, pos)
    cells = [(int(cid), decode_shape_index_cell(blob, num_shape_ids))
             for cid, blob in zip(ids, blobs)]
    return max_edges, cells


# ---------------------------------------------------------------------------
# Lax shapes + tagged-shape vector (s2shapeutil_coding.cc:134-175,
# s2lax_polygon_shape.cc:183-230, s2lax_polyline_shape.cc:76-85,
# s2point_vector_shape.h:62-70): the "shapes" half of the encoded
# blob — CompactEncodeTaggedShapes(index) + index.Encode(encoder)
# produces one self-contained byte string.

TAG_POINT_VECTOR = 3
TAG_LAX_POLYLINE = 4
TAG_LAX_POLYGON = 5
_LAX_POLYGON_VERSION = 1


def encode_uint32_vector(vals: np.ndarray) -> bytes:
    """EncodedUintVector<uint32>: varint((n * 4) | (len-1)) + n * len
    LE bytes."""
    vals = np.asarray(vals, dtype=np.uint32)
    n = len(vals)
    one_bits = int(np.bitwise_or.reduce(vals)) | 1 if n else 1
    length = ((one_bits.bit_length() - 1) >> 3) + 1
    out = bytearray()
    put_varint(out, (n * 4) | (length - 1))
    if n:
        raw = vals.astype("<u4").view(np.uint8).reshape(n, 4)
        out += raw[:, :length].tobytes()
    return bytes(out)


def decode_uint32_vector(buf, pos: int = 0) -> tuple[np.ndarray, int]:
    size_len, pos = get_varint(buf, pos)
    n = size_len >> 2
    length = (size_len & 3) + 1
    if n == 0:
        return np.empty(0, dtype=np.uint32), pos
    raw = np.frombuffer(buf, dtype=np.uint8, count=n * length,
                        offset=pos).reshape(n, length)
    full = np.zeros((n, 4), dtype=np.uint8)
    full[:, :length] = raw
    return full.view("<u4").ravel(), pos + n * length


def encode_lax_polygon(loops: list[np.ndarray],
                       hint: str = "compact") -> bytes:
    """S2LaxPolygonShape: version byte, varint num_loops, one
    point vector of ALL vertices, + uint32 loop_starts (n+1) when
    num_loops > 1."""
    out = bytearray([_LAX_POLYGON_VERSION])
    put_varint(out, len(loops))
    verts = (np.concatenate([np.asarray(lp, dtype=np.float64)
                             .reshape(-1, 3) for lp in loops])
             if loops else np.empty((0, 3)))
    out += encode_point_vector(verts, hint)
    if len(loops) > 1:
        starts = np.cumsum([0] + [len(lp) for lp in loops])
        out += encode_uint32_vector(starts.astype(np.uint32))
    return bytes(out)


def decode_lax_polygon(buf, pos: int = 0
                       ) -> tuple[list[np.ndarray], int]:
    if buf[pos] != _LAX_POLYGON_VERSION:
        raise ValueError("bad lax polygon version")
    num_loops, pos = get_varint(buf, pos + 1)
    verts, pos = decode_point_vector(buf, pos, return_pos=True)
    if num_loops <= 1:
        return ([verts] if num_loops else []), pos
    starts, pos = decode_uint32_vector(buf, pos)
    return [verts[starts[i]:starts[i + 1]]
            for i in range(num_loops)], pos


def encode_tagged_shapes(shapes: list[tuple],
                         hint: str = "compact") -> bytes:
    """shapes: [(kind, data)...] with kind in {'points', 'polyline',
    'polygon'} -> StringVector of varint(type_tag) + shape bytes
    (CompactEncodeTaggedShapes for hint='compact')."""
    blobs = []
    for kind, data in shapes:
        sub = bytearray()
        if kind == "points":
            put_varint(sub, TAG_POINT_VECTOR)
            sub += encode_point_vector(
                np.asarray(data, dtype=np.float64).reshape(-1, 3),
                hint)
        elif kind == "polyline":
            put_varint(sub, TAG_LAX_POLYLINE)
            sub += encode_point_vector(
                np.asarray(data, dtype=np.float64).reshape(-1, 3),
                hint)
        elif kind == "polygon":
            put_varint(sub, TAG_LAX_POLYGON)
            sub += encode_lax_polygon(data, hint)
        else:
            raise ValueError(kind)
        blobs.append(bytes(sub))
    return encode_string_vector(blobs)


def decode_tagged_shapes(buf, pos: int = 0
                         ) -> tuple[list[tuple], int]:
    blobs, pos = decode_string_vector(buf, pos)
    out: list[tuple] = []
    for blob in blobs:
        tag, p = get_varint(blob, 0)
        if tag == TAG_POINT_VECTOR:
            out.append(("points", decode_point_vector(blob, p)))
        elif tag == TAG_LAX_POLYLINE:
            out.append(("polyline", decode_point_vector(blob, p)))
        elif tag == TAG_LAX_POLYGON:
            loops, _ = decode_lax_polygon(blob, p)
            out.append(("polygon", loops))
        else:
            raise ValueError(f"unknown type tag {tag}")
    return out, pos


def encode_indexed_geometry(shapes: list[tuple], cells: list[tuple],
                            max_edges_per_cell: int = 10,
                            hint: str = "compact") -> bytes:
    """The full encoded blob: CompactEncodeTaggedShapes(index) +
    index.Encode(encoder) — one self-contained byte string from which
    both the geometry and its spatial index decode
    (encoded_s2shape_index.h:80-95 example usage)."""
    return (encode_tagged_shapes(shapes, hint)
            + encode_shape_index(cells, num_shape_ids=len(shapes),
                                 max_edges_per_cell=max_edges_per_cell))


def decode_indexed_geometry(buf) -> tuple[list[tuple], int, list]:
    shapes, pos = decode_tagged_shapes(buf, 0)
    v, p2 = get_varint(buf, pos)
    if (v & 3) != SHAPE_INDEX_VERSION:
        raise ValueError("bad index version")
    max_edges = v >> 2
    shift, base, p2 = _decode_base_shift(buf, p2)
    deltas, p2 = decode_uint_vector(buf, p2)
    ids = (deltas << np.uint64(shift)) + np.uint64(base)
    blobs, p2 = decode_string_vector(buf, p2)
    cells = [(int(cid), decode_shape_index_cell(blob, len(shapes)))
             for cid, blob in zip(ids, blobs)]
    return shapes, max_edges, cells
