"""S2CellId Hilbert-curve kernels, vectorized over NumPy uint64 arrays.

Re-implements (from scratch, Spark/NumPy-first) the cell-id semantics of
the reference library: 64-bit ids = 3 face bits + 61 bits of (Hilbert
position, level marker); level = position of lowest set bit; total order =
Hilbert curve order.  Semantics verified bit-exactly against the
reference's published behavior:

- encode/decode: s2cell_id.cc:271-397 (4-bit lookup-table rounds)
- lookup-table construction: s2cell_id.cc:88-123, s2coords.cc:33-57
- hierarchy / ranges: s2cell_id.h:571-724
- tokens: s2cell_id.cc:221-258
- neighbors incl. cross-face wrap: s2cell_id.cc:470-610
- maximum_tile / common ancestor: s2cell_id.cc:174-211

Everything operates on np.uint64 arrays (no per-row Python).  Public
Spark-facing entry points convert to/from int64 (the storage dtype;
two's-complement view, so all bit tricks still hold).
"""

from __future__ import annotations

import numpy as np

from . import coords

# --- structural constants (s2cell_id.h:59-104) ---
FACE_BITS = 3
NUM_FACES = 6
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL

SWAP_MASK = 1
INVERT_MASK = 2
LOOKUP_BITS = 4

_U = np.uint64  # shorthand for scalar constants

# kPosToIJ[orientation][pos] -> ij  (s2coords.cc:42-49)
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
# kIJtoPos[orientation][ij] -> pos  (s2coords.cc:33-39)
IJ_TO_POS = ((0, 1, 3, 2), (0, 3, 1, 2), (2, 3, 1, 0), (2, 1, 3, 0))
# kPosToOrientation[pos] -> orientation modifier (s2coords.cc:51-56)
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)


def _build_lookup_tables():
    """Build the 1024-entry Hilbert nibble tables (s2cell_id.cc:92-123).

    lookup_pos["iiiijjjjoo"] = "ppppppppoo"; lookup_ij is the inverse.
    Built iteratively (the reference recurses); identical contents.
    """
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    # stack entries: (level, i, j, orig_orientation, pos, orientation)
    stack = [(0, 0, 0, o, 0, o) for o in (0, SWAP_MASK, INVERT_MASK,
                                          SWAP_MASK | INVERT_MASK)]
    while stack:
        level, i, j, orig, pos, orient = stack.pop()
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            continue
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orient]
        for k in range(4):
            stack.append((level, i + (r[k] >> 1), j + (r[k] & 1), orig,
                          pos + k, orient ^ POS_TO_ORIENTATION[k]))
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup_tables()


# ---------------------------------------------------------------------------
# dtype helpers
# ---------------------------------------------------------------------------

def as_u64(ids) -> np.ndarray:
    """View/convert any integer array as uint64 (two's complement)."""
    a = np.asarray(ids)
    if a.dtype == np.uint64:
        return a
    if a.dtype == np.int64:
        return a.view(np.uint64)
    return a.astype(np.int64).view(np.uint64)


def as_i64(ids) -> np.ndarray:
    """uint64 -> int64 view (the Spark storage dtype)."""
    a = np.asarray(ids)
    return a.view(np.int64) if a.dtype == np.uint64 else a.astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 (NumPy<2 has no bitwise_count)."""
    x = x - ((x >> _U(1)) & _U(0x5555555555555555))
    x = (x & _U(0x3333333333333333)) + ((x >> _U(2)) & _U(0x3333333333333333))
    x = (x + (x >> _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    return (x * _U(0x0101010101010101)) >> _U(56)


# ---------------------------------------------------------------------------
# level / hierarchy bit math (s2cell_id.h:571-724)
# ---------------------------------------------------------------------------

def lsb(ids) -> np.ndarray:
    i = as_u64(ids)
    return i & (~i + _U(1))


def lsb_for_level(level) -> np.ndarray:
    lev = np.asarray(level, dtype=np.uint64)
    return _U(1) << (_U(2) * (_U(MAX_LEVEL) - lev))


def level(ids) -> np.ndarray:
    """level = 30 - ctz(id)/2; ctz via popcount(lsb-1)."""
    tz = _popcount64(lsb(ids) - _U(1))
    return (np.int64(MAX_LEVEL) - (tz.view(np.int64) >> 1)).astype(np.int64)


def is_leaf(ids) -> np.ndarray:
    return (as_u64(ids) & _U(1)) != 0


def is_face(ids) -> np.ndarray:
    return (as_u64(ids) & (lsb_for_level(0) - _U(1))) == 0


def is_valid(ids) -> np.ndarray:
    i = as_u64(ids)
    return (face(i) < NUM_FACES) & ((lsb(i) & _U(0x1555555555555555)) != 0)


def face(ids) -> np.ndarray:
    return (as_u64(ids) >> _U(POS_BITS)).astype(np.int64)


def pos(ids) -> np.ndarray:
    return as_u64(ids) & (~_U(0) >> _U(FACE_BITS))


def parent(ids, lev) -> np.ndarray:
    """Ancestor at level `lev` (s2cell_id.h:650-658)."""
    i = as_u64(ids)
    nlsb = lsb_for_level(lev)
    return (i & (~nlsb + _U(1))) | nlsb


def parent1(ids) -> np.ndarray:
    """Immediate parent (one level up)."""
    i = as_u64(ids)
    nlsb = lsb(i) << _U(2)
    return (i & (~nlsb + _U(1))) | nlsb


def child(ids, position) -> np.ndarray:
    """Child at position 0..3 (s2cell_id.h:660-668)."""
    i = as_u64(ids)
    nlsb = lsb(i) >> _U(2)
    p = np.asarray(position, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return i + (_U(2) * p + _U(1) - _U(4)) * nlsb


def child_begin(ids, lev=None) -> np.ndarray:
    i = as_u64(ids)
    old = lsb(i)
    new = (old >> _U(2)) if lev is None else lsb_for_level(lev)
    return i - old + new


def child_end(ids, lev=None) -> np.ndarray:
    i = as_u64(ids)
    old = lsb(i)
    new = (old >> _U(2)) if lev is None else lsb_for_level(lev)
    return i + old + new


def range_min(ids) -> np.ndarray:
    i = as_u64(ids)
    return i - (lsb(i) - _U(1))


def range_max(ids) -> np.ndarray:
    i = as_u64(ids)
    return i + (lsb(i) - _U(1))


def contains(a, b) -> np.ndarray:
    """Does cell a contain cell b (descendant-interval test)."""
    a, b = as_u64(a), as_u64(b)
    return (b >= range_min(a)) & (b <= range_max(a))


def intersects(a, b) -> np.ndarray:
    a, b = as_u64(a), as_u64(b)
    return (range_min(b) <= range_max(a)) & (range_max(b) >= range_min(a))


_WRAP_OFFSET = _U(NUM_FACES) << _U(POS_BITS)  # kWrapOffset (s2cell_id.cc:125)


def _expand_endpoint(u: float, max_v: float, sin_dist: float) -> float:
    """Shift a u-coordinate so the line u=u' sits exactly sin_dist
    from the edge (u,v0)-(u,v1) (s2cell_id.cc:436-444)."""
    import math
    sin_u_shift = sin_dist * math.sqrt((1 + u * u + max_v * max_v)
                                       / (1 + u * u))
    cos_u_shift = math.sqrt(1 - sin_u_shift * sin_u_shift)
    return ((cos_u_shift * u + sin_u_shift)
            / (cos_u_shift - sin_u_shift * u))


def expanded_by_distance_uv(uv: tuple, distance_rad: float) -> tuple:
    """Expand a face uv-rect ((u0,u1),(v0,v1)) so it includes all
    points within `distance_rad` of it on the sphere (negative
    distance shrinks) — S2CellId::ExpandedByDistanceUV
    (s2cell_id.cc:446-468).  Returns the new ((u0,u1),(v0,v1)); a
    shrink past empty collapses to the first corner."""
    import math
    (u0, u1), (v0, v1) = uv
    max_u = max(abs(u0), abs(u1))
    max_v = max(abs(v0), abs(v1))
    sin_dist = math.sin(distance_rad)
    xi = (_expand_endpoint(u0, max_v, -sin_dist),
          _expand_endpoint(u1, max_v, sin_dist))
    yi = (_expand_endpoint(v0, max_u, -sin_dist),
          _expand_endpoint(v1, max_u, sin_dist))
    if xi[0] > xi[1] or yi[0] > yi[1]:
        return ((u0, u0), (v0, v0))
    return (xi, yi)


def advance(ids, n) -> np.ndarray:
    """Advance n positions along the Hilbert curve at the cell's own
    level, CLAMPED so the result stays within [Begin(level), End(level)]
    (s2cell_id.cc:125-148).  n may be negative; inputs/outputs may be the
    Begin/End sentinels themselves."""
    i = as_u64(ids)
    tz = _popcount64(lsb(i) - _U(1))          # 2*(30-level)
    shift = tz + _U(1)                        # step shift
    n64 = np.broadcast_to(np.asarray(n, dtype=np.int64), i.shape)
    min_steps = -((i >> shift).astype(np.int64))
    max_steps = ((_WRAP_OFFSET + lsb(i) - i) >> shift).astype(np.int64)
    steps = np.clip(n64, min_steps, max_steps)
    return i + (steps.astype(np.uint64) << shift)


def advance_wrap(ids, n) -> np.ndarray:
    """Advance n positions wrapping around the sphere (the curve is a
    cycle: End(level) wraps to Begin(level)), s2cell_id.cc:150-172."""
    i = as_u64(ids)
    tz = _popcount64(lsb(i) - _U(1))
    shift = tz + _U(1)
    num = (_WRAP_OFFSET >> shift).astype(np.int64)      # cells at level
    n64 = np.broadcast_to(np.asarray(n, dtype=np.int64), i.shape)
    steps = np.mod(n64 + (i >> shift).astype(np.int64), num)
    begin = lsb(i)  # Begin(level) id = lsb (face 0, pos 0, level marker)
    return begin + (steps.astype(np.uint64) << shift)


def distance_from_begin(ids) -> np.ndarray:
    """Curve position at the cell's level (steps from Begin(level),
    s2cell_id.cc:125-148): the Hilbert prefix — id >> (2*(30-l)+1)."""
    i = as_u64(ids)
    tz = _popcount64(lsb(i) - _U(1))
    return (i >> (tz + _U(1))).astype(np.int64)


def next_cell(ids) -> np.ndarray:
    i = as_u64(ids)
    return i + (lsb(i) << _U(1))


def prev_cell(ids) -> np.ndarray:
    i = as_u64(ids)
    return i - (lsb(i) << _U(1))


def child_position(ids, lev) -> np.ndarray:
    """Position (0..3) of the level-`lev` ancestor within its parent."""
    i = as_u64(ids)
    lev = np.asarray(lev, dtype=np.uint64)
    return ((i >> (_U(2) * (_U(MAX_LEVEL) - lev) + _U(1))) & _U(3)).astype(np.int64)


def common_ancestor_level(a, b) -> np.ndarray:
    """Level of the smallest common ancestor, or -1 (s2cell_id.cc:197-211)."""
    a, b = as_u64(a), as_u64(b)
    bits = np.maximum(a ^ b, np.maximum(lsb(a), lsb(b)))
    # bit_width via popcount of smeared bits
    x = bits.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> _U(s)
    width = _popcount64(x).view(np.int64)
    return np.maximum(61 - width, -1) >> 1


def from_face(f) -> np.ndarray:
    f = np.asarray(f, dtype=np.uint64)
    return (f << _U(POS_BITS)) + lsb_for_level(0)


def from_face_pos_level(f, p, lev) -> np.ndarray:
    f = np.asarray(f, dtype=np.uint64)
    p = np.asarray(p, dtype=np.uint64)
    raw = (f << _U(POS_BITS)) + (p | _U(1))
    return parent(raw, lev)


# ---------------------------------------------------------------------------
# Hilbert encode / decode (s2cell_id.cc:271-397)
# ---------------------------------------------------------------------------

def from_face_ij(f, i, j) -> np.ndarray:
    """(face, i, j) leaf coords -> leaf cell id.  8 nibble rounds.

    In-place ufuncs with two scratch buffers: the round loop is
    memory-traffic-bound at Arrow-batch scale, so minimizing array
    temporaries roughly doubles throughput."""
    f = np.asarray(f, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = f << _U(POS_BITS - 1)
    bits = (f & _U(SWAP_MASK)).copy()
    t = np.empty_like(bits)
    mask = _U((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        ku = _U(k * LOOKUP_BITS)
        np.right_shift(i, ku, out=t)
        np.bitwise_and(t, mask, out=t)
        np.left_shift(t, _U(LOOKUP_BITS + 2), out=t)
        np.add(bits, t, out=bits)
        np.right_shift(j, ku, out=t)
        np.bitwise_and(t, mask, out=t)
        np.left_shift(t, _U(2), out=t)
        np.add(bits, t, out=bits)
        bits = LOOKUP_POS[bits]  # gather; uint indices bar np.take(out=)
        np.right_shift(bits, _U(2), out=t)
        np.left_shift(t, _U(k * 2 * LOOKUP_BITS), out=t)
        np.bitwise_or(n, t, out=n)
        np.bitwise_and(bits, _U(SWAP_MASK | INVERT_MASK), out=bits)
    np.left_shift(n, _U(1), out=n)
    np.bitwise_or(n, _U(1), out=n)
    return n


def to_face_ij_orientation(ids, want_orientation: bool = False):
    """cell id -> (face, i, j[, orientation]) of a leaf cell inside it."""
    cid = as_u64(ids)
    f = cid >> _U(POS_BITS)
    bits = f & _U(SWAP_MASK)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits = bits + (
            ((cid >> _U(k * 2 * LOOKUP_BITS + 1)) & _U((1 << (2 * nbits)) - 1))
            << _U(2))
        bits = LOOKUP_IJ[bits]
        i += (bits >> _U(LOOKUP_BITS + 2)) << _U(k * LOOKUP_BITS)
        j += ((bits >> _U(2)) & _U((1 << LOOKUP_BITS) - 1)) << _U(k * LOOKUP_BITS)
        bits &= _U(SWAP_MASK | INVERT_MASK)
    if want_orientation:
        flip = (lsb(cid) & _U(0x1111111111111110)) != 0
        orientation = np.where(flip, bits ^ _U(SWAP_MASK), bits).astype(np.int64)
        return f.astype(np.int64), i.astype(np.int64), j.astype(np.int64), orientation
    return f.astype(np.int64), i.astype(np.int64), j.astype(np.int64)


_LOOKUP_IJ_LIST = None


def to_face_ij_scalar(cid: int) -> tuple[int, int, int, int]:
    """Single-id decode in pure Python ints: ~100x faster than the
    vectorized kernel for n=1 (NumPy per-ufunc overhead dominates tiny
    batches).  Returns (face, i, j, level).  Used by Cell.__init__ —
    the coverer constructs cells one at a time."""
    global _LOOKUP_IJ_LIST
    if _LOOKUP_IJ_LIST is None:
        _LOOKUP_IJ_LIST = LOOKUP_IJ.tolist()
    c = cid & 0xFFFFFFFFFFFFFFFF
    f = c >> POS_BITS
    bits = f & SWAP_MASK
    i = j = 0
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits += ((c >> (k * 2 * LOOKUP_BITS + 1))
                 & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ_LIST[bits]
        i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    lsb_v = c & (~c + 1)
    lev = MAX_LEVEL - (lsb_v.bit_length() - 1) // 2
    return int(f), i, j, lev


def from_face_ij_wrap(f, i, j) -> np.ndarray:
    """(face,i,j) possibly outside [0,2^30) -> wrapped leaf id on the
    adjacent face (s2cell_id.cc:470-501).  Uses the linear projection."""
    i = np.clip(np.asarray(i, dtype=np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, MAX_SIZE)
    k_scale = 1.0 / MAX_SIZE
    k_limit = 1.0 + np.finfo(np.float64).eps
    u = np.clip(k_scale * (2 * (i - MAX_SIZE // 2) + 1).astype(np.float64),
                -k_limit, k_limit)
    v = np.clip(k_scale * (2 * (j - MAX_SIZE // 2) + 1).astype(np.float64),
                -k_limit, k_limit)
    x, y, z = coords.face_uv_to_xyz(np.asarray(f, dtype=np.int64), u, v)
    nf, nu, nv = coords.xyz_to_face_uv(x, y, z)
    return from_face_ij(nf, coords.st_to_ij(0.5 * (nu + 1.0)),
                        coords.st_to_ij(0.5 * (nv + 1.0)))


def from_face_ij_same(f, i, j, same_face) -> np.ndarray:
    """Dispatch FromFaceIJ vs FromFaceIJWrap per row (s2cell_id.cc:503-509)."""
    same_face = np.asarray(same_face, dtype=bool)
    i64 = np.asarray(i, dtype=np.int64)
    j64 = np.asarray(j, dtype=np.int64)
    f64 = np.asarray(f, dtype=np.int64)
    out = np.empty(np.broadcast(f64, i64, j64).shape, dtype=np.uint64)
    if same_face.any():
        m = same_face
        out[m] = from_face_ij(f64[m], i64[m], j64[m])
    if (~same_face).any():
        m = ~same_face
        out[m] = from_face_ij_wrap(f64[m], i64[m], j64[m])
    return out


# ---------------------------------------------------------------------------
# lat/lng <-> cell id
# ---------------------------------------------------------------------------

def from_xyz(x, y, z) -> np.ndarray:
    """S2Point -> leaf id (s2cell_id.cc:316-322)."""
    f, u, v = coords.xyz_to_face_uv(x, y, z)
    i = coords.st_to_ij(coords.uv_to_st(u))
    j = coords.st_to_ij(coords.uv_to_st(v))
    return from_face_ij(f, i, j)


def from_latlng(lat_deg, lng_deg) -> np.ndarray:
    x, y, z = coords.latlng_to_xyz(lat_deg, lng_deg)
    return from_xyz(x, y, z)


def get_center_si_ti(ids):
    """Discrete 2^31-grid center of the cell (s2cell_id.h:543-569)."""
    cid = as_u64(ids)
    f, i, j = to_face_ij_orientation(cid)
    leaf = is_leaf(cid)
    second = ((i ^ (as_i64(cid) >> 2)) & 1) != 0
    delta = np.where(leaf, 1, np.where(second, 2, 0)).astype(np.int64)
    return f, 2 * i + delta, 2 * j + delta


def to_point_raw(ids):
    """cell id -> unnormalized center (x,y,z) (s2cell_id.cc:384-388)."""
    f, si, ti = get_center_si_ti(ids)
    u = coords.st_to_uv(coords.si_ti_to_st(si))
    v = coords.st_to_uv(coords.si_ti_to_st(ti))
    return coords.face_uv_to_xyz(f, u, v)


def to_point(ids):
    x, y, z = to_point_raw(ids)
    return coords.normalize_xyz(x, y, z)


def to_latlng(ids):
    x, y, z = to_point_raw(ids)
    return coords.xyz_to_latlng(x, y, z)


def get_size_ij(lev) -> np.ndarray:
    lev = np.asarray(lev, dtype=np.int64)
    return np.int64(1) << (np.int64(MAX_LEVEL) - lev)


# ---------------------------------------------------------------------------
# tokens (s2cell_id.cc:221-258)
# ---------------------------------------------------------------------------

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def to_token(ids) -> list:
    """Order-preserving hex tokens, trailing zeros stripped; id 0 -> 'X'."""
    cid = as_u64(np.atleast_1d(ids))
    n = cid.shape[0]
    shifts = (np.arange(15, -1, -1, dtype=np.int64) * 4).astype(np.uint64)  # MSB first
    nibs = (cid[:, None] >> shifts[None, :]) & _U(15)
    chars = _HEX[nibs.astype(np.intp)]  # (n, 16) uint8
    tz = _popcount64(lsb(cid) - _U(1)).view(np.int64)
    nzd = (tz // 4).astype(np.int64)  # trailing zero digits
    lengths = np.where(cid == 0, 0, 16 - nzd)
    full = chars.tobytes()
    out = []
    for r in range(n):
        ln = int(lengths[r])
        out.append("X" if ln == 0 else full[r * 16:r * 16 + ln].decode())
    return out


def from_token(tokens) -> np.ndarray:
    """Inverse of to_token; malformed -> 0 (None sentinel)."""
    out = np.zeros(len(tokens), dtype=np.uint64)
    for r, tok in enumerate(tokens):
        if tok is None or len(tok) > 16:
            continue
        cid = 0
        p = 60
        ok = len(tok) > 0
        for ch in tok:
            if "0" <= ch <= "9":
                d = ord(ch) - 48
            elif "a" <= ch <= "f":
                d = ord(ch) - 87
            elif "A" <= ch <= "F":
                d = ord(ch) - 55
            else:
                ok = False
                break
            cid |= d << p
            p -= 4
        if ok:
            out[r] = cid
    return out


# ---------------------------------------------------------------------------
# debug strings "face/0123.." (s2cell_id.cc:612-645)
# ---------------------------------------------------------------------------

def to_debug_string(ids) -> list:
    cid = as_u64(np.atleast_1d(ids))
    f = face(cid)
    lev = level(cid)
    out = []
    for r in range(cid.shape[0]):
        s = f"{int(f[r])}/"
        for cur in range(1, int(lev[r]) + 1):
            s += str(int(child_position(cid[r:r + 1], cur)[0]))
        out.append(s)
    return out


def from_debug_string(s: str) -> int:
    """Parse 'face/0123...' -> id (scalar; test-fixture helper)."""
    fpart, _, digits = s.partition("/")
    cid = from_face(np.array([int(fpart)]))
    for ch in digits:
        cid = child(cid, int(ch))
    return int(cid[0])


# ---------------------------------------------------------------------------
# neighbors (s2cell_id.cc:512-610)
# ---------------------------------------------------------------------------

def get_edge_neighbors(ids) -> np.ndarray:
    """4 edge-adjacent cells at the same level; shape (n, 4)."""
    cid = as_u64(np.atleast_1d(ids))
    lev = level(cid)
    size = get_size_ij(lev)
    f, i, j = to_face_ij_orientation(cid)
    down = from_face_ij_same(f, i, j - size, j - size >= 0)
    right = from_face_ij_same(f, i + size, j, i + size < MAX_SIZE)
    up = from_face_ij_same(f, i, j + size, j + size < MAX_SIZE)
    left = from_face_ij_same(f, i - size, j, i - size >= 0)
    stacked = np.stack([down, right, up, left], axis=1)
    return parent(stacked, lev[:, None])


def append_vertex_neighbors(ids, lev) -> list:
    """3-4 cells at level `lev` touching the closest vertex; list of
    per-row uint64 arrays (s2cell_id.cc:528-567)."""
    cid = as_u64(np.atleast_1d(ids))
    lev_arr = np.broadcast_to(np.asarray(lev, dtype=np.int64), cid.shape)
    f, i, j = to_face_ij_orientation(cid)
    halfsize = get_size_ij(lev_arr + 1)
    size = halfsize << 1
    ibit = (i & halfsize) != 0
    ioffset = np.where(ibit, size, -size)
    isame = np.where(ibit, (i + size) < MAX_SIZE, (i - size) >= 0)
    jbit = (j & halfsize) != 0
    joffset = np.where(jbit, size, -size)
    jsame = np.where(jbit, (j + size) < MAX_SIZE, (j - size) >= 0)
    p0 = parent(cid, lev_arr)
    p1 = parent(from_face_ij_same(f, i + ioffset, j, isame), lev_arr)
    p2 = parent(from_face_ij_same(f, i, j + joffset, jsame), lev_arr)
    p3 = parent(from_face_ij_same(f, i + ioffset, j + joffset, isame & jsame),
                lev_arr)
    keep3 = isame | jsame
    out = []
    for r in range(cid.shape[0]):
        row = [p0[r], p1[r], p2[r]] + ([p3[r]] if keep3[r] else [])
        out.append(np.array(row, dtype=np.uint64))
    return out


def append_all_neighbors(ids, nbr_level) -> list:
    """All neighbors at `nbr_level` >= cell level; list of per-row uint64
    arrays preserving the reference's emission order (s2cell_id.cc:569-610)."""
    cid = as_u64(np.atleast_1d(ids))
    nlev = np.broadcast_to(np.asarray(nbr_level, dtype=np.int64), cid.shape)
    f, i, j = to_face_ij_orientation(cid)
    lev = level(cid)
    size = get_size_ij(lev)
    i = i & (-size)
    j = j & (-size)
    nbr_size = get_size_ij(nlev)
    out = []
    for r in range(cid.shape[0]):
        fr, ir, jr = int(f[r]), int(i[r]), int(j[r])
        sz, nsz, nl = int(size[r]), int(nbr_size[r]), int(nlev[r])
        faces, iis, jjs, sames = [], [], [], []
        k = -nsz
        while True:
            if k < 0:
                same_face = (jr + k >= 0)
            elif k >= sz:
                same_face = (jr + k < MAX_SIZE)
            else:
                same_face = True
                # top and bottom neighbors
                faces += [fr, fr]
                iis += [ir + k, ir + k]
                jjs += [jr - nsz, jr + sz]
                sames += [jr - sz >= 0, jr + sz < MAX_SIZE]
            # left, right (and diagonal) neighbors
            faces += [fr, fr]
            iis += [ir - nsz, ir + sz]
            jjs += [jr + k, jr + k]
            sames += [same_face and ir - sz >= 0, same_face and ir + sz < MAX_SIZE]
            if k >= sz:
                break
            k += nsz
        nbrs = from_face_ij_same(np.array(faces, dtype=np.int64),
                                 np.array(iis, dtype=np.int64),
                                 np.array(jjs, dtype=np.int64),
                                 np.array(sames, dtype=bool))
        out.append(parent(nbrs, np.int64(nl)))
    return out


_DISK_DI = np.array([-1, 1, 0, 0, -1, 1, -1, 1], dtype=np.int64)
_DISK_DJ = np.array([-1, -1, -1, 1, 0, 0, 1, 1], dtype=np.int64)


def disk_cells_batch(ids, lv, rings) -> tuple:
    """Level-`lv` cells within `rings` neighbor rings of each id's
    level-`lv` ancestor, for EVERY row at once -> flat (row, cell)
    arrays sorted by (row, cell), unique per row.

    Level-synchronous BFS vectorized across rows; per-row semantics
    identical to iterated same-level AppendAllNeighbors
    (s2cell_id.cc:569-610): the 8 surrounding same-size (i,j) offsets,
    off-face offsets wrapped via FromFaceIJWrap one ring at a time
    (multi-ring wrap is only correct ring-by-ring — the wrap kernel
    clips to one leaf step off-face).  Replaces a per-row Python
    set-BFS that cost ~0.6 ms/row (29 s for a 50k-row disc_join query
    side); this runs the same frame in ~0.1 s."""
    cid = as_u64(np.atleast_1d(ids))
    n = cid.shape[0]
    lv = np.broadcast_to(np.asarray(lv, dtype=np.int64), (n,))
    rg = np.broadcast_to(np.asarray(rings, dtype=np.int64), (n,))
    centers = parent(cid, lv)
    cf, ci, cj = to_face_ij_orientation(centers)
    cs = get_size_ij(lv)
    ci &= -cs
    cj &= -cs
    # Fast path: rows whose whole (2k+1)^2 grid stays on one face need
    # neither BFS nor dedup — emit the offset grid directly (covers
    # ~99% of rows away from face boundaries; identical cell sets).
    lo_i, lo_j = ci - rg * cs, cj - rg * cs
    hi_i, hi_j = ci + (rg + 1) * cs, cj + (rg + 1) * cs
    interior = ((lo_i >= 0) & (hi_i <= MAX_SIZE)
                & (lo_j >= 0) & (hi_j <= MAX_SIZE))
    fast_r_parts, fast_c_parts = [], []
    fast_rows = np.nonzero(interior)[0]
    for g in np.unique(rg[fast_rows]) if fast_rows.size else []:
        rows_g = fast_rows[rg[fast_rows] == g]
        w = 2 * int(g) + 1
        di = np.arange(-int(g), int(g) + 1, dtype=np.int64)
        DI = np.repeat(di, w)[None, :]
        DJ = np.tile(di, w)[None, :]
        m = w * w
        s_g = cs[rows_g][:, None]
        ii = (ci[rows_g][:, None] + DI * s_g).ravel()
        jj = (cj[rows_g][:, None] + DJ * s_g).ravel()
        fast_c_parts.append(parent(from_face_ij(
            np.repeat(cf[rows_g], m).astype(np.uint64),
            ii.astype(np.uint64), jj.astype(np.uint64)),
            np.repeat(lv[rows_g], m)))
        fast_r_parts.append(np.repeat(rows_g, m))
    bfs = np.nonzero(~interior)[0]
    seen_r = bfs
    seen_c = centers[bfs]
    front_r, front_c = seen_r, seen_c
    for r in range(int(rg[bfs].max()) if bfs.size else 0):
        act = rg[front_r] > r
        fr, fc = front_r[act], front_c[act]
        if fr.size == 0:
            break
        f, i, j = to_face_ij_orientation(fc)
        s = get_size_ij(lv[fr])
        i &= -s
        j &= -s
        ii = (i[:, None] + _DISK_DI[None, :] * s[:, None]).ravel()
        jj = (j[:, None] + _DISK_DJ[None, :] * s[:, None]).ravel()
        inb = ((ii >= 0) & (ii < MAX_SIZE)
               & (jj >= 0) & (jj < MAX_SIZE))
        cand_c = parent(from_face_ij_same(np.repeat(f, 8), ii, jj, inb),
                        np.repeat(lv[fr], 8))
        cand_r = np.repeat(fr, 8)
        all_r = np.concatenate([seen_r, cand_r])
        all_c = np.concatenate([seen_c, cand_c])
        new_f = np.concatenate([np.zeros(seen_r.size, dtype=bool),
                                np.ones(cand_r.size, dtype=bool)])
        order = np.lexsort((new_f, all_c, all_r))
        all_r, all_c, new_f = all_r[order], all_c[order], new_f[order]
        first = np.empty(all_r.size, dtype=bool)
        first[0] = True
        np.logical_or(all_r[1:] != all_r[:-1], all_c[1:] != all_c[:-1],
                      out=first[1:])
        seen_r, seen_c = all_r[first], all_c[first]
        fresh = first & new_f
        front_r, front_c = all_r[fresh], all_c[fresh]
    if fast_rows.size:
        out_r = np.concatenate(fast_r_parts + [seen_r])
        out_c = np.concatenate(fast_c_parts + [seen_c])
        order = np.lexsort((out_c, out_r))
        return out_r[order], out_c[order]
    return seen_r, seen_c


# ---------------------------------------------------------------------------
# range tiling (s2cell_id.cc:174-195)
# ---------------------------------------------------------------------------

def maximum_tile(cid: int, limit: int) -> int:
    """Largest cell with range_min()==cid.range_min() not extending past
    `limit` (scalar: used inside covering loops, <=60 iterations)."""
    a = np.array([cid], dtype=np.uint64)
    lim = np.array([limit], dtype=np.uint64)
    start = range_min(a)
    if start[0] >= range_min(lim)[0]:
        return int(lim[0])
    if range_max(a)[0] >= lim[0]:
        while range_max(a)[0] >= lim[0]:
            a = child(a, 0)
        return int(a[0])
    while not is_face(a)[0]:
        par = parent1(a)
        if range_min(par)[0] != start[0] or range_max(par)[0] >= lim[0]:
            break
        a = par
    return int(a[0])


def range_to_cells(begin: int, end: int) -> np.ndarray:
    """Tile the leaf range [begin, end) into a minimal normalized sequence
    of cells (S2CellUnion::FromBeginEnd, s2cell_union.cc:92-108)."""
    out = []
    cur = int(np.uint64(begin))
    endi = int(np.uint64(end))
    while cur < endi:
        tile = maximum_tile(cur, endi)
        out.append(tile)
        # id = id.range_max().next(): next() on a leaf advances by 2
        cur = int(next_cell(range_max(np.array([tile], dtype=np.uint64)))[0])
    return np.array(out, dtype=np.uint64)
