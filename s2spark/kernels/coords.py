"""S2 coordinate-system transforms as vectorized NumPy kernels.

Implements the (lat,lng) <-> (x,y,z) <-> (face,u,v) <-> (face,s,t) <->
(face,i,j) pipeline with the QUADRATIC projection, matching the semantics
of the reference library (see /root/reference/src/s2/s2coords.h:280-430
and s2coords.cc:100-147).  All functions operate on NumPy arrays and are
branch-free along the batch axis (branches become masked selects), so they
run at memory bandwidth inside Arrow-batched pandas UDFs.

Bit-exactness notes: every oracle-facing path here uses only +,-,*,/ and
sqrt, all of which are correctly rounded under IEEE-754, so results are
reproducible bit-for-bit across NumPy / DuckDB / the C++ reference
(compiled without fp-contraction).  Trig (sin/cos/atan2) appears only in
lat/lng conversion, which is used for display and round-trip tests, never
in a value-hash-compared oracle path.
"""

from __future__ import annotations

import numpy as np

# --- integer grid constants (s2coords.h:60-96) ---
MAX_CELL_LEVEL = 30
LIMIT_IJ = 1 << MAX_CELL_LEVEL          # 2^30
MAX_SI_TI = 1 << (MAX_CELL_LEVEL + 1)   # 2^31


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Quadratic projection s->u (s2coords.h:322-326)."""
    s = np.asarray(s, dtype=np.float64)
    hi = (1.0 / 3.0) * (4.0 * s * s - 1.0)
    lo = (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    return np.where(s >= 0.5, hi, lo)


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection u->s (s2coords.h:327-330)."""
    u = np.asarray(u, dtype=np.float64)
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0.0, pos, neg)


def ij_to_st_min(i: np.ndarray) -> np.ndarray:
    """Minimum s of leaf column i (s2coords.h:338-341)."""
    return (1.0 / LIMIT_IJ) * np.asarray(i, dtype=np.float64)


def st_to_ij(s: np.ndarray) -> np.ndarray:
    """s -> leaf-grid index, truncating like static_cast<int>, then clamped
    (s2coords.h:343-350)."""
    v = (LIMIT_IJ * np.asarray(s, dtype=np.float64)).astype(np.int64)
    return np.clip(v, 0, LIMIT_IJ - 1)


def si_ti_to_st(si: np.ndarray) -> np.ndarray:
    """si/ti (2^31 grid) -> s/t (s2coords.h:352-355)."""
    return (1.0 / MAX_SI_TI) * np.asarray(si, dtype=np.float64)


def st_to_si_ti(s: np.ndarray) -> np.ndarray:
    """s -> nearest si (round-half-even, like MathUtil::Round<int64>)."""
    return np.rint(np.asarray(s, dtype=np.float64) * MAX_SI_TI).astype(np.int64)


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """(face,u,v) -> unnormalized (x,y,z); sign-permutation only
    (s2coords.h:363-371).  Returns three float64 arrays."""
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    # per-face component tables: xyz[face] as functions of (1, u, v)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [one, -u, -u, -one, v], default=v)
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [u, one, -v, -v, -one], default=u)
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [v, v, one, -u, -u], default=-one)
    return x, y, z


def get_face(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Largest-|component| axis, +3 if negative (s2coords.h:394-398;
    LargestAbsComponent tie-breaking per util/math/vector.h:509-514)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # temp[0] > temp[1] ? (temp[0] > temp[2] ? 0 : 2) : (temp[1] > temp[2] ? 1 : 2)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    return np.where(comp < 0.0, axis + 3, axis).astype(np.int64)


def valid_face_xyz_to_uv(face: np.ndarray, x, y, z):
    """(x,y,z) known to be on `face` -> (u,v) (s2coords.h:377-388)."""
    face = np.asarray(face, dtype=np.int64)
    # np.select evaluates every branch; off-face divisions may hit 0/0
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)
    return u, v


def xyz_to_face_uv(x, y, z):
    """(x,y,z) -> (face,u,v) (s2coords.h:401-404)."""
    face = get_face(x, y, z)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    return face, u, v


def latlng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    """(lat,lng) degrees -> unit (x,y,z) (s2latlng.cc:68-76)."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_phi = np.cos(phi)
    return np.cos(theta) * cos_phi, np.sin(theta) * cos_phi, np.sin(phi)


def xyz_to_latlng(x, y, z):
    """(x,y,z) (any length) -> (lat,lng) degrees (s2latlng.h:235-250)."""
    lat = np.arctan2(z + 0.0, np.sqrt(x * x + y * y))
    lng = np.arctan2(y + 0.0, x + 0.0)
    return np.degrees(lat), np.degrees(lng)


def normalize_xyz(x, y, z):
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


# ---------------------------------------------------------------------------
# Alternative ST<->UV projections (s2coords.h:285-320).  The engine is
# compiled, like the reference default, with the QUADRATIC projection
# (st_to_uv/uv_to_st above — every cell id in storage assumes it);
# the LINEAR and TAN variants exist for parity and for converting data
# indexed by builds of the reference that chose them.
# ---------------------------------------------------------------------------

def st_to_uv_linear(s: np.ndarray) -> np.ndarray:
    """S2_LINEAR_PROJECTION s->u (s2coords.h:291-299)."""
    return 2.0 * np.asarray(s, dtype=np.float64) - 1.0


def uv_to_st_linear(u: np.ndarray) -> np.ndarray:
    return 0.5 * (np.asarray(u, dtype=np.float64) + 1.0)


def st_to_uv_tan(s: np.ndarray) -> np.ndarray:
    """S2_TAN_PROJECTION s->u (s2coords.h:301-311): tan(pi/2·s −
    pi/4), nudged by one 2^-53 ulp-scale term because tan(pi/4)
    rounds slightly below 1.0 (the reference's correction)."""
    s = np.asarray(s, dtype=np.float64)
    t = np.tan((np.pi / 2.0) * s - (np.pi / 4.0))
    return t + (1.0 / (1 << 53)) * t


def uv_to_st_tan(u: np.ndarray) -> np.ndarray:
    a = np.arctan(np.asarray(u, dtype=np.float64))
    return (2.0 / np.pi) * (a + (np.pi / 4.0))
