"""S2 region types (Cell, Cap, LatLngRect) for the covering engine.

These are scalar (per-region) helpers used by the RegionCoverer and by
query-side covering computation.  The data-plane hot path (per-row point
encode, joins, distance filters) never touches these classes — it runs
through the vectorized kernels in `cellid`/`coords`.  Semantics follow the
reference library:

- S2Cell geometry: s2cell.cc:80-300, s2cell.h:106-192
- S2Cap predicates: s2cap.cc:64-300
- S2LatLngRect / S1Interval: s2latlng_rect.h, s1interval.h
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from . import cellid, coords, metrics

DBL_EPSILON = 2.220446049250313e-16


# ---------------------------------------------------------------------------
# small vector helpers (unit-sphere points as 3-tuples of float)
# ---------------------------------------------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _norm2(a):
    return _dot(a, a)


def _normalize(a):
    n = math.sqrt(_norm2(a))
    return (a[0] / n, a[1] / n, a[2] / n)


def _neg(a):
    return (-a[0], -a[1], -a[2])


def chord2(a, b) -> float:
    """Squared chord length |a-b|^2 — the S1ChordAngle representation."""
    dx, dy, dz = a[0] - b[0], a[1] - b[1], a[2] - b[2]
    return dx * dx + dy * dy + dz * dz


def chord2_to_angle(c2: float) -> float:
    """chord^2 -> angle radians (s1chord_angle: 2*asin(0.5*sqrt(len2)))."""
    return 2.0 * math.asin(0.5 * math.sqrt(min(c2, 4.0)))


def angle_to_chord2(rad: float) -> float:
    """angle radians -> chord^2 (4*sin^2(angle/2)), saturating at 4."""
    if rad < 0:
        return -1.0
    if rad == math.inf:
        return math.inf
    s = math.sin(0.5 * min(rad, math.pi))
    return 4.0 * s * s


# ---------------------------------------------------------------------------
# S1ChordAngle algebra over raw chord^2 doubles (s1chord_angle.h/.cc).
# The engine's convention everywhere is to carry chord angles as their
# squared chord length: -1 = Negative(), 4 = Straight(), inf = Infinity().
# ---------------------------------------------------------------------------

CHORD2_NEGATIVE = -1.0
CHORD2_STRAIGHT = 4.0
CHORD2_INFINITY = math.inf


def chord2_from_length2(length2: float) -> float:
    """FromLength2: clamp to the 180-degree maximum (s1chord_angle.h:
    183-187)."""
    return min(4.0, length2)


def chord2_fast_upper_bound(rad: float) -> float:
    """FastUpperBoundFrom (s1chord_angle.h:178-181, :386): chord <=
    angle, so angle^2 is a cheap conservative chord^2 upper bound."""
    return chord2_from_length2(rad * rad)


def chord2_is_special(c2: float) -> bool:
    return c2 < 0 or c2 == math.inf


def chord2_successor(c2: float) -> float:
    """Smallest representable chord^2 larger than c2
    (s1chord_angle.cc:45-49): Negative -> Zero, Straight -> Infinity."""
    if c2 >= 4.0:
        return CHORD2_INFINITY
    if c2 < 0.0:
        return 0.0
    return math.nextafter(c2, 10.0)


def chord2_predecessor(c2: float) -> float:
    """Largest representable chord^2 smaller than c2
    (s1chord_angle.cc:51-55): Zero -> Negative, Infinity -> Straight."""
    if c2 <= 0.0:
        return CHORD2_NEGATIVE
    if c2 > 4.0:
        return CHORD2_STRAIGHT
    return math.nextafter(c2, -10.0)


def chord2_add(a2: float, b2: float) -> float:
    """Angle addition without leaving chord^2 space
    (s1chord_angle.cc:80-112): c = 2 sin(A+B) via the half-angle
    product form; clamps at 180 degrees.  REQUIRES non-special args."""
    if b2 == 0.0:
        return a2
    if a2 + b2 >= 4.0:
        return CHORD2_STRAIGHT
    x = a2 * (1 - 0.25 * b2)
    y = b2 * (1 - 0.25 * a2)
    return min(4.0, x + y + 2 * math.sqrt(x * y))


def chord2_sub(a2: float, b2: float) -> float:
    """Angle subtraction (s1chord_angle.cc:114-128); two square roots
    to avoid cancellation when a2 ~ b2.  REQUIRES non-special args."""
    if b2 == 0.0:
        return a2
    if a2 <= b2:
        return 0.0
    x = a2 * (1 - 0.25 * b2)
    y = b2 * (1 - 0.25 * a2)
    c = max(0.0, math.sqrt(x) - math.sqrt(y))
    return c * c


def chord2_sin2(c2: float) -> float:
    """sin^2 of the full angle (s1chord_angle.cc:137-145)."""
    return c2 * (1 - 0.25 * c2)


def chord2_sin(c2: float) -> float:
    return math.sqrt(chord2_sin2(c2))


def chord2_cos(c2: float) -> float:
    """cos(2A) = 1 - 2 sin^2(A) (s1chord_angle.cc:151-155)."""
    return 1 - 0.5 * c2


def chord2_tan(c2: float) -> float:
    s, c = chord2_sin(c2), chord2_cos(c2)
    if c == 0.0:
        return math.inf if s > 0 else 0.0
    return s / c


def chord2_plus_error(c2: float, error: float) -> float:
    """PlusError (s1chord_angle.cc:57-62): specials unchanged,
    otherwise clamp into [0, 4]."""
    if chord2_is_special(c2):
        return c2
    return max(0.0, min(4.0, c2 + error))


def chord2_point_constructor_max_error(c2: float) -> float:
    """s1chord_angle.cc:64-71: max error of chord^2 computed from two
    normalized points."""
    return 4.5 * DBL_EPSILON * c2 + 16 * DBL_EPSILON * DBL_EPSILON


def chord2_angle_constructor_max_error(c2: float) -> float:
    """s1chord_angle.cc:73-78."""
    return 1.5 * DBL_EPSILON * c2


def _face_uv_to_xyz(face: int, u: float, v: float):
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def _get_u_norm(face: int, u: float):
    """Normal of the plane through the u=const great circle (s2coords.h:426-435)."""
    return [(u, -1.0, 0.0), (1.0, u, 0.0), (1.0, 0.0, u),
            (-u, 0.0, 1.0), (0.0, -u, 1.0), (0.0, -1.0, -u)][face]


def _get_v_norm(face: int, v: float):
    return [(-v, 0.0, 1.0), (0.0, -v, 1.0), (0.0, -1.0, -v),
            (v, -1.0, 0.0), (1.0, v, 0.0), (1.0, 0.0, v)][face]


# face u/v/w axes (s2coords.cc:68-99)
_FACE_UVW_AXES = (
    (((0, 1, 0), (0, 0, 1), (1, 0, 0))),
    (((-1, 0, 0), (0, 0, 1), (0, 1, 0))),
    (((-1, 0, 0), (0, -1, 0), (0, 0, 1))),
    (((0, 0, -1), (0, -1, 0), (-1, 0, 0))),
    (((0, 0, -1), (1, 0, 0), (0, -1, 0))),
    (((0, 1, 0), (1, 0, 0), (0, 0, -1))),
)


def get_u_axis(face: int):
    return _FACE_UVW_AXES[face][0]


def get_v_axis(face: int):
    return _FACE_UVW_AXES[face][1]


def get_norm(face: int):
    return _FACE_UVW_AXES[face][2]


def _latitude(p) -> float:
    return math.atan2(p[2] + 0.0, math.sqrt(p[0] * p[0] + p[1] * p[1]))


def _longitude(p) -> float:
    return math.atan2(p[1] + 0.0, p[0] + 0.0)


def latlng_to_point(lat_rad: float, lng_rad: float):
    cos_phi = math.cos(lat_rad)
    return (math.cos(lng_rad) * cos_phi, math.sin(lng_rad) * cos_phi,
            math.sin(lat_rad))


def latlng_is_valid(lat_rad: float, lng_rad: float) -> bool:
    """S2LatLng::is_valid (s2latlng.h): |lat| <= pi/2 and |lng| <= pi
    (inf / nan fail both comparisons)."""
    return abs(lat_rad) <= math.pi / 2 and abs(lng_rad) <= math.pi


def latlng_normalized(lat_rad: float, lng_rad: float
                      ) -> tuple[float, float]:
    """S2LatLng::Normalized (s2latlng.cc:56-66): clamp latitude, wrap
    longitude with IEEE remainder; non-finite inputs stay invalid."""
    if not (math.isfinite(lat_rad) and math.isfinite(lng_rad)):
        return (math.pi, math.inf)  # S2LatLng::Invalid()
    return (max(-math.pi / 2, min(math.pi / 2, lat_rad)),
            math.remainder(lng_rad, 2 * math.pi))


def latlng_distance(lat1: float, lng1: float,
                    lat2: float, lng2: float) -> float:
    """S2LatLng::GetDistance (s2latlng.cc): haversine, radians.  Has
    the haversine error profile (up to ~1.5e-6 rad near antipodes);
    use point_angle on xyz for the accurate path."""
    dlat = math.sin(0.5 * (lat2 - lat1))
    dlng = math.sin(0.5 * (lng2 - lng1))
    x = dlat * dlat + dlng * dlng * math.cos(lat1) * math.cos(lat2)
    return 2 * math.asin(math.sqrt(min(1.0, x)))


def point_angle(a, b) -> float:
    """S1Angle(S2Point, S2Point): atan2(|a×b|, a·b) — scale-invariant
    (callers pass the unnormalized bisector-intersection point)."""
    c = _cross(a, b)
    return math.atan2(math.sqrt(_norm2(c)), _dot(a, b))


def _edge_angle_distance(x, a, b) -> float:
    """S2::GetDistance(x, a, b) in radians (s2edge_distances.cc):
    min over the geodesic edge (a, b) of the distance to unit x."""
    from .edges import point_segment_chord2
    c2 = float(point_segment_chord2(
        np.asarray([x], dtype=np.float64),
        np.asarray([a], dtype=np.float64),
        np.asarray([b], dtype=np.float64))[0])
    return chord2_to_angle(c2)


def _seg_max_angle(x, a, b) -> float:
    """S2::UpdateMaxDistance(x, a, b) in radians (s2edge_distances.cc:
    236-250): the endpoint max when it stays within the hemisphere around
    x; past pi/2 the interior of the edge can be further, and the max is
    pi minus the min distance from the antipode of x."""
    m = max(chord2(x, a), chord2(x, b))
    if m <= 2.0:  # S1ChordAngle::Right
        return chord2_to_angle(m)
    return math.pi - _edge_angle_distance(_neg(x), a, b)


# ---------------------------------------------------------------------------
# S2Cell (geometry derived on the fly from the id; s2cell.cc)
# ---------------------------------------------------------------------------

class Cell:
    __slots__ = ("id", "face", "level", "u_lo", "u_hi", "v_lo", "v_hi")

    def __init__(self, cid: int):
        # Normalize to the unsigned id: Spark carries cell ids as int64,
        # so ids on faces 4/5 arrive negative; a negative Python int into
        # np.uint64 arrays is a NumPy deprecation (error on NumPy>=2 strict).
        self.id = int(cid) & 0xFFFF_FFFF_FFFF_FFFF
        f, i, j, lev = cellid.to_face_ij_scalar(self.id)
        self.face = f
        self.level = lev
        # IJLevelToBoundUV (s2cell_id.cc:407-417)
        cell_size = 1 << (cellid.MAX_LEVEL - lev)
        i_lo = i & -cell_size
        j_lo = j & -cell_size
        lim = float(coords.LIMIT_IJ)
        self.u_lo = _st_to_uv(i_lo / lim)
        self.u_hi = _st_to_uv((i_lo + cell_size) / lim)
        self.v_lo = _st_to_uv(j_lo / lim)
        self.v_hi = _st_to_uv((j_lo + cell_size) / lim)

    def get_vertex_raw(self, k: int):
        # CCW order: (lo,lo), (hi,lo), (hi,hi), (lo,hi)
        u = self.u_lo if k in (0, 3) else self.u_hi
        v = self.v_lo if k in (0, 1) else self.v_hi
        return _face_uv_to_xyz(self.face, u, v)

    def get_vertex(self, k: int):
        return _normalize(self.get_vertex_raw(k))

    def get_edge_raw(self, k: int):
        k &= 3
        if k == 0:
            return _get_v_norm(self.face, self.v_lo)       # bottom
        if k == 1:
            return _get_u_norm(self.face, self.u_hi)       # right
        if k == 2:
            return _neg(_get_v_norm(self.face, self.v_hi))  # top
        return _neg(_get_u_norm(self.face, self.u_lo))      # left

    def get_center(self):
        x, y, z = cellid.to_point(np.array([self.id], dtype=np.uint64))
        return (float(x[0]), float(y[0]), float(z[0]))

    def contains_point(self, p) -> bool:
        """Closed-cell containment (s2cell.cc:283-300)."""
        face = self.face
        if face < 3:
            if p[face] <= 0:
                return False
        else:
            if p[face - 3] >= 0:
                return False
        # ValidFaceXYZtoUV
        u, v = _valid_face_xyz_to_uv(face, p)
        # Expand the (u,v) bound by the max error in the projection
        err = DBL_EPSILON
        return (u >= self.u_lo - err and u <= self.u_hi + err and
                v >= self.v_lo - err and v <= self.v_hi + err)

    def get_rect_bound(self) -> "LatLngRect":
        """Conservative lat/lng bound (s2cell.cc:185-270)."""
        if self.level > 0:
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            i = (u < 0) if get_u_axis(self.face)[2] == 0 else (u > 0)
            j = (v < 0) if get_v_axis(self.face)[2] == 0 else (v > 0)
            i, j = int(i), int(j)
            lat = R1Interval.from_point_pair(self._get_latitude(i, j),
                                             self._get_latitude(1 - i, 1 - j))
            lng = S1Interval.from_point_pair(self._get_longitude(i, 1 - j),
                                             self._get_longitude(1 - i, j))
            return (LatLngRect(lat, lng)
                    .expanded(2 * DBL_EPSILON, 2 * DBL_EPSILON)
                    .polar_closure())
        pole_min_lat = math.asin(math.sqrt(1.0 / 3)) - 0.5 * DBL_EPSILON
        pi_4 = math.pi / 4
        if self.face == 0:
            r = LatLngRect(R1Interval(-pi_4, pi_4), S1Interval(-pi_4, pi_4))
        elif self.face == 1:
            r = LatLngRect(R1Interval(-pi_4, pi_4), S1Interval(pi_4, 3 * pi_4))
        elif self.face == 2:
            r = LatLngRect(R1Interval(pole_min_lat, math.pi / 2),
                           S1Interval.full())
        elif self.face == 3:
            r = LatLngRect(R1Interval(-pi_4, pi_4),
                           S1Interval(3 * pi_4, -3 * pi_4))
        elif self.face == 4:
            r = LatLngRect(R1Interval(-pi_4, pi_4),
                           S1Interval(-3 * pi_4, -pi_4))
        else:
            r = LatLngRect(R1Interval(-math.pi / 2, -pole_min_lat),
                           S1Interval.full())
        return r.expanded(DBL_EPSILON, 0.0)

    # -- distance API (s2cell.cc:322-560) ---------------------------------
    # All public methods return RADIANS.  Internally the minimum side works
    # in chord^2 through kernels.edges.point_segment_chord2, which already
    # folds the reference's VertexChordDist / EdgeDistance decision tree
    # (closest point on a geodesic segment is either interior or an
    # endpoint) into one clamped projection.

    def _uvw(self, p):
        """FaceXYZtoUVW: p expressed in this face's (u-axis, v-axis, norm)
        frame (s2coords.h:189)."""
        return (_dot(p, get_u_axis(self.face)),
                _dot(p, get_v_axis(self.face)),
                _dot(p, get_norm(self.face)))

    def _uvw_inside(self, p) -> bool:
        """True iff p lies in the closed wedge intersection of the four
        edge great circles — the reference's dir00..dir11 sign tests
        (s2cell.cc:369-404): dirIJ = p_u - p_w*u_bound etc."""
        u, v, w = self._uvw(p)
        return (u - w * self.u_lo >= 0 and u - w * self.u_hi <= 0 and
                v - w * self.v_lo >= 0 and v - w * self.v_hi <= 0)

    def _vertices(self) -> np.ndarray:
        return np.asarray([self.get_vertex(k) for k in range(4)],
                          dtype=np.float64)

    def _boundary_distance2(self, p) -> float:
        """min chord^2 from p to the four boundary edges."""
        from .edges import point_segment_chord2
        va = self._vertices()
        vb = np.roll(va, -1, axis=0)
        pp = np.broadcast_to(np.asarray(p, dtype=np.float64), (4, 3))
        return float(point_segment_chord2(pp, va, vb).min())

    def get_distance(self, p) -> float:
        """S2Cell::GetDistance(S2Point) in radians (s2cell.cc:421-423):
        zero for points in the (closed) cell, else boundary distance."""
        if self._uvw_inside(p):
            return 0.0
        return chord2_to_angle(self._boundary_distance2(p))

    def get_boundary_distance(self, p) -> float:
        """S2Cell::GetBoundaryDistance (s2cell.cc:425-427): distance to the
        boundary even for interior points."""
        return chord2_to_angle(self._boundary_distance2(p))

    def get_max_distance(self, p) -> float:
        """S2Cell::GetMaxDistance(S2Point) in radians (s2cell.cc:429-445):
        vertex max if within the hemisphere around p, else pi minus the
        minimum distance to the antipode."""
        vmax = max(chord2(p, tuple(v)) for v in self._vertices())
        if vmax <= 2.0:  # S1ChordAngle::Right
            return chord2_to_angle(vmax)
        return math.pi - self.get_distance(_neg(p))

    def get_distance_edge(self, a, b) -> float:
        """S2Cell::GetDistance(a, b) in radians (s2cell.cc:447-489):
        min distance from the cell to the geodesic edge (a, b)."""
        from .edges import point_segment_chord2
        from .predicates import crossing_sign
        if self._uvw_inside(a) or self._uvw_inside(b):
            return 0.0
        va = self._vertices()
        vb = np.roll(va, -1, axis=0)
        aa = np.broadcast_to(np.asarray(a, dtype=np.float64), (4, 3))
        bb = np.broadcast_to(np.asarray(b, dtype=np.float64), (4, 3))
        if (crossing_sign(aa, bb, va, vb) >= 0).any():
            return 0.0
        # endpoint-to-boundary and cell-vertex-to-edge-interior minima
        d2 = min(self._boundary_distance2(a), self._boundary_distance2(b),
                 float(point_segment_chord2(va, aa, bb).min()))
        return chord2_to_angle(d2)

    def get_max_distance_edge(self, a, b) -> float:
        """S2Cell::GetMaxDistance(a, b) in radians (s2cell.cc:491-501)."""
        m = max(self.get_max_distance(a), self.get_max_distance(b))
        if m <= 0.5 * math.pi:
            return m
        return math.pi - self.get_distance_edge(_neg(a), _neg(b))

    def _uv_intersects(self, o: "Cell") -> bool:
        return (self.u_lo <= o.u_hi and o.u_lo <= self.u_hi and
                self.v_lo <= o.v_hi and o.v_lo <= self.v_hi)

    def get_distance_cell(self, o: "Cell") -> float:
        """S2Cell::GetDistance(S2Cell) in radians (s2cell.cc:503-532):
        zero when the (u,v) rects touch on the same face (cells sharing a
        partial edge or corner count as intersecting), else the min over
        all 32 (vertex of one, edge of the other) pairs."""
        from .edges import point_segment_chord2
        if self.face == o.face and self._uv_intersects(o):
            return 0.0
        va, vb = self._vertices(), o._vertices()
        d2 = min(
            float(point_segment_chord2(
                np.repeat(va, 4, axis=0), np.tile(vb, (4, 1)),
                np.tile(np.roll(vb, -1, axis=0), (4, 1))).min()),
            float(point_segment_chord2(
                np.repeat(vb, 4, axis=0), np.tile(va, (4, 1)),
                np.tile(np.roll(va, -1, axis=0), (4, 1))).min()))
        return chord2_to_angle(d2)

    def get_max_distance_cell(self, o: "Cell") -> float:
        """S2Cell::GetMaxDistance(S2Cell) in radians (s2cell.cc:534-560):
        pi when the antipodal image of o (transposed uv on the opposite
        face) intersects this cell, else the max over the 32
        (vertex, edge) pairs."""
        opp_face = o.face - 3 if o.face >= 3 else o.face + 3
        if self.face == opp_face:
            # antipodal uv rect = transpose of o's uv rect
            if (self.u_lo <= o.v_hi and o.v_lo <= self.u_hi and
                    self.v_lo <= o.u_hi and o.u_lo <= self.v_hi):
                return math.pi
        va, vb = self._vertices(), o._vertices()
        m = 0.0
        for verts, edges in ((va, vb), (vb, va)):
            e1 = np.roll(edges, -1, axis=0)
            for x in verts:
                for j in range(4):
                    m = max(m, _seg_max_angle(tuple(x), tuple(edges[j]),
                                              tuple(e1[j])))
        return m

    def _get_latitude(self, i: int, j: int) -> float:
        p = _face_uv_to_xyz(self.face, self.u_lo if i == 0 else self.u_hi,
                            self.v_lo if j == 0 else self.v_hi)
        return _latitude(p)

    def _get_longitude(self, i: int, j: int) -> float:
        p = _face_uv_to_xyz(self.face, self.u_lo if i == 0 else self.u_hi,
                            self.v_lo if j == 0 else self.v_hi)
        return _longitude(p)


def _st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (1.0 / 3.0) * (4 * s * s - 1)
    return (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))


def _valid_face_xyz_to_uv(face: int, p):
    if face == 0:
        return p[1] / p[0], p[2] / p[0]
    if face == 1:
        return -p[0] / p[1], p[2] / p[1]
    if face == 2:
        return -p[0] / p[2], -p[1] / p[2]
    if face == 3:
        return p[2] / p[0], p[1] / p[0]
    if face == 4:
        return p[2] / p[1], -p[0] / p[1]
    return -p[1] / p[2], -p[0] / p[2]


# ---------------------------------------------------------------------------
# intervals (r1interval.h / s1interval.h semantics)
# ---------------------------------------------------------------------------

@dataclass
class R1Interval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "R1Interval":
        return R1Interval(min(p1, p2), max(p1, p2))

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return self.lo <= o.lo and o.hi <= self.hi

    def intersects(self, o: "R1Interval") -> bool:
        if self.lo <= o.lo:
            return o.lo <= self.hi and o.lo <= o.hi
        return self.lo <= o.hi and self.lo <= self.hi

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(self.lo - margin, self.hi + margin)

    def union(self, o: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return R1Interval(o.lo, o.hi)
        if o.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(min(self.lo, o.lo), max(self.hi, o.hi))

    def intersection(self, o: "R1Interval") -> "R1Interval":
        # may be (lo > hi) = empty; callers normalize (r1interval.h)
        return R1Interval(max(self.lo, o.lo), min(self.hi, o.hi))

    def interior_contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return o.lo > self.lo and o.hi < self.hi

    def interior_intersects(self, o: "R1Interval") -> bool:
        return (o.lo < self.hi and self.lo < o.hi
                and self.lo < self.hi and o.lo <= o.hi)

    def add_point(self, p: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(p, p)
        return R1Interval(min(self.lo, p), max(self.hi, p))

    def get_center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def get_length(self) -> float:
        return self.hi - self.lo

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def project(self, p: float) -> float:
        """Closest point of the (non-empty) interval to p
        (r1interval.h:172-175)."""
        return min(max(p, self.lo), self.hi)

    def approx_equals(self, o: "R1Interval",
                      max_error: float = 1e-15) -> bool:
        """r1interval.h:214-219 — the empty interval matches any
        interval of length <= 2*max_error."""
        if self.is_empty():
            return o.get_length() <= 2 * max_error
        if o.is_empty():
            return self.get_length() <= 2 * max_error
        return (abs(o.lo - self.lo) <= max_error
                and abs(o.hi - self.hi) <= max_error)

    def directed_hausdorff(self, o: "R1Interval") -> float:
        """R1Interval::GetDirectedHausdorffDistance (r1interval.h:
        144-148): max over points of self of the distance to o."""
        if self.is_empty():
            return 0.0
        if o.is_empty():
            return math.inf
        return max(0.0, self.hi - o.hi, o.lo - self.lo)


@dataclass
class S1Interval:
    """Longitude interval on the circle [-pi, pi], possibly inverted
    (wrapping through pi).  Semantics per s1interval.h."""
    lo: float
    hi: float

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(math.pi, -math.pi)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-math.pi, math.pi)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        if p1 == -math.pi:
            p1 = math.pi
        if p2 == -math.pi:
            p2 = math.pi
        if S1Interval._positive_distance(p1, p2) <= math.pi:
            return S1Interval(p1, p2)
        return S1Interval(p2, p1)

    @staticmethod
    def from_bounds(lo: float, hi: float) -> "S1Interval":
        """The reference's checked 2-arg constructor
        (s1interval.h:224-228): -pi endpoints canonicalize to +pi
        unless the other endpoint pins the seam (both fixups test the
        ORIGINAL arguments, so (-pi, -pi) becomes the (pi, pi) point
        interval, not Empty)."""
        nlo, nhi = lo, hi
        if lo == -math.pi and hi != math.pi:
            nlo = math.pi
        if hi == -math.pi and lo != math.pi:
            nhi = math.pi
        return S1Interval(nlo, nhi)

    @staticmethod
    def _positive_distance(a: float, b: float) -> float:
        d = b - a
        if d >= 0:
            return d
        return (b + math.pi) - (a - math.pi)

    def is_full(self) -> bool:
        return self.lo == -math.pi and self.hi == math.pi

    def is_empty(self) -> bool:
        return self.lo == math.pi and self.hi == -math.pi

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * math.pi
        return length if length > 0 else -1.0

    def contains(self, p: float) -> bool:
        if p == -math.pi:
            p = math.pi
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        if p == -math.pi:
            p = math.pi
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if o.is_inverted():
                return o.lo >= self.lo and o.hi <= self.hi
            return (o.lo >= self.lo or o.hi <= self.hi) and not self.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return o.lo >= self.lo and o.hi <= self.hi

    def intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty():
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted():
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    def interior_contains_interval(self, o: "S1Interval") -> bool:
        # s1interval.cc:102-110
        if self.is_inverted():
            if not o.is_inverted():
                return o.lo > self.lo or o.hi < self.hi
            return (o.lo > self.lo and o.hi < self.hi) or o.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return (o.lo > self.lo and o.hi < self.hi) or self.is_full()

    def interior_intersects(self, o: "S1Interval") -> bool:
        # s1interval.cc:123-131
        if self.is_empty() or o.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo < self.hi or o.hi > self.lo
        if o.is_inverted():
            return o.lo < self.hi or o.hi > self.lo
        return (o.lo < self.hi and o.hi > self.lo) or self.is_full()

    def expanded(self, margin: float) -> "S1Interval":
        if margin >= 0:
            if self.is_empty():
                return self
            if self.get_length() + 2 * margin + 2 * DBL_EPSILON >= 2 * math.pi:
                return S1Interval.full()
        else:
            if self.is_full():
                return self
            if self.get_length() + 2 * margin - 2 * DBL_EPSILON <= 0:
                return S1Interval.empty()
        # the reference builds the result with the CHECKED constructor
        # (canonicalizes a -pi endpoint to +pi) and then re-fixes lo
        r = S1Interval.from_bounds(
            math.remainder(self.lo - margin, 2 * math.pi),
            math.remainder(self.hi + margin, 2 * math.pi))
        if r.lo <= -math.pi:
            return S1Interval(math.pi, r.hi)
        return r

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -math.pi:
            p = math.pi
        return S1Interval(p, p)

    def is_valid(self) -> bool:
        """s1interval.h is_valid: endpoints in [-pi, pi] and -pi only
        appears as part of the Full() interval."""
        return (abs(self.lo) <= math.pi and abs(self.hi) <= math.pi
                and not (self.lo == -math.pi and self.hi != math.pi)
                and not (self.hi == -math.pi and self.lo != math.pi))

    def fast_contains(self, p: float) -> bool:
        """s1interval.h FastContains — no -pi canonicalization."""
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def add_point(self, p: float) -> "S1Interval":
        """S1Interval::AddPoint (s1interval.cc): grow toward the
        nearer endpoint; adding never makes a non-full interval full."""
        if p == -math.pi:
            p = math.pi
        if self.fast_contains(p):
            return self
        if self.is_empty():
            return S1Interval(p, p)
        dlo = S1Interval._positive_distance(p, self.lo)
        dhi = S1Interval._positive_distance(self.hi, p)
        if dlo < dhi:
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)

    def project(self, p: float) -> float:
        """Closest point of the (non-empty) interval to p
        (s1interval.cc Project)."""
        if p == -math.pi:
            p = math.pi
        if self.fast_contains(p):
            return p
        dlo = S1Interval._positive_distance(p, self.lo)
        dhi = S1Interval._positive_distance(self.hi, p)
        return self.lo if dlo < dhi else self.hi

    def approx_equals(self, o: "S1Interval",
                      max_error: float = 1e-15) -> bool:
        """s1interval.cc ApproxEquals: empty matches any interval of
        length <= 2e, full matches any of length >= 2(pi - e); the
        length test rejects endpoint swaps that invert the interval."""
        if self.is_empty():
            return o.get_length() <= 2 * max_error
        if o.is_empty():
            return self.get_length() <= 2 * max_error
        if self.is_full():
            return o.get_length() >= 2 * (math.pi - max_error)
        if o.is_full():
            return self.get_length() >= 2 * (math.pi - max_error)
        return (abs(math.remainder(o.lo - self.lo, 2 * math.pi))
                <= max_error
                and abs(math.remainder(o.hi - self.hi, 2 * math.pi))
                <= max_error
                and abs(self.get_length() - o.get_length())
                <= 2 * max_error)

    def complement(self) -> "S1Interval":
        if self.lo == self.hi:
            return S1Interval.full()  # singleton -> full
        return S1Interval(self.hi, self.lo)

    def get_center(self) -> float:
        """S1Interval::GetCenter (s1interval.cc:44-52), range
        (-pi, pi]."""
        center = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return center
        return center + math.pi if center <= 0 else center - math.pi

    def get_complement_center(self) -> float:
        """S1Interval::GetComplementCenter (s1interval.cc:54-60) —
        singletons have a full complement, whose 'center' is the
        antipodal point."""
        if self.lo != self.hi:
            return self.complement().get_center()
        return self.hi + math.pi if self.hi <= 0 else self.hi - math.pi

    def directed_hausdorff(self, o: "S1Interval") -> float:
        """S1Interval::GetDirectedHausdorffDistance (s1interval.cc:
        145-161): max over points of self of the distance to o,
        realized either at o's complement center or at a matching
        lo/hi endpoint pair."""
        if o.contains_interval(self):
            return 0.0  # includes the empty-self case
        if o.is_empty():
            return math.pi
        occ = o.get_complement_center()
        if self.contains(occ):
            return S1Interval._positive_distance(o.hi, occ)
        hi_hi = (S1Interval._positive_distance(o.hi, self.hi)
                 if S1Interval(o.hi, occ).contains(self.hi) else 0.0)
        lo_lo = (S1Interval._positive_distance(self.lo, o.lo)
                 if S1Interval(occ, o.lo).contains(self.lo) else 0.0)
        return max(hi_hi, lo_lo)

    def intersection(self, o: "S1Interval") -> "S1Interval":
        """s1interval.h Intersection semantics (two-piece overlaps
        return the shorter input)."""
        if o.is_empty():
            return S1Interval.empty()
        if self.contains(o.lo):
            if self.contains(o.hi):
                if o.get_length() < self.get_length():
                    return o
                return self
            return S1Interval(o.lo, self.hi)
        if self.contains(o.hi):
            return S1Interval(self.lo, o.hi)
        if o.contains(self.lo):
            return self
        return S1Interval.empty()

    def union(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return self
        if self.is_empty():
            return o
        if self.contains_interval(o):
            return self
        if o.contains_interval(self):
            return o
        # general case: extend toward the closer side
        if self.intersects(o):
            if o.contains(self.lo) and o.contains(self.hi):
                return S1Interval.full()
            lo = o.lo if o.contains(self.lo) else self.lo
            hi = o.hi if o.contains(self.hi) else self.hi
            return S1Interval(lo, hi)
        dlo = S1Interval._positive_distance(o.hi, self.lo)
        dhi = S1Interval._positive_distance(self.hi, o.lo)
        if dlo < dhi:
            return S1Interval(o.lo, self.hi)
        return S1Interval(self.lo, o.hi)


# ---------------------------------------------------------------------------
# S2LatLngRect region
# ---------------------------------------------------------------------------

class LatLngRect:
    __slots__ = ("lat", "lng")

    def __init__(self, lat: R1Interval, lng: S1Interval):
        self.lat = lat
        self.lng = lng

    @staticmethod
    def from_degrees(lat_lo: float, lng_lo: float, lat_hi: float,
                     lng_hi: float) -> "LatLngRect":
        return LatLngRect(
            R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
            S1Interval.from_bounds(math.radians(lng_lo),
                                   math.radians(lng_hi)))

    @staticmethod
    def empty() -> "LatLngRect":
        return LatLngRect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def full() -> "LatLngRect":
        return LatLngRect(R1Interval(-math.pi / 2, math.pi / 2),
                          S1Interval.full())

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def contains_latlng(self, lat_rad: float, lng_rad: float) -> bool:
        return self.lat.contains(lat_rad) and self.lng.contains(lng_rad)

    def contains_point(self, p) -> bool:
        return self.contains_latlng(_latitude(p), _longitude(p))

    def interior_contains_latlng(self, lat_rad: float,
                                 lng_rad: float) -> bool:
        """S2LatLngRect::InteriorContains(S2LatLng)
        (s2latlng_rect.cc:167-173)."""
        return (self.lat.lo < lat_rad < self.lat.hi
                and self.lng.interior_contains(lng_rad))

    def contains_rect(self, o: "LatLngRect") -> bool:
        return (self.lat.contains_interval(o.lat)
                and self.lng.contains_interval(o.lng))

    def intersects_rect(self, o: "LatLngRect") -> bool:
        return self.lat.intersects(o.lat) and self.lng.intersects(o.lng)

    def interior_contains_rect(self, o: "LatLngRect") -> bool:
        """S2LatLngRect::InteriorContains (s2latlng_rect.cc:179-182)."""
        return (self.lat.interior_contains_interval(o.lat)
                and self.lng.interior_contains_interval(o.lng))

    def interior_intersects_rect(self, o: "LatLngRect") -> bool:
        """S2LatLngRect::InteriorIntersects (s2latlng_rect.cc:188-191)."""
        return (self.lat.interior_intersects(o.lat)
                and self.lng.interior_intersects(o.lng))

    @staticmethod
    def from_point_pair(lat1: float, lng1: float,
                        lat2: float, lng2: float) -> "LatLngRect":
        """S2LatLngRect::FromPointPair (radians): the minimal rect
        containing both points (shorter longitude arc)."""
        return LatLngRect(R1Interval.from_point_pair(lat1, lat2),
                          S1Interval.from_point_pair(lng1, lng2))

    @staticmethod
    def from_point(lat: float, lng: float) -> "LatLngRect":
        return LatLngRect(R1Interval(lat, lat), S1Interval.from_point(lng))

    def get_distance_latlng(self, lat_rad: float, lng_rad: float
                            ) -> float:
        """S2LatLngRect::GetDistance(S2LatLng) in radians
        (s2latlng_rect.cc:561-586): inside the longitude span the
        distance is purely latitudinal; otherwise it is the distance
        to the nearer longitudinal edge (picked by which half of the
        complement the point falls in)."""
        a = self
        if a.lng.contains(lng_rad):
            return max(0.0, lat_rad - a.lat.hi, a.lat.lo - lat_rad)
        interval = S1Interval(a.lng.hi, a.lng.get_complement_center())
        a_lng = a.lng.hi if interval.contains(lng_rad) else a.lng.lo
        lo = latlng_to_point(a.lat.lo, a_lng)
        hi = latlng_to_point(a.lat.hi, a_lng)
        return _edge_angle_distance(latlng_to_point(lat_rad, lng_rad),
                                    lo, hi)

    def get_distance_rect(self, o: "LatLngRect") -> float:
        """S2LatLngRect::GetDistance(S2LatLngRect) in radians
        (s2latlng_rect.cc:506-559): 0 on intersection; a pure
        latitude gap when the longitude spans overlap; otherwise the
        min of the four point-to-longitudinal-edge distances between
        the nearest pair of longitudinal edges."""
        a, b = self, o
        if a.lng.intersects(b.lng):
            if a.lat.intersects(b.lat):
                return 0.0
            if a.lat.lo > b.lat.hi:
                lo, hi = b.lat.hi, a.lat.lo
            else:
                lo, hi = a.lat.hi, b.lat.lo
            return hi - lo
        lo_hi = S1Interval.from_point_pair(a.lng.lo, b.lng.hi)
        hi_lo = S1Interval.from_point_pair(a.lng.hi, b.lng.lo)
        if lo_hi.get_length() < hi_lo.get_length():
            a_lng, b_lng = a.lng.lo, b.lng.hi
        else:
            a_lng, b_lng = a.lng.hi, b.lng.lo
        a_lo = latlng_to_point(a.lat.lo, a_lng)
        a_hi = latlng_to_point(a.lat.hi, a_lng)
        b_lo = latlng_to_point(b.lat.lo, b_lng)
        b_hi = latlng_to_point(b.lat.hi, b_lng)
        return min(_edge_angle_distance(a_lo, b_lo, b_hi),
                   _edge_angle_distance(a_hi, b_lo, b_hi),
                   _edge_angle_distance(b_lo, a_lo, a_hi),
                   _edge_angle_distance(b_hi, a_lo, a_hi))

    def get_directed_hausdorff(self, o: "LatLngRect") -> float:
        """S2LatLngRect::GetDirectedHausdorffDistance in radians
        (s2latlng_rect.cc:588-605): reduce to the longitudinal-edge
        problem via the S1 directed Hausdorff of the lng spans."""
        if self.is_empty():
            return 0.0
        if o.is_empty():
            return math.pi
        lng_distance = self.lng.directed_hausdorff(o.lng)
        return _hausdorff_lng_edge(lng_distance, self.lat, o.lat)

    def get_hausdorff(self, o: "LatLngRect") -> float:
        return max(self.get_directed_hausdorff(o),
                   o.get_directed_hausdorff(self))

    def union(self, o: "LatLngRect") -> "LatLngRect":
        """S2LatLngRect::Union (s2latlng_rect.cc:160-163): smallest
        rect containing both (lng union may be over-wide, as the
        reference's S1Interval union is minimal but a rect union of
        disjoint lng spans keeps the shorter bridge)."""
        return LatLngRect(self.lat.union(o.lat), self.lng.union(o.lng))

    def intersection(self, o: "LatLngRect") -> "LatLngRect":
        """S2LatLngRect::Intersection (s2latlng_rect.cc:165-175):
        componentwise interval intersection, normalized to the
        canonical empty rect when either component is empty (the
        result may be over-conservative for wrapped lng spans, same
        as the reference)."""
        lat = self.lat.intersection(o.lat)
        lng = self.lng.intersection(o.lng)
        if lat.is_empty() or lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat, lng)

    def add_point(self, p) -> "LatLngRect":
        """S2LatLngRect::AddPoint (s2latlng_rect.cc:118-126)."""
        lat_rad, lng_rad = _latitude(p), _longitude(p)
        return LatLngRect(self.lat.add_point(lat_rad),
                          self.lng.union(S1Interval.from_point(lng_rad)))

    def approx_equals(self, o: "LatLngRect",
                      max_error_rad: float = 1e-15) -> bool:
        """S2LatLngRect::ApproxEquals (s2latlng_rect.cc)."""
        def r1_close(a: R1Interval, b: R1Interval) -> bool:
            if a.is_empty():
                return b.is_empty() or (b.hi - b.lo) <= 2 * max_error_rad
            if b.is_empty():
                return (a.hi - a.lo) <= 2 * max_error_rad
            return (abs(a.lo - b.lo) <= max_error_rad
                    and abs(a.hi - b.hi) <= max_error_rad)

        def s1_close(a: S1Interval, b: S1Interval) -> bool:
            if a.is_empty():
                return b.is_empty() or b.get_length() <= 2 * max_error_rad
            if b.is_empty():
                return a.get_length() <= 2 * max_error_rad
            return (abs(math.remainder(a.lo - b.lo, 2 * math.pi))
                    <= max_error_rad
                    and abs(math.remainder(a.hi - b.hi, 2 * math.pi))
                    <= max_error_rad)

        return r1_close(self.lat, o.lat) and s1_close(self.lng, o.lng)

    def expanded(self, lat_margin: float, lng_margin: float) -> "LatLngRect":
        lat = self.lat.expanded(lat_margin)
        lng = self.lng.expanded(lng_margin)
        if lat.is_empty() or lng.is_empty():
            return LatLngRect.empty()
        lat = R1Interval(max(lat.lo, -math.pi / 2), min(lat.hi, math.pi / 2))
        return LatLngRect(lat, lng)

    def polar_closure(self) -> "LatLngRect":
        if self.lat.lo == -math.pi / 2 or self.lat.hi == math.pi / 2:
            return LatLngRect(self.lat, S1Interval.full())
        return self

    # --- S2Region interface for the coverer ---
    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.intersects_rect(cell.get_rect_bound())

    def get_cap_bound(self) -> "Cap":
        """Conservative bounding cap (s2latlng_rect.cc GetCapBound)."""
        if self.is_empty():
            return Cap.empty()
        # pole-centered cap
        if self.lat.lo + self.lat.hi < 0:
            pole_z, pole_angle = -1.0, math.pi / 2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, math.pi / 2 - self.lat.lo
        pole_cap = Cap.from_point_angle((0.0, 0.0, pole_z), pole_angle)
        if self.lng.get_length() < 2 * math.pi:
            mid_lng = self.lng.lo + 0.5 * S1Interval._positive_distance(
                self.lng.lo, self.lng.hi)
            mid_lat = 0.5 * (self.lat.lo + self.lat.hi)
            mid_cap = Cap.from_point_angle(
                latlng_to_point(mid_lat, math.remainder(mid_lng, 2 * math.pi)),
                0.0)
            for k in range(4):
                lat = self.lat.lo if k in (0, 1) else self.lat.hi
                lng = self.lng.lo if k in (0, 3) else self.lng.hi
                mid_cap = mid_cap.add_point(latlng_to_point(lat, lng))
            if mid_cap.radius2 < pole_cap.radius2:
                return mid_cap
        return pole_cap

    def get_cell_union_bound(self) -> list:
        return self.get_cap_bound().get_cell_union_bound()


def _bisector_intersection(lat: R1Interval, lng: float):
    """Intersection of longitude 0 with the perpendicular bisector of
    the longitudinal edge at `lng` spanning `lat`
    (s2latlng_rect.cc GetBisectorIntersection).  Unnormalized — the
    consumers (latitude / point_angle) are scale-invariant."""
    from .edges import _robust_cross
    lng = abs(lng)
    lat_center = lat.get_center()
    if lat_center >= 0:
        ortho_bisector = latlng_to_point(lat_center - math.pi / 2, lng)
    else:
        ortho_bisector = latlng_to_point(-lat_center - math.pi / 2,
                                         lng - math.pi)
    ortho_lng = np.array([0.0, -1.0, 0.0])
    return _robust_cross(ortho_lng,
                         np.asarray(ortho_bisector, dtype=np.float64))


def _interior_max_distance(a_lat: R1Interval, b) -> float:
    """Max distance from point b to the longitude-0 segment spanning
    a_lat, IF realized in a_lat's interior, else -1
    (s2latlng_rect.cc GetInteriorMaxDistance).  The farthest point is
    the antipode of b's projection onto the y=0 plane."""
    if a_lat.is_empty() or b[0] >= 0:
        return -1.0
    ip = _normalize((-b[0], 0.0, -b[2]))
    if a_lat.interior_contains(_latitude(ip)):
        return point_angle(b, ip)
    return -1.0


def _hausdorff_lng_edge(lng_diff: float, a: R1Interval, b: R1Interval
                        ) -> float:
    """Directed Hausdorff distance from the longitudinal edge
    spanning latitudes `a` (at longitude 0 wlog) to the edge spanning
    `b` at longitude `lng_diff` (s2latlng_rect.cc:607-680).  Case
    analysis over b's three-edge Voronoi diagram on a's hemisphere:
    the max is realized at a's endpoints, at the equator crossing
    (lng_diff <= pi/2), or at the bisector crossing / the two
    interior-farthest points (lng_diff > pi/2)."""
    if lng_diff == 0:
        return a.directed_hausdorff(b)
    b_lng = lng_diff
    b_lo = latlng_to_point(b.lo, b_lng)
    b_hi = latlng_to_point(b.hi, b_lng)
    a_lo = latlng_to_point(a.lo, 0.0)
    a_hi = latlng_to_point(a.hi, 0.0)
    max_distance = max(_edge_angle_distance(a_lo, b_lo, b_hi),
                       _edge_angle_distance(a_hi, b_lo, b_hi))
    if lng_diff <= math.pi / 2:
        if a.contains(0.0) and b.contains(0.0):
            max_distance = max(max_distance, lng_diff)
    else:
        p = _bisector_intersection(b, b_lng)
        p_lat = _latitude(p)
        if a.contains(p_lat):
            max_distance = max(max_distance, point_angle(p, b_lo))
        if p_lat > a.lo:
            max_distance = max(max_distance, _interior_max_distance(
                R1Interval(a.lo, min(p_lat, a.hi)), b_lo))
        if p_lat < a.hi:
            max_distance = max(max_distance, _interior_max_distance(
                R1Interval(max(p_lat, a.lo), a.hi), b_hi))
    return max_distance


# ---------------------------------------------------------------------------
# S2Cap region (center point + chord^2 radius; s2cap.cc)
# ---------------------------------------------------------------------------

class Cap:
    __slots__ = ("center", "radius2")

    def __init__(self, center, radius2: float):
        self.center = center
        self.radius2 = radius2  # squared chord length, in [-1(empty), 4(full)]

    @staticmethod
    def empty() -> "Cap":
        return Cap((1.0, 0.0, 0.0), -1.0)

    @staticmethod
    def full() -> "Cap":
        return Cap((1.0, 0.0, 0.0), 4.0)

    @staticmethod
    def from_point(p) -> "Cap":
        return Cap(p, 0.0)

    @staticmethod
    def from_point_angle(p, angle_rad: float) -> "Cap":
        return Cap(p, angle_to_chord2(angle_rad))

    @staticmethod
    def from_latlng_radius(lat_deg: float, lng_deg: float,
                           radius_rad: float) -> "Cap":
        p = latlng_to_point(math.radians(lat_deg), math.radians(lng_deg))
        return Cap(p, angle_to_chord2(radius_rad))

    def is_empty(self) -> bool:
        return self.radius2 < 0

    def is_full(self) -> bool:
        return self.radius2 >= 4.0

    def get_radius_rad(self) -> float:
        return -1.0 if self.is_empty() else chord2_to_angle(self.radius2)

    def get_area(self) -> float:
        """S2Cap::GetArea = 2*pi*height, height = chord2/2
        (s2cap.cc:56-58)."""
        return 2.0 * math.pi * max(0.0, 0.5 * self.radius2)

    def complement(self) -> "Cap":
        if self.is_full():
            return Cap.empty()
        if self.is_empty():
            return Cap.full()
        return Cap(_neg(self.center), 4.0 - self.radius2)

    def add_point(self, p) -> "Cap":
        if self.is_empty():
            return Cap(p, 0.0)
        return Cap(self.center, max(self.radius2, chord2(self.center, p)))

    def expanded(self, extra_rad: float) -> "Cap":
        if self.is_empty():
            return Cap.empty()
        return Cap(self.center,
                   angle_to_chord2(self.get_radius_rad() + extra_rad))

    def contains_point(self, p) -> bool:
        return chord2(self.center, p) <= self.radius2

    def _dist_rad(self, o: "Cap") -> float:
        c = _cross(self.center, o.center)
        return math.atan2(math.sqrt(_norm2(c)),
                          _dot(self.center, o.center))

    def contains_cap(self, o: "Cap") -> bool:
        """S2Cap::Contains(S2Cap) (s2cap.cc:72-75): radius >=
        dist(centers) + other radius, with full/empty shortcuts."""
        if self.is_full() or o.is_empty():
            return True
        if self.is_empty():
            return False
        return (self.get_radius_rad()
                >= self._dist_rad(o) + o.get_radius_rad())

    def intersects_cap(self, o: "Cap") -> bool:
        """S2Cap::Intersects(S2Cap) (s2cap.cc:77-80)."""
        if self.is_empty() or o.is_empty():
            return False
        return (self.get_radius_rad() + o.get_radius_rad()
                >= self._dist_rad(o))

    def interior_intersects_cap(self, o: "Cap") -> bool:
        """S2Cap::InteriorIntersects (s2cap.cc:82-86): this cap needs
        a non-empty interior (radius > 0)."""
        if self.radius2 <= 0 or o.is_empty():
            return False
        return (self.get_radius_rad() + o.get_radius_rad()
                > self._dist_rad(o))

    def add_cap(self, o: "Cap") -> "Cap":
        """S2Cap::AddCap (s2cap.cc:102-112): grow this cap's radius
        (center unchanged) until it contains the other."""
        if self.is_empty():
            return Cap(o.center, o.radius2)
        if o.is_empty():
            return Cap(self.center, self.radius2)
        dist = self._dist_rad(o) + o.get_radius_rad()
        return Cap(self.center,
                   max(self.radius2, angle_to_chord2(dist)))

    def union(self, o: "Cap") -> "Cap":
        """S2Cap::Union (s2cap.cc:120-140): the smallest cap
        containing both — midpoint construction along the great
        circle through the centers when neither engulfs the other."""
        if self.get_radius_rad() < o.get_radius_rad():
            return o.union(self)
        if self.is_full() or o.is_empty():
            return Cap(self.center, self.radius2)
        r_a, r_b = self.get_radius_rad(), o.get_radius_rad()
        dist = self._dist_rad(o)
        if r_a >= dist + r_b:
            return Cap(self.center, self.radius2)
        result_radius = 0.5 * (dist + r_a + r_b)
        # GetPointOnLine(center, o.center, 0.5*(dist - r_a + r_b))
        t = 0.5 * (dist - r_a + r_b)
        a = np.asarray(self.center, dtype=np.float64)
        b = np.asarray(o.center, dtype=np.float64)
        e2 = b - _dot(b, a) * a
        nn = math.sqrt(_norm2(e2))
        if nn == 0.0:
            c = a
        else:
            c = a * math.cos(t) + (e2 / nn) * math.sin(t)
            c = c / math.sqrt(_norm2(c))
        return Cap(tuple(float(x) for x in c),
                   angle_to_chord2(result_radius))

    def approx_equals(self, o: "Cap", max_error_rad: float = 1e-14
                      ) -> bool:
        """S2Cap::ApproxEquals (s2cap.cc:206-216)."""
        r2 = max_error_rad * max_error_rad
        if (chord2(self.center, o.center) <= r2
                and abs(self.get_radius_rad() - o.get_radius_rad())
                <= max_error_rad):
            return True
        if self.is_empty():
            return o.get_radius_rad() <= max_error_rad
        if o.is_empty():
            return self.get_radius_rad() <= max_error_rad
        if self.is_full():
            return o.get_radius_rad() >= math.pi - max_error_rad
        if o.is_full():
            return self.get_radius_rad() >= math.pi - max_error_rad
        return False

    def get_rect_bound(self) -> "LatLngRect":
        """S2Cap::GetRectBound (s2cap.cc:150-196): pole checks + the
        law-of-sines longitude extent."""
        if self.is_empty():
            return LatLngRect.empty()
        center_lat = _latitude(self.center)
        center_lng = _longitude(self.center)
        cap_angle = self.get_radius_rad()
        all_longitudes = False
        lat_lo = center_lat - cap_angle
        if lat_lo <= -math.pi / 2:
            lat_lo = -math.pi / 2
            all_longitudes = True
        lat_hi = center_lat + cap_angle
        if lat_hi >= math.pi / 2:
            lat_hi = math.pi / 2
            all_longitudes = True
        if all_longitudes:
            return LatLngRect(R1Interval(lat_lo, lat_hi),
                              S1Interval.full())
        sin_a = math.sin(cap_angle)
        sin_c = math.cos(center_lat)
        if sin_a > sin_c:
            return LatLngRect(R1Interval(lat_lo, lat_hi),
                              S1Interval.full())
        angle_a = math.asin(sin_a / sin_c)
        lo = math.remainder(center_lng - angle_a, 2 * math.pi)
        hi = math.remainder(center_lng + angle_a, 2 * math.pi)
        return LatLngRect(R1Interval(lat_lo, lat_hi),
                          S1Interval(lo, hi))

    def _sin2(self) -> float:
        # sin^2(radius) = r2 * (1 - r2/4) for chord^2 r2
        return self.radius2 * (1.0 - 0.25 * self.radius2)

    def _intersects(self, cell: Cell, vertices) -> bool:
        """Cap intersects cell excluding its vertices (s2cap.cc:224-268)."""
        if self.radius2 >= 2.0:  # >= 90 degrees: chord^2 of Right() is 2
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self._sin2()
        for k in range(4):
            edge = cell.get_edge_raw(k)
            dot = _dot(self.center, edge)
            if dot > 0:
                continue
            if dot * dot > sin2_angle * _norm2(edge):
                return False
            direction = _cross(edge, self.center)
            if (_dot(direction, vertices[k]) < 0
                    and _dot(direction, vertices[(k + 1) & 3]) > 0):
                return True
        return False

    # --- S2Region interface ---
    def contains_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects(cell, vertices)

    def get_cap_bound(self) -> "Cap":
        return self

    def get_cell_union_bound(self) -> list:
        """<=6-cell bound (s2cap.cc:198-222); returns python ints."""
        lev = metrics.MIN_WIDTH.get_level_for_min_value(
            self.get_radius_rad()) - 1
        if lev < 0:
            return [int(cellid.from_face(np.array([f]))[0]) for f in range(6)]
        center_id = cellid.from_xyz(np.array([self.center[0]]),
                                    np.array([self.center[1]]),
                                    np.array([self.center[2]]))
        return [int(v) for v in
                cellid.append_vertex_neighbors(center_id, lev)[0]]


class PointRegion:
    """S2PointRegion (s2point_region.h:37-70): a region containing a
    single unit point — useful for completeness wherever the region
    protocol (coverer, region algebra) expects an object.  Contains
    no cell, may-intersects exactly the cells whose closed boundary
    holds the point."""

    __slots__ = ("point",)

    def __init__(self, point):
        self.point = (float(point[0]), float(point[1]), float(point[2]))

    def get_cap_bound(self) -> "Cap":
        return Cap.from_point(self.point)

    def get_rect_bound(self) -> "LatLngRect":
        return LatLngRect.from_point(_latitude(self.point),
                                     _longitude(self.point))

    def get_cell_union_bound(self) -> list:
        x, y, z = self.point
        leaf = cellid.from_xyz(np.array([x]), np.array([y]), np.array([z]))
        return [int(leaf[0])]

    def contains_cell(self, cell: "Cell") -> bool:
        return False

    def may_intersect_cell(self, cell: "Cell") -> bool:
        return cell.contains_point(self.point)

    def contains_point(self, p) -> bool:
        return (self.point[0] == p[0] and self.point[1] == p[1]
                and self.point[2] == p[2])
