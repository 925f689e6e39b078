"""S1Angle: one-dimensional angle with exact degree/radian/E5/E6/E7
conversion semantics (s1angle.h:60-380, s1angle.cc:30-50).

The E5/E6/E7 conversions deliberately use TWO multiplications
(1e-6 * e6 then (pi/180) * degrees) so that conversions between
Degrees, E6 and E7 are exact for integer arguments — the reference
battery (s1angle_test.cc) pins this.  Most of the engine works with
raw radian / chord² doubles; this class is the user-facing angle
algebra mirrored from the reference API surface.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_PI_180 = math.pi / 180.0
_180_PI = 180.0 / math.pi


class S1Angle:
    __slots__ = ("_radians",)

    def __init__(self, radians: float = 0.0):
        self._radians = float(radians)

    # --- constructors -------------------------------------------------
    @staticmethod
    def radians(radians: float) -> "S1Angle":
        return S1Angle(radians)

    @staticmethod
    def degrees(degrees: float) -> "S1Angle":
        return S1Angle(_PI_180 * degrees)

    @staticmethod
    def e5(e5: int) -> "S1Angle":
        return S1Angle.degrees(1e-5 * e5)

    @staticmethod
    def e6(e6: int) -> "S1Angle":
        return S1Angle.degrees(1e-6 * e6)

    @staticmethod
    def e7(e7: int) -> "S1Angle":
        return S1Angle.degrees(1e-7 * e7)

    @staticmethod
    def unsigned_e6(e6: int) -> "S1Angle":
        # uint32 bit pattern reinterpreted as int32 (s1angle.h:367-373)
        e6 &= 0xFFFFFFFF
        return S1Angle.e6(e6 - (1 << 32) if e6 >= (1 << 31) else e6)

    @staticmethod
    def unsigned_e7(e7: int) -> "S1Angle":
        e7 &= 0xFFFFFFFF
        return S1Angle.e7(e7 - (1 << 32) if e7 >= (1 << 31) else e7)

    @staticmethod
    def infinity() -> "S1Angle":
        return S1Angle(math.inf)

    @staticmethod
    def zero() -> "S1Angle":
        return S1Angle(0.0)

    @staticmethod
    def between_points(x, y) -> "S1Angle":
        """S1Angle(S2Point, S2Point) — x.Angle(y) (s1angle.cc:30-32)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        cross = float(np.linalg.norm(np.cross(x, y)))
        return S1Angle(math.atan2(cross, float(np.dot(x, y))))

    @staticmethod
    def between_latlngs(lat1_rad, lng1_rad, lat2_rad,
                        lng2_rad) -> "S1Angle":
        """S1Angle(S2LatLng, S2LatLng) via haversine
        (s1angle.cc:34-36, s2latlng.cc GetDistance)."""
        from .region import latlng_distance
        return S1Angle(latlng_distance(lat1_rad, lng1_rad,
                                       lat2_rad, lng2_rad))

    # --- accessors ----------------------------------------------------
    def rad(self) -> float:
        return self._radians

    def deg(self) -> float:
        return _180_PI * self._radians

    def get_e5(self) -> int:
        return int(np.rint(1e5 * self.deg()))

    def get_e6(self) -> int:
        return int(np.rint(1e6 * self.deg()))

    def get_e7(self) -> int:
        return int(np.rint(1e7 * self.deg()))

    # --- algebra --------------------------------------------------
    def normalized(self) -> "S1Angle":
        """Canonical (-180°, 180°] (s1angle.cc:38-48)."""
        r = math.remainder(self._radians, 2.0 * math.pi)
        return S1Angle(math.pi if r <= -math.pi else r)

    def __abs__(self) -> "S1Angle":
        return S1Angle(abs(self._radians))

    def __neg__(self) -> "S1Angle":
        return S1Angle(-self._radians)

    def __add__(self, o: "S1Angle") -> "S1Angle":
        return S1Angle(self._radians + o._radians)

    def __sub__(self, o: "S1Angle") -> "S1Angle":
        return S1Angle(self._radians - o._radians)

    def __mul__(self, m: float) -> "S1Angle":
        return S1Angle(m * self._radians)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, S1Angle):
            return self._radians / o._radians
        return S1Angle(self._radians / o)

    def __eq__(self, o) -> bool:
        return isinstance(o, S1Angle) and self._radians == o._radians

    def __lt__(self, o: "S1Angle") -> bool:
        return self._radians < o._radians

    def __le__(self, o: "S1Angle") -> bool:
        return self._radians <= o._radians

    def __gt__(self, o: "S1Angle") -> bool:
        return self._radians > o._radians

    def __ge__(self, o: "S1Angle") -> bool:
        return self._radians >= o._radians

    def __hash__(self):
        return hash(self._radians)

    def sin(self) -> float:
        return math.sin(self._radians)

    def cos(self) -> float:
        return math.cos(self._radians)

    def tan(self) -> float:
        return math.tan(self._radians)

    def __str__(self) -> str:
        # degrees, 7 digits after the decimal point (s1angle.h:377-379)
        return f"{self.deg():.7f}"

    # --- wire format (S1Angle::Coder: one little-endian double) -------
    def encode(self) -> bytes:
        return struct.pack("<d", self._radians)

    @staticmethod
    def decode(buf: bytes) -> "S1Angle":
        if len(buf) < 8:
            raise ValueError("S1Angle.decode: truncated buffer")
        return S1Angle(struct.unpack_from("<d", buf)[0])
