"""Koch-snowflake fractal loop generator — the S2Fractal analogue
(reference contract: s2fractal.h:16-80).  The reference uses it to
stress-test geometric algorithms with skinny, self-near boundaries
that smooth synthetic caps never produce; this module provides the
same capability deterministically (seeded by the repo's mix hash, no
RNG state) so fractal fixtures are reproducible across engines.

Construction (same shape as the reference describes): an equilateral
triangle in the tangent plane at `center`, each edge recursively
subdivided into four equal segments with the middle two forming a
peak; the peak height follows the fractal dimension D via the
edge-fraction relation 4 * r^D = 1 (r = segment/edge ratio), i.e.
r = (1/4)^(1/D); D = log4/log3 ≈ 1.26 gives the classic Koch curve
with r = 1/3.  Multi-level fractals stop subdividing an edge at a
mix-derived level uniformly in [min_level, max_level].  The planar
polygon is mapped to the sphere by the tangent-plane exponential map
at `center` scaled to `nominal_radius` radians.
"""

from __future__ import annotations

import math

import numpy as np

from .loops import Loop


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style mix (same construction as sources/geo.mix_np —
    deterministic, engine-free)."""
    off = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + off) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _levels_for_edge(eid: int, seed: int, min_level: int,
                     max_level: int) -> int:
    span = max_level - min_level + 1
    h = int(_mix64(np.array([eid], dtype=np.uint64), seed * 7919 + 13)[0])
    return min_level + (h % span)


class Fractal:
    """Deterministic Koch fractal factory.

    >>> f = Fractal(seed=1, max_level=4)
    >>> loop = f.make_loop(center=(1.0, 0.0, 0.0), nominal_radius=0.05)
    """

    def __init__(self, seed: int, max_level: int,
                 min_level: int | None = None,
                 dimension: float = math.log(4) / math.log(3)):
        if not 1.0 <= dimension < 2.0:
            raise ValueError("dimension must be in [1, 2)")
        self.seed = int(seed)
        self.max_level = int(max_level)
        self.min_level = int(min_level if min_level is not None
                             else max_level)
        if not 0 <= self.min_level <= self.max_level:
            raise ValueError("need 0 <= min_level <= max_level")
        # segment/edge ratio from the fractal dimension: 4 r^D = 1
        self.r = (0.25) ** (1.0 / dimension)
        # peak height over a unit edge: the two middle segments form
        # an isosceles wedge of side r spanning the middle (1 - 2r)
        half_base = 0.5 - self.r
        self.peak_h = math.sqrt(max(0.0, self.r * self.r
                                    - half_base * half_base))

    # -- planar Koch recursion ------------------------------------------
    def _subdivide(self, a: np.ndarray, b: np.ndarray, level: int,
                   stop_level: int, out: list) -> None:
        if level >= stop_level:
            out.append(a)
            return
        d = b - a
        # outward (right-side) perpendicular: CCW traversal keeps the
        # interior left, so snowflake peaks point away from it
        perp = np.array([d[1], -d[0]])
        m1 = a + d * self.r
        m2 = b - d * self.r
        peak = a + d * 0.5 + perp * self.peak_h
        for p, q in ((a, m1), (m1, peak), (peak, m2), (m2, b)):
            self._subdivide(p, q, level + 1, stop_level, out)

    def plane_vertices(self) -> np.ndarray:
        """(n,2) planar fractal vertices (unit circumradius triangle,
        CCW)."""
        # seed-derived rotation of the base triangle (the reference
        # randomizes the frame per fractal; here it's mix-derived so
        # distinct seeds give distinct shapes even at a single level)
        rot = 2 * math.pi * (int(_mix64(np.array([self.seed],
                                                 dtype=np.uint64),
                                        101)[0]) % 10_000) / 10_000.0
        tri = [np.array([math.cos(a + rot), math.sin(a + rot)])
               for a in (math.pi / 2, math.pi / 2 + 2 * math.pi / 3,
                         math.pi / 2 + 4 * math.pi / 3)]
        out: list = []
        for e in range(3):
            stop = _levels_for_edge(e, self.seed, self.min_level,
                                    self.max_level)
            self._subdivide(tri[e], tri[(e + 1) % 3], 0, stop, out)
        return np.array(out, dtype=np.float64)

    # -- sphere mapping --------------------------------------------------
    def make_loop(self, center, nominal_radius: float) -> Loop:
        """Project the planar fractal through the tangent-plane
        exponential map at `center` (unit vector), circumradius
        `nominal_radius` radians; vertices stay CCW (interior = the
        fractal's inside)."""
        c = np.asarray(center, dtype=np.float64)
        c = c / np.linalg.norm(c)
        ref = np.array([0.0, 0.0, 1.0]) if abs(c[2]) < 0.9 \
            else np.array([1.0, 0.0, 0.0])
        u = np.cross(ref, c)
        u /= np.linalg.norm(u)
        v = np.cross(c, u)
        pv = self.plane_vertices() * nominal_radius
        rho = np.linalg.norm(pv, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            dirs = np.where(rho[:, None] > 0, pv / rho[:, None], 0.0)
        pts = (np.cos(rho)[:, None] * c[None, :]
               + np.sin(rho)[:, None] * (dirs[:, 0:1] * u[None, :]
                                         + dirs[:, 1:2] * v[None, :]))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        return Loop(pts)


def fractal_loops(n: int, max_level: int = 3,
                  min_level: int | None = None,
                  nominal_radius: float = 0.08,
                  dimension: float = math.log(4) / math.log(3)
                  ) -> dict[int, Loop]:
    """Deterministic fractal loop set around mix-derived centers (the
    fractal counterpart of ops/pip.synth_loops)."""
    from ..sources import geo
    out = {}
    for pid in range(n):
        key = np.array([pid], dtype=np.int64)
        x, y, z = geo.xyz_np(key)
        f = Fractal(seed=pid + 1, max_level=max_level,
                    min_level=min_level, dimension=dimension)
        out[pid] = f.make_loop((x[0], y[0], z[0]), nominal_radius)
    return out
