"""Map projections + geodesic<->projected tessellation
(S2::Projection / S2EdgeTessellator analogues, s2projections.h:16-26,
s2edge_tessellator.h:16-27).

Projections implement project(points (n,3)) -> (n,2) and
unproject((n,2)) -> (n,3).  The tessellator recursively bisects an
edge until the midpoint discrepancy between the geodesic and the
projected chord falls under tolerance — the same stopping rule the
reference uses (its production version estimates the error without
recursion; the recursive form is exact-by-construction and verified
by dense sampling in tests/test_projections.py).
"""

from __future__ import annotations

import math

import numpy as np


class PlateCarree:
    """x = lng * scale/pi, y = lat * scale/pi (s2projections.h:105)."""

    def __init__(self, x_scale: float = math.pi):
        self.x_scale = x_scale

    def project(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, dtype=np.float64)
        lng = np.arctan2(pts[:, 1], pts[:, 0])
        lat = np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1]))
        k = self.x_scale / math.pi
        return np.stack([lng * k, lat * k], axis=1)

    def unproject(self, xy: np.ndarray) -> np.ndarray:
        xy = np.asarray(xy, dtype=np.float64)
        k = math.pi / self.x_scale
        lng = xy[:, 0] * k
        lat = np.clip(xy[:, 1] * k, -math.pi / 2, math.pi / 2)
        cl = np.cos(lat)
        return np.stack([np.cos(lng) * cl, np.sin(lng) * cl,
                         np.sin(lat)], axis=1)

    def wrap_x(self) -> float:
        return 2 * self.x_scale


class Mercator:
    """x = lng*max_x/pi, y = max_x/pi * ln tan(pi/4 + lat/2)
    (s2projections.h:142)."""

    def __init__(self, max_x: float = math.pi):
        self.max_x = max_x

    def project(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, dtype=np.float64)
        lng = np.arctan2(pts[:, 1], pts[:, 0])
        lat = np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1]))
        k = self.max_x / math.pi
        y = np.log(np.tan(math.pi / 4 + 0.5 * np.clip(
            lat, -math.pi / 2 + 1e-15, math.pi / 2 - 1e-15)))
        return np.stack([lng * k, y * k], axis=1)

    def unproject(self, xy: np.ndarray) -> np.ndarray:
        xy = np.asarray(xy, dtype=np.float64)
        k = math.pi / self.max_x
        lng = xy[:, 0] * k
        lat = 2 * np.arctan(np.exp(xy[:, 1] * k)) - math.pi / 2
        cl = np.cos(lat)
        return np.stack([np.cos(lng) * cl, np.sin(lng) * cl,
                         np.sin(lat)], axis=1)

    def wrap_x(self) -> float:
        return 2 * self.max_x


def _slerp(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    d = float(np.clip(np.dot(a, b), -1.0, 1.0))
    th = math.acos(d)
    if th < 1e-15:
        return a
    return (math.sin((1 - t) * th) * a + math.sin(t * th) * b) \
        / math.sin(th)


def _chord_dist(p: np.ndarray, q: np.ndarray) -> float:
    return 2 * math.asin(0.5 * min(2.0, float(np.linalg.norm(p - q))))


def tessellate_projected(a: np.ndarray, b: np.ndarray, projection,
                         tolerance_rad: float,
                         max_depth: int = 30) -> np.ndarray:
    """Geodesic edge AB -> planar vertex chain (n,2) whose unprojected
    midpoints stay within tolerance of the geodesic
    (AppendProjected)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    out = [projection.project(a[None, :])[0]]

    def visit(pa, pb, xa, xb, depth):
        mid_geo = _slerp(pa, pb, 0.5)
        mid_geo /= np.linalg.norm(mid_geo)
        xm = 0.5 * (xa + xb)
        mid_chord = projection.unproject(xm[None, :])[0]
        err = _chord_dist(mid_geo, mid_chord)
        if err <= tolerance_rad or depth >= max_depth:
            out.append(xb)
            return
        x_mid = projection.project(mid_geo[None, :])[0]
        visit(pa, mid_geo, xa, x_mid, depth + 1)
        visit(mid_geo, pb, x_mid, xb, depth + 1)

    visit(a, b, out[0], projection.project(b[None, :])[0], 0)
    return np.array(out)


def tessellate_unprojected(xa: np.ndarray, xb: np.ndarray, projection,
                           tolerance_rad: float,
                           max_depth: int = 30) -> np.ndarray:
    """Planar edge -> geodesic vertex chain (n,3) whose projected
    midpoints stay within tolerance of the planar edge
    (AppendUnprojected); tolerance measured on the sphere."""
    xa = np.asarray(xa, dtype=np.float64)
    xb = np.asarray(xb, dtype=np.float64)
    pa = projection.unproject(xa[None, :])[0]
    out = [pa]

    def visit(xa_, xb_, pa_, pb_, depth):
        xm = 0.5 * (xa_ + xb_)
        mid_plane = projection.unproject(xm[None, :])[0]
        mid_geo = _slerp(pa_, pb_, 0.5)
        mid_geo /= np.linalg.norm(mid_geo)
        err = _chord_dist(mid_plane, mid_geo)
        if err <= tolerance_rad or depth >= max_depth:
            out.append(pb_)
            return
        visit(xa_, xm, pa_, mid_plane, depth + 1)
        visit(xm, xb_, mid_plane, pb_, depth + 1)

    visit(xa, xb, pa, projection.unproject(xb[None, :])[0], 0)
    return np.array(out)
