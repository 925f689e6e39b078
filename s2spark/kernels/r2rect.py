"""Planar axis-aligned rectangles and their (s,t)-space S2 region.

Reference parity:
- ``R2Rect`` — r2rect.h:33-164 / r2rect.cc: a closed axis-aligned
  rectangle in the (x, y) plane, stored as two ``R1Interval`` bounds.
- ``S2R2Rect`` — s2r2rect.h:39-200 / s2r2rect.cc: the same rectangle
  interpreted as a region of (s, t)-space on face 0 of the cube, which
  makes it an S2Region — it satisfies the coverer's duck-typed region
  protocol (``may_intersect_cell`` / ``contains_cell`` /
  ``get_cell_union_bound``), so ``RegionCoverer`` can approximate any
  sub-rectangle of [0,1]x[0,1] by S2 cells.  ``from_cell`` /
  ``from_cellid`` recover the (s,t) footprint of a cell, which is also
  the cheapest way to reason about a cell's ST extent driver-side.

Scale note: these are driver-side fixture/bound objects (the same role
Cap / LatLngRect play in region.py); the distributed paths consume the
cell ids they produce, never the Python objects themselves.
"""
from __future__ import annotations

import math

from . import cellid, coords
from .region import (Cap, Cell, LatLngRect, R1Interval, _face_uv_to_xyz,
                     _normalize, _valid_face_xyz_to_uv)


class R2Rect:
    """r2rect.h:33-164.  Immutable-by-convention; mutating helpers
    (add_point / add_rect) return new rectangles."""

    __slots__ = ("x", "y")

    def __init__(self, x: R1Interval, y: R1Interval):
        self.x = x
        self.y = y

    # --- constructors (r2rect.h:35-62) -------------------------------
    @staticmethod
    def from_points(lo, hi) -> "R2Rect":
        """R2Rect(lo, hi): lo is ALWAYS the lower-left corner (may
        produce an invalid rect if lo > hi on one axis only)."""
        return R2Rect(R1Interval(lo[0], hi[0]), R1Interval(lo[1], hi[1]))

    @staticmethod
    def empty() -> "R2Rect":
        return R2Rect(R1Interval.empty(), R1Interval.empty())

    @staticmethod
    def from_center_size(center, size) -> "R2Rect":
        return R2Rect(
            R1Interval(center[0] - 0.5 * size[0], center[0] + 0.5 * size[0]),
            R1Interval(center[1] - 0.5 * size[1], center[1] + 0.5 * size[1]))

    @staticmethod
    def from_point(p) -> "R2Rect":
        return R2Rect.from_points(p, p)

    @staticmethod
    def from_point_pair(p1, p2) -> "R2Rect":
        return R2Rect(R1Interval.from_point_pair(p1[0], p2[0]),
                      R1Interval.from_point_pair(p1[1], p2[1]))

    # --- accessors ----------------------------------------------------
    def lo(self):
        return (self.x.lo, self.y.lo)

    def hi(self):
        return (self.x.hi, self.y.hi)

    def __getitem__(self, i: int) -> R1Interval:
        return (self.x, self.y)[i]

    def is_valid(self) -> bool:
        return self.x.is_empty() == self.y.is_empty()

    def is_empty(self) -> bool:
        return self.x.is_empty()

    def get_vertex(self, k: int):
        """k-th vertex CCW from the lower-left (r2rect.h:205-210)."""
        k &= 3
        j = (k >> 1) & 1
        return self.get_vertex_ij(j ^ (k & 1), j)

    def get_vertex_ij(self, i: int, j: int):
        return ((self.x.lo, self.x.hi)[i], (self.y.lo, self.y.hi)[j])

    def get_center(self):
        return (self.x.get_center(), self.y.get_center())

    def get_size(self):
        return (self.x.get_length(), self.y.get_length())

    # --- point predicates ----------------------------------------------
    def contains_point(self, p) -> bool:
        return self.x.contains(p[0]) and self.y.contains(p[1])

    def interior_contains_point(self, p) -> bool:
        return (self.x.interior_contains(p[0])
                and self.y.interior_contains(p[1]))

    # --- rect predicates (r2rect.h:107-121) ----------------------------
    def contains(self, o: "R2Rect") -> bool:
        return (self.x.contains_interval(o.x)
                and self.y.contains_interval(o.y))

    def interior_contains(self, o: "R2Rect") -> bool:
        return (self.x.interior_contains_interval(o.x)
                and self.y.interior_contains_interval(o.y))

    def intersects(self, o: "R2Rect") -> bool:
        return self.x.intersects(o.x) and self.y.intersects(o.y)

    def interior_intersects(self, o: "R2Rect") -> bool:
        return (self.x.interior_intersects(o.x)
                and self.y.interior_intersects(o.y))

    # --- mutators (returning new rects) ---------------------------------
    def add_point(self, p) -> "R2Rect":
        return R2Rect(self.x.add_point(p[0]), self.y.add_point(p[1]))

    def add_rect(self, o: "R2Rect") -> "R2Rect":
        return self.union(o)

    def project(self, p):
        """Closest point of the (non-empty) rect to p (r2rect.cc)."""
        return (self.x.project(p[0]), self.y.project(p[1]))

    def expanded(self, margin) -> "R2Rect":
        """Per-axis expansion; negative margins shrink; any expansion
        of empty stays empty, and a shrink below zero length empties
        the rect (r2rect.cc Expanded)."""
        if isinstance(margin, (int, float)):
            margin = (margin, margin)
        xx = self.x.expanded(margin[0])
        yy = self.y.expanded(margin[1])
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect(xx, yy)

    def union(self, o: "R2Rect") -> "R2Rect":
        return R2Rect(self.x.union(o.x), self.y.union(o.y))

    def intersection(self, o: "R2Rect") -> "R2Rect":
        """Intersection; normalizes any axis emptiness to the canonical
        empty rect so is_valid holds (r2rect.cc Intersection)."""
        xx = self.x.intersection(o.x)
        yy = self.y.intersection(o.y)
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect(xx, yy)

    def __eq__(self, o) -> bool:
        if not isinstance(o, R2Rect):
            return NotImplemented
        return self._ieq(self.x, o.x) and self._ieq(self.y, o.y)

    @staticmethod
    def _ieq(a: R1Interval, b: R1Interval) -> bool:
        # R1Interval::operator== treats all empty reps as equal
        return ((a.lo == b.lo and a.hi == b.hi)
                or (a.is_empty() and b.is_empty()))

    __hash__ = None

    def approx_equals(self, o: "R2Rect", max_error: float = 1e-15) -> bool:
        return (self.x.approx_equals(o.x, max_error)
                and self.y.approx_equals(o.y, max_error))

    def __repr__(self) -> str:
        return "R2Rect(%r, %r)" % (self.lo(), self.hi())


def _get_face(p) -> int:
    """S2::GetFace — face whose axis has the largest |component|."""
    ax = max(range(3), key=lambda i: abs(p[i]))
    return ax if p[ax] > 0 else ax + 3


class S2R2Rect(R2Rect):
    """s2r2rect.h:39-200: an R2Rect in (s,t)-space on face 0, exposed
    through the region protocol so the coverer / region algebra apply."""

    @staticmethod
    def from_rect(r: R2Rect) -> "S2R2Rect":
        return S2R2Rect(r.x, r.y)

    @staticmethod
    def empty() -> "S2R2Rect":
        return S2R2Rect(R1Interval.empty(), R1Interval.empty())

    @staticmethod
    def from_points(lo, hi) -> "S2R2Rect":
        return S2R2Rect(R1Interval(lo[0], hi[0]), R1Interval(lo[1], hi[1]))

    @staticmethod
    def from_center_size(center, size) -> "S2R2Rect":
        return S2R2Rect.from_rect(R2Rect.from_center_size(center, size))

    @staticmethod
    def from_point(p) -> "S2R2Rect":
        return S2R2Rect.from_points(p, p)

    @staticmethod
    def from_point_pair(p1, p2) -> "S2R2Rect":
        return S2R2Rect(R1Interval.from_point_pair(p1[0], p2[0]),
                        R1Interval.from_point_pair(p1[1], p2[1]))

    @staticmethod
    def from_cellid(cid: int) -> "S2R2Rect":
        """(s,t) footprint of a cell id (s2r2rect.cc:38-41): centered
        at GetCenterST with side GetSizeST — exact doubles, both are
        dyadic rationals."""
        cid = int(cid) & 0xFFFF_FFFF_FFFF_FFFF
        f, i, j, lev = cellid.to_face_ij_scalar(cid)
        cell_size = 1 << (cellid.MAX_LEVEL - lev)
        i_lo = i & -cell_size
        j_lo = j & -cell_size
        lim = float(coords.LIMIT_IJ)
        half = 0.5 * cell_size
        center = ((i_lo + half) / lim, (j_lo + half) / lim)
        size = cell_size / lim
        return S2R2Rect.from_center_size(center, (size, size))

    @staticmethod
    def from_cell(cell: Cell) -> "S2R2Rect":
        return S2R2Rect.from_cellid(cell.id)

    # --- sphere interface (s2r2rect.cc:47-90) -------------------------
    @staticmethod
    def to_s2point(p):
        """ST point on face 0 -> unit sphere point."""
        u = float(coords.st_to_uv(p[0]))
        v = float(coords.st_to_uv(p[1]))
        return _normalize(_face_uv_to_xyz(0, u, v))

    def get_cap_bound(self) -> Cap:
        """Bound the four vertices around the center point — the rect
        is convex on the sphere, being a subset of one face
        (s2r2rect.cc:51-64)."""
        if self.is_empty():
            return Cap.empty()
        cap = Cap.from_point(S2R2Rect.to_s2point(self.get_center()))
        for k in range(4):
            cap = cap.add_point(S2R2Rect.to_s2point(self.get_vertex(k)))
        return cap

    def get_rect_bound(self) -> LatLngRect:
        return self.get_cap_bound().get_rect_bound()

    def get_cell_union_bound(self) -> list:
        return self.get_cap_bound().get_cell_union_bound()

    def contains_s2point(self, p) -> bool:
        if _get_face(p) != 0:
            return False
        u, v = _valid_face_xyz_to_uv(0, p)
        return self.contains_point((float(coords.uv_to_st(u)),
                                    float(coords.uv_to_st(v))))

    def contains_cell(self, cell: Cell) -> bool:
        if cell.face != 0:
            return False
        return self.contains(S2R2Rect.from_cell(cell))

    def may_intersect_cell(self, cell: Cell) -> bool:
        if cell.face != 0:
            return False
        return self.intersects(S2R2Rect.from_cell(cell))

    def union(self, o: R2Rect) -> "S2R2Rect":
        return S2R2Rect(self.x.union(o.x), self.y.union(o.y))

    def intersection(self, o: R2Rect) -> "S2R2Rect":
        r = R2Rect.intersection(self, o)
        return S2R2Rect(r.x, r.y)

    def add_point(self, p) -> "S2R2Rect":
        return S2R2Rect(self.x.add_point(p[0]), self.y.add_point(p[1]))

    def expanded(self, margin) -> "S2R2Rect":
        r = R2Rect.expanded(self, margin)
        return S2R2Rect(r.x, r.y)
