"""S2PaddedCell — an S2 cell whose (u,v) bound is expanded by padding.

Reference parity: s2padded_cell.h:27-110 / s2padded_cell.cc:40-178.
The padded cell is the recursive-subdivision workhorse for clipping
edges against cell boundaries: children share the parent's bound on
two sides and take the "middle" rectangle (the strip all four padded
children share) on the others, so descending the Hilbert tree needs no
re-derivation of bounds.  ``shrink_to_fit`` jumps straight to the
smallest ancestor whose padded children could split a query rect,
skipping the single-child prefix of the recursion.

Driver-side object (like Cell / Cap in region.py); the distributed
edge-covering path (kernels/edge_cover.py) uses the same arithmetic in
batched form.
"""
from __future__ import annotations

import numpy as np

from . import cellid, coords
from .r2rect import R2Rect
from .region import R1Interval

_DBL_EPSILON = float(np.finfo(np.float64).eps)


def _st_to_uv(s: float) -> float:
    return float(coords.st_to_uv(s))


def _uv_to_st(u: float) -> float:
    return float(coords.uv_to_st(u))


def _si_ti_to_st(si: int) -> float:
    return si / float(coords.MAX_SI_TI)


def _st_to_ij(s: float) -> int:
    return int(coords.st_to_ij(s)[()])


def _face_si_ti_to_xyz(face: int, si: int, ti: int):
    u = _st_to_uv(_si_ti_to_st(si))
    v = _st_to_uv(_si_ti_to_st(ti))
    p = np.asarray(coords.face_uv_to_xyz(face, u, v), dtype=np.float64)
    return tuple(p / np.sqrt(float(p @ p)))


class PaddedCell:
    """s2padded_cell.h:33-98."""

    __slots__ = ("id", "padding", "bound", "_middle", "ij_lo",
                 "orientation", "level", "face")

    def __init__(self, cid: int, padding: float):
        cid = int(cid) & 0xFFFF_FFFF_FFFF_FFFF
        self.id = cid
        self.padding = float(padding)
        self._middle = None  # lazy (s2padded_cell.cc:80-92)
        arr = np.array([cid], dtype=np.uint64)
        self.face = int(cellid.to_face_ij_orientation(arr)[0][0])
        if bool(cellid.is_face(arr)[0]):
            # fast path for a top-level face (s2padded_cell.cc:40-49)
            limit = 1.0 + padding
            self.bound = R2Rect(R1Interval(-limit, limit),
                                R1Interval(-limit, limit))
            self._middle = R2Rect(R1Interval(-padding, padding),
                                  R1Interval(-padding, padding))
            self.ij_lo = [0, 0]
            self.orientation = self.face & 1
            self.level = 0
        else:
            f, i, j, orient = (int(x[0]) for x in
                               cellid.to_face_ij_orientation(arr, True))
            lev = int(cellid.level(arr)[0])
            self.level = lev
            self.orientation = orient
            ij_size = 1 << (cellid.MAX_LEVEL - lev)
            i_lo = i & -ij_size
            j_lo = j & -ij_size
            self.ij_lo = [i_lo, j_lo]
            lim = float(coords.LIMIT_IJ)
            self.bound = R2Rect(
                R1Interval(_st_to_uv(i_lo / lim),
                           _st_to_uv((i_lo + ij_size) / lim)),
                R1Interval(_st_to_uv(j_lo / lim),
                           _st_to_uv((j_lo + ij_size) / lim))
            ).expanded(padding)

    @classmethod
    def child(cls, parent: "PaddedCell", i: int, j: int) -> "PaddedCell":
        """Child with (i,j) index — i along u, j along v
        (s2padded_cell.cc:61-78): one corner from the parent bound,
        the opposite corner from middle()."""
        self = cls.__new__(cls)
        self.padding = parent.padding
        self.level = parent.level + 1
        self.face = parent.face
        self._middle = None
        pos = cellid.IJ_TO_POS[parent.orientation][2 * i + j]
        self.id = int(cellid.child(
            np.array([parent.id], dtype=np.uint64), pos)[0])
        ij_size = 1 << (cellid.MAX_LEVEL - self.level)
        self.ij_lo = [parent.ij_lo[0] + i * ij_size,
                      parent.ij_lo[1] + j * ij_size]
        self.orientation = (parent.orientation
                            ^ cellid.POS_TO_ORIENTATION[pos])
        middle = parent.middle()
        xs = [parent.bound.x.lo, parent.bound.x.hi]
        ys = [parent.bound.y.lo, parent.bound.y.hi]
        xs[1 - i] = (middle.x.lo, middle.x.hi)[1 - i]
        ys[1 - j] = (middle.y.lo, middle.y.hi)[1 - j]
        self.bound = R2Rect(R1Interval(*xs), R1Interval(*ys))
        return self

    def middle(self) -> R2Rect:
        """The rect belonging to all four padded children
        (s2padded_cell.cc:80-92), computed lazily."""
        if self._middle is None:
            ij_size = 1 << (cellid.MAX_LEVEL - self.level)
            u = _st_to_uv(_si_ti_to_st(2 * self.ij_lo[0] + ij_size))
            v = _st_to_uv(_si_ti_to_st(2 * self.ij_lo[1] + ij_size))
            self._middle = R2Rect(
                R1Interval(u - self.padding, u + self.padding),
                R1Interval(v - self.padding, v + self.padding))
        return self._middle

    def get_child_ij(self, pos: int) -> tuple[int, int]:
        """Hilbert traversal position -> child (i,j)
        (s2padded_cell.h:104-108)."""
        ij = cellid.POS_TO_IJ[self.orientation][pos]
        return ij >> 1, ij & 1

    def get_center(self):
        # same kernel as Cell.get_center (engine-wide bit-consistency)
        x, y, z = cellid.to_point(np.array([self.id], dtype=np.uint64))
        return (float(x[0]), float(y[0]), float(z[0]))

    def get_entry_vertex(self):
        """Vertex where the space-filling curve enters the cell
        (s2padded_cell.cc:102-113)."""
        i, j = self.ij_lo
        if self.orientation & cellid.INVERT_MASK:
            ij_size = 1 << (cellid.MAX_LEVEL - self.level)
            i += ij_size
            j += ij_size
        return _face_si_ti_to_xyz(self.face, 2 * i, 2 * j)

    def get_exit_vertex(self):
        """Vertex where the curve exits (s2padded_cell.cc:115-126)."""
        i, j = self.ij_lo
        ij_size = 1 << (cellid.MAX_LEVEL - self.level)
        if self.orientation in (0, cellid.SWAP_MASK + cellid.INVERT_MASK):
            i += ij_size
        else:
            j += ij_size
        return _face_si_ti_to_xyz(self.face, 2 * i, 2 * j)

    def shrink_to_fit(self, rect: R2Rect) -> int:
        """Smallest cell containing all descendants whose padded
        bounds intersect rect (s2padded_cell.cc:128-178).
        REQUIRES bound().intersects(rect)."""
        assert self.bound.intersects(rect)
        ij_size = 1 << (cellid.MAX_LEVEL - self.level)
        if self.level == 0:
            if rect.x.contains(0.0) or rect.y.contains(0.0):
                return self.id
        else:
            if (rect.x.contains(_st_to_uv(_si_ti_to_st(
                    2 * self.ij_lo[0] + ij_size)))
                or rect.y.contains(_st_to_uv(_si_ti_to_st(
                    2 * self.ij_lo[1] + ij_size)))):
                return self.id
        # pad for the UVtoST error, then span in (i,j)
        padded = rect.expanded(self.padding + 1.5 * _DBL_EPSILON)
        ij_min = [0, 0]
        ij_xor = [0, 0]
        for d in range(2):
            iv = (padded.x, padded.y)[d]
            ij_min[d] = max(self.ij_lo[d], _st_to_ij(_uv_to_st(iv.lo)))
            ij_max = min(self.ij_lo[d] + ij_size - 1,
                         _st_to_ij(_uv_to_st(iv.hi)))
            ij_xor[d] = ij_min[d] ^ ij_max
        level_msb = ((ij_xor[0] | ij_xor[1]) << 1) + 1
        lev = cellid.MAX_LEVEL - (level_msb.bit_length() - 1)
        if lev <= self.level:
            return self.id
        return int(cellid.parent(
            cellid.from_face_ij(np.array([self.face], dtype=np.uint64),
                                np.array([ij_min[0]], dtype=np.uint64),
                                np.array([ij_min[1]], dtype=np.uint64)),
            lev)[0])
