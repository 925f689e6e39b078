"""S2BufferOperation MVP (reference: s2buffer_operation.h:16-24):
"expand a region by radius r" as an exact-bounded cell decomposition.

The buffered region B(L, r) = { p : signed_dist(p, L) <= r } where
signed_dist is negative inside the loop and the distance to the
boundary edges outside.  signed_dist is 1-Lipschitz in spherical
distance, so corner samples give certified cell bounds:

    for any p in cell:  max_i(s_i) - diam <= s(p) <= min_i(s_i) + diam

(s_i = signed distance at the cell's 4 corners + center, diam = max
pairwise corner distance).  Cells classify fully-inside /
fully-outside when the bound clears r; undecided cells subdivide to
max_level into the boundary band.  Interior cells are therefore
GUARANTEED inside the buffer and non-covered cells guaranteed outside
— the same interior ⊆ region ⊆ covering contract the reference's
covering machinery gives, verified by sampling in
tests/test_buffer.py.

Negative r shrinks the region (erosion) with the same machinery.
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid
from . import edges as ek
from .region import Cell


def _signed_dist(loop, pts: np.ndarray) -> np.ndarray:
    """Signed angular distance of (n,3) points to the loop region."""
    v = loop.vertices
    a = v
    b = np.roll(v, -1, axis=0)
    n = len(pts)
    m = loop.n
    pp = np.repeat(pts, m, axis=0)
    aa = np.tile(a, (n, 1))
    bb = np.tile(b, (n, 1))
    chord2 = ek.point_segment_chord2(pp, aa, bb).reshape(n, m).min(axis=1)
    ang = 2.0 * np.arcsin(0.5 * np.sqrt(np.clip(chord2, 0.0, 4.0)))
    inside = loop.contains_points(pts)
    return np.where(inside, -ang, ang)


def classify_buffer(loop, radius_rad: float, max_level: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """-> (interior_cells, band_cells) int64 ids: cells certified
    inside B(loop, radius) and the undecided max_level band."""
    interior: list[int] = []
    band: list[int] = []

    def visit(cid: int, level: int):
        cell = Cell(cid)
        corners = np.array([cell.get_vertex(k) for k in range(4)]
                           + [list(cell.get_center())], dtype=np.float64)
        s = _signed_dist(loop, corners)
        # max pairwise corner distance (diam of the convex cell)
        d2 = ((corners[:, None, :] - corners[None, :, :]) ** 2).sum(-1)
        diam = 2.0 * math.asin(0.5 * math.sqrt(min(4.0, float(d2.max()))))
        hi = float(s.min()) + diam
        lo = float(s.max()) - diam
        if hi <= radius_rad:
            interior.append(cid)
            return
        if lo > radius_rad:
            return
        if level >= max_level:
            band.append(cid)
            return
        for ch in cellid.child(np.full(4, cid, dtype=np.uint64),
                               np.arange(4)):
            visit(int(ch), level + 1)

    for face in range(6):
        visit(int(cellid.from_face(np.array([face]))[0]), 0)
    as_i64 = lambda v: cellid.as_i64(np.array(v, dtype=np.uint64))  # noqa
    return as_i64(interior), as_i64(band)
