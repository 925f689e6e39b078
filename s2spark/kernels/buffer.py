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


# ---------------------------------------------------------------------------
# Buffered OUTPUT GEOMETRY (s2buffer_operation.cc layer semantics):
# the boundary of B(loop, r) as a snapped vertex chain, built from
# per-edge offset curves + per-vertex join arcs.


def _slerp(a: np.ndarray, b: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Spherical interpolation a->b at fractions t (k,) -> (k,3)."""
    d = float(np.clip(np.dot(a, b), -1.0, 1.0))
    th = math.acos(d)
    if th < 1e-12:
        return np.repeat(a[None, :], len(t), axis=0)
    s = math.sin(th)
    return (np.sin((1.0 - t) * th)[:, None] * a[None, :]
            + np.sin(t * th)[:, None] * b[None, :]) / s


def buffer_geometry(loop, radius_rad: float,
                    max_error_rad: float = 1e-3) -> np.ndarray:
    """Boundary of the buffered region B(loop, r) as one closed (k,3)
    vertex chain (CCW, same parity interpretation as the input).

    Construction (the reference's s2buffer_operation.cc builds the
    same offset curves, then snap-rounds through S2Builder):
    - each edge a->b with great-circle pole n = (a×b)/|a×b| (interior
      of a CCW loop lies on the +n side) offsets OUTWARD to the small
      circle y(t) = cos(r)·x(t) − sin(r)·n — exactly the distance-r
      level set of the edge's geodesic (|y| = 1 since x ⊥ n);
    - each CONVEX vertex b joins adjacent offsets with the arc of the
      distance-r circle around b: y(s) = cos(r)·b − sin(r)·u(s), u(s)
      the in-tangent-plane slerp from the incoming to the outgoing
      edge pole (both ⊥ b, so the sweep stays unit and ⊥ b) — this IS
      the true buffer boundary near a convex vertex;
    - REFLEX vertices get the same short-way sweep; the resulting
      excursion is O(r·turn²) and stays within the certified
      classify_buffer band for turning-angle-bounded (smooth) loops —
      the MVP scope, asserted by the sandwich test.
    - r < 0 erodes: offsets flip to the +n side and the convex/reflex
      roles swap (same formulas with signed r).

    Tessellation: angular step sqrt(8·max_error_rad), the sagitta
    bound for unit-sphere arcs; the default 1e-3 rad error is far
    inside the level-8..11 band widths the certification tests use.
    """
    v = np.asarray(loop.vertices, dtype=np.float64)
    nv = len(v)
    r = float(radius_rad)
    if abs(r) < 1e-15:
        return v.copy()
    cr, sr = math.cos(r), math.sin(r)
    nxt = np.roll(v, -1, axis=0)
    poles = np.cross(v, nxt)
    poles /= np.linalg.norm(poles, axis=1, keepdims=True)
    step = math.sqrt(8.0 * max_error_rad)
    out: list[np.ndarray] = []
    for i in range(nv):
        a, b = v[i], nxt[i]
        n = poles[i]
        # offset curve of the edge (excluding the far endpoint)
        th = math.acos(float(np.clip(np.dot(a, b), -1.0, 1.0)))
        m = max(1, int(math.ceil(th / step)))
        t = np.arange(m) / m
        x = _slerp(a, b, t)
        out.append(cr * x - sr * n[None, :])
        # join arc around b from this edge's pole to the next edge's —
        # only where the adjacent offsets DIVERGE (convex turn for
        # expansion, reflex turn for erosion); where they cross, the
        # direct chain edge trims the corner instead (avoids the local
        # reversed loop a crossing join arc would create)
        n2 = poles[(i + 1) % nv]
        turn = float(np.dot(np.cross(n, n2), b))
        if turn * r > 0:
            phi = math.acos(float(np.clip(np.dot(n, n2), -1.0, 1.0)))
            if phi > 1e-12:
                k = max(1, int(math.ceil(phi / step)))
                s = np.arange(1, k) / k
                u = _slerp(n, n2, s)
                if len(u):
                    out.append(cr * b[None, :] - sr * u)
    chain = np.concatenate(out, axis=0)
    return chain / np.linalg.norm(chain, axis=1, keepdims=True)
