"""Edge-to-face uv clipping — the ClipToPaddedFace slice of
s2edge_clipping (s2edge_clipping.h:16-25).

Key fact (the same one the reference exploits): the gnomonic
projection onto a cube face maps great circles to STRAIGHT LINES, so
the visible portion of a geodesic edge projects to a straight uv
segment and all clipping is linear (Liang-Barsky slabs) — no robust
spherical predicates needed.  Visibility is governed by w = p·(face
normal): an arc with both endpoints at w <= 0 has w <= 0 throughout
(w(t) is a positive combination of the endpoint w's), so it never
touches the face; an arc with one endpoint behind crosses the horizon
at h = w_b*a - w_a*b (the point of the great circle with w = 0 on the
minor arc), whose uv image is the point at infinity in direction
(h_u, h_v) — the projected edge becomes a RAY.

These kernels serve as a conservative vectorized PREFILTER for the
edge-cell index build: `edges_may_intersect_cell` never rejects a
truly intersecting (edge, cell) pair (padding absorbs the double
rounding), so running the exact convex-cell crossing test only on its
survivors leaves the index rows bit-identical while skipping most of
the robust-predicate work (tests/test_clipping.py pins both claims).
Note the round-3 over-admission probe: the exact convex-cell test
admits ONLY truly-intersecting cells (dense-sampling verified on
smooth and fractal loops), so clipping cannot shrink the index — its
value at scale is build cost, not fan-out.
"""

from __future__ import annotations

import numpy as np

# (w, u_num, v_num) as signed xyz component selectors per face:
# u = u_num / w, v = v_num / w, visible iff w > 0 — algebraically
# identical (IEEE sign-exact) to region._valid_face_xyz_to_uv.
_FACE_SEL = {
    0: ((0, 1.0), (1, 1.0), (2, 1.0)),
    1: ((1, 1.0), (0, -1.0), (2, 1.0)),
    2: ((2, 1.0), (0, -1.0), (1, -1.0)),
    3: ((0, -1.0), (2, -1.0), (1, -1.0)),
    4: ((1, -1.0), (2, -1.0), (0, 1.0)),
    5: ((2, -1.0), (1, 1.0), (0, 1.0)),
}

DBL_EPSILON = 2.220446049250313e-16


def face_wuv(face: int, p: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n,3) points -> (w, u_num, v_num) for `face` (divide u_num/w to
    get u; keeping numerators separate avoids inf at the horizon)."""
    p = np.asarray(p, dtype=np.float64)
    (wi, ws), (ui, us), (vi, vs) = _FACE_SEL[face]
    return ws * p[:, wi], us * p[:, ui], vs * p[:, vi]


def cell_contains_points(cell, p: np.ndarray) -> np.ndarray:
    """Vectorized mirror of region.Cell.contains_point (closed cell,
    s2cell.cc:283-300) — identical verdicts, one pass over (n,3)."""
    p = np.asarray(p, dtype=np.float64)
    w, un, vn = face_wuv(cell.face, p)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = un / w
        v = vn / w
    err = DBL_EPSILON
    return ((w > 0)
            & (u >= cell.u_lo - err) & (u <= cell.u_hi + err)
            & (v >= cell.v_lo - err) & (v <= cell.v_hi + err))


def _slab_overlap(p0u, p0v, du, dv, t_max, u_lo, u_hi, v_lo, v_hi):
    """Vectorized Liang-Barsky: does {P0 + t D, 0 <= t <= t_max} meet
    the rect?  Degenerate axes (D == 0) fall back to a containment
    check on that axis."""
    t_lo = np.zeros_like(p0u)
    t_hi = np.array(t_max, dtype=np.float64) + np.zeros_like(p0u)
    ok = np.ones(p0u.shape, dtype=bool)
    for p0, d, lo, hi in ((p0u, du, u_lo, u_hi),
                          (p0v, dv, v_lo, v_hi)):
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - p0) / d
            t2 = (hi - p0) / d
        lo_t = np.minimum(t1, t2)
        hi_t = np.maximum(t1, t2)
        moving = d != 0
        t_lo = np.where(moving, np.maximum(t_lo, lo_t), t_lo)
        t_hi = np.where(moving, np.minimum(t_hi, hi_t), t_hi)
        ok &= moving | ((p0 >= lo) & (p0 <= hi))
    return ok & (t_lo <= t_hi)


def edges_may_intersect_cell(a: np.ndarray, b: np.ndarray, cell,
                             padding: float = 1e-12) -> np.ndarray:
    """Conservative vectorized test: False ONLY when edge i certainly
    misses `cell` (never a false reject — padding covers projection
    rounding); True survivors go to the exact convex-cell test."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    wa, ua, va = face_wuv(cell.face, a)
    wb, ub, vb = face_wuv(cell.face, b)
    n = a.shape[0]
    out = np.zeros(n, dtype=bool)
    visible_a = wa > 0
    visible_b = wb > 0
    u_lo, u_hi = cell.u_lo - padding, cell.u_hi + padding
    v_lo, v_hi = cell.v_lo - padding, cell.v_hi + padding

    both = visible_a & visible_b
    if both.any():
        p0u, p0v = ua[both] / wa[both], va[both] / wa[both]
        p1u, p1v = ub[both] / wb[both], vb[both] / wb[both]
        out[both] = _slab_overlap(p0u, p0v, p1u - p0u, p1v - p0v,
                                  1.0, u_lo, u_hi, v_lo, v_hi)

    for vis_mask, w0, u0, v0, w1, u1, v1 in (
            (visible_a & ~visible_b, wa, ua, va, wb, ub, vb),
            (visible_b & ~visible_a, wb, ub, vb, wa, ua, va)):
        m = vis_mask
        if not m.any():
            continue
        # horizon point h = w0*P1 - w1*P0 (positive combination on the
        # arc when w1 <= 0 < w0); its uv image is the ray direction
        du = w0[m] * u1[m] - w1[m] * u0[m]
        dv = w0[m] * v1[m] - w1[m] * v0[m]
        p0u, p0v = u0[m] / w0[m], v0[m] / w0[m]
        hit = _slab_overlap(p0u, p0v, du, dv, np.inf,
                            u_lo, u_hi, v_lo, v_hi)
        # degenerate horizon direction: stay conservative
        hit |= (du == 0) & (dv == 0)
        out[m] = hit
    # both invisible: w(t) <= 0 along the whole arc -> never on face
    return out


def clip_to_padded_face(a, b, face: int, padding: float = 0.0):
    """Scalar ClipToPaddedFace: the uv segment of the portion of edge
    (a, b) within the padded face square [-1-padding, 1+padding]², or
    None.  Horizon-crossing edges are clipped at the square boundary
    (their uv image is a ray)."""
    a = np.asarray(a, dtype=np.float64).reshape(1, 3)
    b = np.asarray(b, dtype=np.float64).reshape(1, 3)
    wa, ua, va = face_wuv(face, a)
    wb, ub, vb = face_wuv(face, b)
    wa, ua, va = float(wa[0]), float(ua[0]), float(va[0])
    wb, ub, vb = float(wb[0]), float(ub[0]), float(vb[0])
    lim = 1.0 + padding
    if wa <= 0 and wb <= 0:
        return None
    if wa > 0 and wb > 0:
        p0 = (ua / wa, va / wa)
        d = (ub / wb - p0[0], vb / wb - p0[1])
        t_max = 1.0
    else:
        if wa > 0:
            p0 = (ua / wa, va / wa)
            d = (wa * ub - wb * ua, wa * vb - wb * va)
        else:
            p0 = (ub / wb, vb / wb)
            d = (wb * ua - wa * ub, wb * va - wa * vb)
        t_max = np.inf
    # Liang-Barsky against the padded square
    t_lo, t_hi = 0.0, t_max
    for p, dd in ((p0[0], d[0]), (p0[1], d[1])):
        if dd == 0.0:
            if p < -lim or p > lim:
                return None
            continue
        t1, t2 = (-lim - p) / dd, (lim - p) / dd
        t_lo = max(t_lo, min(t1, t2))
        t_hi = min(t_hi, max(t1, t2))
    if t_lo > t_hi:
        return None
    if not np.isfinite(t_hi):
        if d[0] == 0.0 and d[1] == 0.0:
            return (p0, p0)  # degenerate direction, point inside
        return None
    return ((p0[0] + t_lo * d[0], p0[1] + t_lo * d[1]),
            (p0[0] + t_hi * d[0], p0[1] + t_hi * d[1]))
