"""Batched edge->cell coverings: the vectorized replacement for the
per-row RegionCoverer(EdgeRegion) path (~10 ms/edge, VERDICT r4 #2).

Exploits the same fact as the clipping kernels: the gnomonic
projection maps great circles to STRAIGHT uv lines, so "edge touches
cell" is a linear segment-vs-rect test (Liang-Barsky slabs) — near
exact (padding absorbs double rounding), conservative by
construction.  The covering is computed for a whole Arrow batch of
edges at once by a level-synchronous BFS over (edge, cell) PAIR
arrays: at each level every surviving pair spawns its 4 children and
one vectorized slab pass filters them — no per-edge or per-cell
Python in the loop.

Two regimes (the two engine call sites):
- fixed level   : all level-L cells each edge may touch (the
  track_edge_index contract — closest_edge_join keys its expanding
  rings at one level, and extra conservative cells only ADD
  candidates before the exact rerank).
- adaptive      : per-edge cell budget; an edge whose covering would
  exceed `max_cells` at the next level keeps its current-level cells
  (the crossing_edge_join candidate generator; candidates are later
  decided by the exact CrossingSign kernel, so a conservative or
  coarse covering never changes the output).

Degenerate (exactly antipodal) edges fall back to the per-row
recursive coverer — their uv image is ill-defined.

Reference: s2crossing_edge_query.h:17-24 covers query edges the same
way (index-cell granularity candidates, exact predicate decides).
"""

from __future__ import annotations

import numpy as np

from . import cellid, coords
from .clipping import _slab_overlap, face_wuv

_PAD = 1e-12


def _face_segment_params(a: np.ndarray, b: np.ndarray, f: int):
    """Per-edge straight-uv-segment parameters on face `f`.

    Returns (present, degen, p0u, p0v, du, dv, t_max): edges with
    present=False never touch the face (w <= 0 throughout); degen=True
    marks the ill-defined ray direction (antipodal endpoints) that
    must fall back to the per-row coverer.  Mirrors the three
    visibility cases of clipping.edges_may_intersect_cell."""
    wa, ua, va = face_wuv(f, a)
    wb, ub, vb = face_wuv(f, b)
    vis_a, vis_b = wa > 0, wb > 0
    present = vis_a | vis_b
    n = a.shape[0]
    p0u = np.zeros(n)
    p0v = np.zeros(n)
    du = np.zeros(n)
    dv = np.zeros(n)
    t_max = np.zeros(n)
    degen = np.zeros(n, dtype=bool)

    both = vis_a & vis_b
    if both.any():
        p0u[both] = ua[both] / wa[both]
        p0v[both] = va[both] / wa[both]
        du[both] = ub[both] / wb[both] - p0u[both]
        dv[both] = vb[both] / wb[both] - p0v[both]
        t_max[both] = 1.0

    for m, w0, u0, v0, w1, u1, v1 in (
            (vis_a & ~vis_b, wa, ua, va, wb, ub, vb),
            (vis_b & ~vis_a, wb, ub, vb, wa, ua, va)):
        if not m.any():
            continue
        p0u[m] = u0[m] / w0[m]
        p0v[m] = v0[m] / w0[m]
        # horizon point h = w0*P1 - w1*P0: the uv image is a ray
        du[m] = w0[m] * u1[m] - w1[m] * u0[m]
        dv[m] = w0[m] * v1[m] - w1[m] * v0[m]
        t_max[m] = np.inf
        degen |= m & (du == 0) & (dv == 0)
    return present, degen, p0u, p0v, du, dv, t_max


def _grid_uv(idx: np.ndarray, lev: int) -> np.ndarray:
    """uv ordinate of ST gridline idx/2^lev (exact dyadic st)."""
    return coords.st_to_uv(idx.astype(np.float64) / float(1 << lev))


def edge_coverings_batch(a: np.ndarray, b: np.ndarray,
                         level: int | None = None,
                         max_cells: int = 8,
                         max_level: int = 30
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Coverings for a batch of geodesic edges.

    a, b: (n, 3) unit endpoints.
    level=None  -> adaptive (per-edge `max_cells` budget, freeze at
                   the last level within budget, floor `max_level`).
    level=L     -> all level-L may-intersect cells per edge.

    Returns (eidx, cell) int64 pair arrays (eidx into the batch).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n = a.shape[0]
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    target = max_level if level is None else level

    # per-(edge, face) segment params -> initial pair arrays
    pe, pf = [], []
    params = []
    degen_edges = np.zeros(n, dtype=bool)
    for f in range(6):
        present, degen, p0u, p0v, du, dv, t_max = \
            _face_segment_params(a, b, f)
        degen_edges |= degen
        params.append((p0u, p0v, du, dv, t_max))
        idx = np.where(present & ~degen)[0]
        pe.append(idx)
        pf.append(np.full(idx.size, f, dtype=np.int64))
    eidx = np.concatenate(pe)
    face = np.concatenate(pf)
    ci = np.zeros(eidx.size, dtype=np.int64)   # grid i at current lev
    cj = np.zeros(eidx.size, dtype=np.int64)
    # gather per-pair params once (faces differ per pair)
    P0U = np.concatenate([params[f][0][pe[f]] for f in range(6)])
    P0V = np.concatenate([params[f][1][pe[f]] for f in range(6)])
    DU = np.concatenate([params[f][2][pe[f]] for f in range(6)])
    DV = np.concatenate([params[f][3][pe[f]] for f in range(6)])
    TM = np.concatenate([params[f][4][pe[f]] for f in range(6)])

    out_e, out_c = [], []

    def emit(sel, lev):
        if not sel.any():
            return
        shift = 30 - lev
        leaf = cellid.from_face_ij(face[sel], ci[sel] << shift,
                                   cj[sel] << shift)
        cells = cellid.parent(leaf, lev) if lev < 30 else leaf
        out_e.append(eidx[sel])
        out_c.append(cellid.as_i64(cells))

    lev = 0
    # the level-0 pairs are already may-intersect (face present)
    while lev < target and eidx.size:
        # spawn 4 children of every pair
        r = np.repeat(np.arange(eidx.size), 4)
        q = np.tile(np.arange(4, dtype=np.int64), eidx.size)
        nci = (ci[r] << 1) + (q & 1)
        ncj = (cj[r] << 1) + (q >> 1)
        nlev = lev + 1
        u_lo = _grid_uv(nci, nlev)
        u_hi = _grid_uv(nci + 1, nlev)
        v_lo = _grid_uv(ncj, nlev)
        v_hi = _grid_uv(ncj + 1, nlev)
        hit = _slab_overlap(P0U[r], P0V[r], DU[r], DV[r], TM[r],
                            u_lo - _PAD, u_hi + _PAD,
                            v_lo - _PAD, v_hi + _PAD)
        w = np.where(hit)[0]          # surviving child slots
        kr = r[w]                     # their parent pair rows
        if level is None:
            # adaptive: an edge whose child covering busts the budget
            # freezes — emit its CURRENT (level-lev) cells instead
            counts = np.bincount(eidx[kr], minlength=n)
            frozen = counts > max_cells
            emit(frozen[eidx], lev)
            keep = ~frozen[eidx[kr]]
            w, kr = w[keep], kr[keep]
        eidx = eidx[kr]
        face = face[kr]
        ci = nci[w]
        cj = ncj[w]
        P0U, P0V, DU, DV, TM = (arr[kr] for arr in
                                (P0U, P0V, DU, DV, TM))
        lev = nlev
    emit(np.ones(eidx.size, dtype=bool), lev)

    # degenerate edges: per-row recursive fallback
    if degen_edges.any():
        from . import edges as ek
        for i in np.where(degen_edges)[0]:
            cov = ek.edge_covering(
                a[i], b[i],
                max_cells=max_cells if level is None else 1 << 30,
                min_level=0 if level is None else level,
                max_level=target)
            out_e.append(np.full(len(cov), i, dtype=np.int64))
            out_c.append(np.asarray(cov, dtype=np.int64))

    if not out_e:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(out_e), np.concatenate(out_c)
