"""ClipToPaddedFace slice (kernels/clipping.py): gnomonic uv clipping
as a conservative prefilter for the edge-cell index build — verdicts
identical to the exact convex-cell test, plus the round-3
over-admission probe (the exact test admits only truly-intersecting
cells, so clipping's win is build cost, not index size)."""

import numpy as np
import pytest

from s2spark.kernels import cellid as ci
from s2spark.kernels import clipping, predicates
from s2spark.kernels.fractal import fractal_loops
from s2spark.kernels.loops import Loop
from s2spark.kernels.region import Cell
from s2spark.ops import pip


def _rand_unit(rng, n):
    p = rng.randn(n, 3)
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def _exact_edge_intersects(loop: Loop, cell: Cell) -> np.ndarray:
    """The pre-round-3 formulation: scalar containment + the robust
    crossing ladder on every outside edge (no prefilter)."""
    ec = loop.vertices
    ed = np.roll(ec, -1, axis=0)
    inside_c = np.array([cell.contains_point(tuple(v)) for v in ec])
    inside_d = np.roll(inside_c, -1)
    result = inside_c | inside_d
    todo = np.nonzero(~result)[0]
    if todo.size:
        cv = np.array([cell.get_vertex(k) for k in range(4)])
        cv_next = np.roll(cv, -1, axis=0)
        a = np.repeat(ec[todo], 4, axis=0)
        b = np.repeat(ed[todo], 4, axis=0)
        c = np.tile(cv, (todo.size, 1))
        d = np.tile(cv_next, (todo.size, 1))
        cs = predicates.crossing_sign(a, b, c, d)
        result[todo] = (cs >= 0).reshape(todo.size, 4).any(axis=1)
    return result


def test_cell_contains_points_matches_scalar():
    rng = np.random.RandomState(7)
    pts = _rand_unit(rng, 3000)
    seeds = _rand_unit(rng, 40)
    for lv in (0, 2, 5, 9):
        cells = ci.as_i64(ci.parent(ci.from_xyz(
            seeds[:, 0], seeds[:, 1], seeds[:, 2]), lv))
        for cid in cells[:8]:
            cell = Cell(int(cid))
            vec = clipping.cell_contains_points(cell, pts)
            scal = np.array([cell.contains_point(tuple(p))
                             for p in pts])
            assert np.array_equal(vec, scal)
            vv = np.array([cell.get_vertex(k) for k in range(4)])
            assert np.array_equal(
                clipping.cell_contains_points(cell, vv),
                np.array([cell.contains_point(tuple(p)) for p in vv]))


def test_prefilter_is_conservative():
    """edges_may_intersect_cell never rejects a pair the exact convex
    test accepts — over random edges and cells at several levels."""
    rng = np.random.RandomState(3)
    a = _rand_unit(rng, 400)
    b = _rand_unit(rng, 400)
    seeds = _rand_unit(rng, 30)
    for lv in (1, 3, 6):
        cells = ci.as_i64(ci.parent(ci.from_xyz(
            seeds[:, 0], seeds[:, 1], seeds[:, 2]), lv))
        for cid in cells[:6]:
            cell = Cell(int(cid))
            maybe = clipping.edges_may_intersect_cell(a, b, cell)
            # exact per-edge: endpoint inside or crossing a cell edge
            cv = np.array([cell.get_vertex(k) for k in range(4)])
            cvn = np.roll(cv, -1, axis=0)
            ins = (clipping.cell_contains_points(cell, a)
                   | clipping.cell_contains_points(cell, b))
            aa = np.repeat(a, 4, axis=0)
            bb = np.repeat(b, 4, axis=0)
            cc = np.tile(cv, (a.shape[0], 1))
            dd = np.tile(cvn, (a.shape[0], 1))
            cross = (predicates.crossing_sign(aa, bb, cc, dd) >= 0) \
                .reshape(a.shape[0], 4).any(axis=1)
            exact = ins | cross
            assert not (exact & ~maybe).any()


@pytest.mark.parametrize("loops", [
    pytest.param("synth", id="synth"),
    pytest.param("fractal", id="fractal"),
])
def test_edge_intersects_cell_identical_with_prefilter(loops):
    lps = pip.synth_loops(4) if loops == "synth" \
        else fractal_loops(3, max_level=3, nominal_radius=0.12)
    rng = np.random.RandomState(11)
    for pid, lp in lps.items():
        # cells around the loop at mixed levels + far cells
        v = lp.vertices
        leafs = ci.from_xyz(v[:, 0], v[:, 1], v[:, 2])
        far = _rand_unit(rng, 5)
        far_leafs = ci.from_xyz(far[:, 0], far[:, 1], far[:, 2])
        for lv in (2, 5, 8):
            for cid in list(ci.as_i64(ci.parent(leafs, lv))[:5]) \
                    + list(ci.as_i64(ci.parent(far_leafs, lv))):
                cell = Cell(int(cid))
                assert np.array_equal(lp.edge_intersects_cell(cell),
                                      _exact_edge_intersects(lp, cell))


def test_index_admission_has_no_false_cells():
    """Round-3 probe, cemented: every (icell, edge) row of the edge
    index holds a true geometric intersection (dense sampling finds
    an on-edge point inside the cell) — the index is already minimal,
    clipping cannot shrink it."""
    loops = {**pip.synth_loops(3),
             **{10 + k: v for k, v in
                fractal_loops(2, max_level=3,
                              nominal_radius=0.12).items()}}
    _, edges_pd = pip.build_edge_index(loops)
    ts = np.linspace(0, 1, 2001)[:, None]
    rng = np.random.RandomState(0)
    sample = edges_pd.sample(min(300, len(edges_pd)),
                             random_state=rng)
    for r in sample.itertuples():
        a = np.array([r.ax, r.ay, r.az])
        b = np.array([r.bx, r.by, r.bz])
        pts = a[None, :] * (1 - ts) + b[None, :] * ts
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        leafs = ci.as_i64(ci.from_xyz(pts[:, 0], pts[:, 1],
                                      pts[:, 2]))
        u = np.array([r.icell], dtype=np.int64).view(np.uint64)
        lo = int(ci.as_i64(ci.range_min(u))[0])
        hi = int(ci.as_i64(ci.range_max(u))[0])
        assert ((leafs >= lo) & (leafs <= hi)).any()


def test_clip_to_padded_face_geometry():
    """Clipped uv endpoints lie in the padded square and unproject to
    points on the edge's great circle."""
    rng = np.random.RandomState(5)
    a = _rand_unit(rng, 200)
    b = _rand_unit(rng, 200)
    from s2spark.kernels.region import _face_uv_to_xyz
    checked = 0
    for i in range(200):
        n = np.cross(a[i], b[i])
        nn = np.linalg.norm(n)
        if nn < 1e-9:
            continue
        n /= nn
        for face in range(6):
            seg = clipping.clip_to_padded_face(a[i], b[i], face, 0.0)
            if seg is None:
                continue
            for (u, v) in seg:
                assert -1.0 - 1e-9 <= u <= 1.0 + 1e-9
                assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9
                p = np.array(_face_uv_to_xyz(face, u, v))
                p /= np.linalg.norm(p)
                assert abs(float(np.dot(p, n))) < 1e-9
                checked += 1
    assert checked > 100
