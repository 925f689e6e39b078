"""Reference battery for PaddedCell (s2padded_cell_test.cc:40-160):
S2Cell-equivalence of bounds/middle/center, entry/exit vertex
invariants (padding independence, curve continuity, child sharing),
and the ShrinkToFit construction."""
import numpy as np
import pytest

from s2spark.kernels import cellid, coords
from s2spark.kernels.padded_cell import PaddedCell
from s2spark.kernels.r2rect import R2Rect
from s2spark.kernels.region import Cell, R1Interval


def _rand_cellid(rng) -> int:
    face = int(rng.integers(0, 6))
    level = int(rng.integers(0, cellid.MAX_LEVEL + 1))
    pos = int(rng.integers(0, 1 << 61, dtype=np.uint64))
    return int(cellid.from_face_pos_level(face, pos, level)[()])


def _next_wrap(cid: int) -> int:
    lsb = cid & (~cid + 1)
    nxt = (cid + 2 * lsb) & 0xFFFF_FFFF_FFFF_FFFF
    if nxt >= (6 << cellid.POS_BITS):
        return lsb  # begin(level): face 0, first cell at this level
    return nxt


def _cell_bound_uv(cell: Cell) -> R2Rect:
    return R2Rect(R1Interval(cell.u_lo, cell.u_hi),
                  R1Interval(cell.v_lo, cell.v_hi))


def _center_uv(cid: int) -> tuple:
    f, i, j, lev = cellid.to_face_ij_scalar(cid)
    ij_size = 1 << (cellid.MAX_LEVEL - lev)
    st_u = ((i & -ij_size) + 0.5 * ij_size) / float(coords.LIMIT_IJ)
    st_v = ((j & -ij_size) + 0.5 * ij_size) / float(coords.LIMIT_IJ)
    return (float(coords.st_to_uv(st_u)), float(coords.st_to_uv(st_v)))


def _compare_cell_to_padded(cell: Cell, pcell: PaddedCell,
                            padding: float):
    assert cell.id == pcell.id
    assert cell.level == pcell.level
    assert pcell.padding == padding
    assert _cell_bound_uv(cell).expanded(padding) == pcell.bound
    center_uv = _center_uv(cell.id)
    assert R2Rect.from_point(center_uv).expanded(padding) == pcell.middle()
    assert cell.get_center() == pcell.get_center()


def test_s2cell_methods():
    rng = np.random.default_rng(20260820)
    for _ in range(300):
        cid = _rand_cellid(rng)
        padding = float(10.0 ** rng.uniform(-15, 0))
        cell = Cell(cid)
        pcell = PaddedCell(cid, padding)
        _compare_cell_to_padded(cell, pcell, padding)
        if pcell.level < cellid.MAX_LEVEL:
            c = np.array([cid], dtype=np.uint64)
            for pos in range(4):
                i, j = pcell.get_child_ij(pos)
                _compare_cell_to_padded(
                    Cell(int(cellid.child(c, pos)[0])),
                    PaddedCell.child(pcell, i, j), padding)


def test_entry_exit_vertices():
    rng = np.random.default_rng(7)
    for _ in range(300):
        cid = _rand_cellid(rng)
        # entry/exit do not depend on padding
        assert PaddedCell(cid, 0).get_entry_vertex() == \
            PaddedCell(cid, 0.5).get_entry_vertex()
        assert PaddedCell(cid, 0).get_exit_vertex() == \
            PaddedCell(cid, 0.5).get_exit_vertex()

        # curve continuity: exit(cell) == entry(next_wrap(cell))
        assert PaddedCell(cid, 0).get_exit_vertex() == \
            PaddedCell(_next_wrap(cid), 0).get_entry_vertex()

        # entry(cell) == entry(child 0), exit(cell) == exit(child 3)
        if int(cellid.level(np.array([cid], dtype=np.uint64))[0]) \
                < cellid.MAX_LEVEL:
            c = np.array([cid], dtype=np.uint64)
            assert PaddedCell(cid, 0).get_entry_vertex() == \
                PaddedCell(int(cellid.child(c, 0)[0]), 0).get_entry_vertex()
            assert PaddedCell(cid, 0).get_exit_vertex() == \
                PaddedCell(int(cellid.child(c, 3)[0]), 0).get_exit_vertex()


def test_shrink_to_fit():
    rng = np.random.default_rng(20260821)
    iters = 0
    while iters < 300:
        # start with the desired result and work backwards
        result = _rand_cellid(rng)
        cell = Cell(result)
        result_uv = _cell_bound_uv(cell)
        size_uv = result_uv.get_size()
        lev = cell.level

        max_padding = 0.5 * min(size_uv[0], size_uv[1])
        padding = float(rng.uniform(0, max_padding))
        max_rect = result_uv.expanded(-padding)
        if max_rect.is_empty():
            continue

        a = [float(rng.uniform(max_rect.x.lo, max_rect.x.hi)),
             float(rng.uniform(max_rect.y.lo, max_rect.y.hi))]
        b = [float(rng.uniform(max_rect.x.lo, max_rect.x.hi)),
             float(rng.uniform(max_rect.y.lo, max_rect.y.hi))]
        if lev < cellid.MAX_LEVEL:
            # ensure the rect straddles at least two children
            axis = int(rng.integers(0, 2))
            center = _center_uv(result)[axis]
            shared = R1Interval(center - padding, center + padding)
            mr = (max_rect.x, max_rect.y)[axis]
            inter = shared.intersection(mr)
            if inter.is_empty():
                continue
            mid = float(rng.uniform(inter.lo, inter.hi))
            a[axis] = float(rng.uniform(mr.lo, mid))
            b[axis] = float(rng.uniform(mid, mr.hi))
        rect = R2Rect.from_point_pair(tuple(a), tuple(b))

        initial = int(cellid.parent(
            np.array([result], dtype=np.uint64),
            int(rng.integers(0, lev + 1)))[0])
        assert PaddedCell(initial, padding).shrink_to_fit(rect) == result
        iters += 1
