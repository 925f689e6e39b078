"""S2CellUnion set operations over sorted uint64 cell-id arrays.

Semantics follow the reference (s2cell_union.cc): a normalized union is a
sorted array of valid, non-overlapping cell ids with no 4 sibling cells
present.  Relationally a union is the exploded table (region_id, cell_id);
these kernels are the per-row array form used inside covering/normalize
pandas UDFs and by the coverer.
"""

from __future__ import annotations

import numpy as np

from . import cellid, metrics

_U = np.uint64


def _as_sorted_u64(ids) -> np.ndarray:
    a = cellid.as_u64(np.atleast_1d(np.asarray(ids)))
    return np.sort(a)


def are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """Do the four distinct cells share a parent (s2cell_union.cc:120-139)."""
    if (a ^ b ^ c) != d:
        return False
    arr = np.array([d], dtype=np.uint64)
    mask = int(cellid.lsb(arr)[0]) << 1
    mask = ~(mask + (mask << 1)) & 0xFFFFFFFFFFFFFFFF
    dm = d & mask
    return ((a & mask) == dm and (b & mask) == dm and (c & mask) == dm
            and not bool(cellid.is_face(arr)[0]))


def normalize(ids) -> np.ndarray:
    """Sort, drop contained cells, collapse 4-sibling groups
    (s2cell_union.cc:166-192)."""
    a = _as_sorted_u64(ids)
    if a.size == 0:
        return a
    rmax = cellid.range_max(a)
    out: list[int] = []
    out_rmax: list[int] = []
    for k in range(a.size):
        cid = int(a[k])
        rm = int(rmax[k])
        if out and cid <= out_rmax[-1]:
            continue  # contained by previous (sorted, so range_min <= cid)
        # discard previous cells contained by this one
        rmin = cid - (cid & (~cid + 1) & 0xFFFFFFFFFFFFFFFF) + 1
        while out and out[-1] >= rmin:
            out.pop()
            out_rmax.pop()
        # collapse sibling groups
        while len(out) >= 3 and are_siblings(out[-3], out[-2], out[-1], cid):
            out.pop()
            out.pop()
            out.pop()
            out_rmax = out_rmax[:-3]
            arr = np.array([cid], dtype=np.uint64)
            cid = int(cellid.parent1(arr)[0])
            rm = int(cellid.range_max(np.array([cid], dtype=np.uint64))[0])
            rmin = int(cellid.range_min(np.array([cid], dtype=np.uint64))[0])
            while out and out[-1] >= rmin:
                out.pop()
                out_rmax.pop()
        out.append(cid)
        out_rmax.append(rm)
    return np.array(out, dtype=np.uint64)


def denormalize(ids, min_level: int, level_mod: int) -> np.ndarray:
    """Re-subdivide so every cell level satisfies min_level/level_mod
    (s2cell_union.cc:194-228)."""
    a = cellid.as_u64(np.atleast_1d(np.asarray(ids)))
    out: list[int] = []
    levels = cellid.level(a)
    for k in range(a.size):
        cid = a[k:k + 1]
        lev = int(levels[k])
        new_level = max(min_level, lev)
        if level_mod > 1:
            new_level += (cellid.MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(cellid.MAX_LEVEL, new_level)
        if new_level == lev:
            out.append(int(cid[0]))
        else:
            cur = cellid.child_begin(cid, new_level)
            end = int(cellid.child_end(cid, new_level)[0])
            while int(cur[0]) != end:
                out.append(int(cur[0]))
                cur = cellid.next_cell(cur)
    return np.array(out, dtype=np.uint64)


def union(x, y) -> np.ndarray:
    return normalize(np.concatenate([cellid.as_u64(np.atleast_1d(x)),
                                     cellid.as_u64(np.atleast_1d(y))]))


def intersection(x, y) -> np.ndarray:
    """Two-pointer merge over Hilbert ranges (s2cell_union.cc:374-417).
    Inputs must be normalized; output is normalized."""
    xa = cellid.as_u64(np.atleast_1d(x))
    ya = cellid.as_u64(np.atleast_1d(y))
    x_rmin, x_rmax = cellid.range_min(xa), cellid.range_max(xa)
    y_rmin, y_rmax = cellid.range_min(ya), cellid.range_max(ya)
    out = []
    i = j = 0
    while i < xa.size and j < ya.size:
        imin, jmin = int(x_rmin[i]), int(y_rmin[j])
        if imin > jmin:
            if int(xa[i]) <= int(y_rmax[j]):
                out.append(int(xa[i]))
                i += 1
            else:
                # advance j to the first y-cell not entirely preceding x[i]:
                # first j with y_rmax >= x[i].range_min (EntirelyPrecedes,
                # s2cell_union.cc:280-282)
                j = int(np.searchsorted(y_rmax, x_rmin[i], side="left"))
        elif jmin > imin:
            if int(ya[j]) <= int(x_rmax[i]):
                out.append(int(ya[j]))
                j += 1
            else:
                i = int(np.searchsorted(x_rmax, y_rmin[j], side="left"))
        else:
            if int(xa[i]) < int(ya[j]):
                out.append(int(xa[i]))
                i += 1
            else:
                out.append(int(ya[j]))
                j += 1
    return np.array(out, dtype=np.uint64)


def intersect_with_cell(ids, probe: int) -> np.ndarray:
    return intersection(ids, np.array([probe], dtype=np.uint64))


def contains_cell(ids, probe) -> np.ndarray:
    """Vectorized: does the (normalized, sorted) union contain each probe
    cell entirely (s2cell_union.cc:284-291)."""
    a = cellid.as_u64(np.atleast_1d(ids))
    p = cellid.as_u64(np.atleast_1d(probe))
    if a.size == 0:
        return np.zeros(p.shape, dtype=bool)
    rmax = cellid.range_max(a)
    p_rmin, p_rmax = cellid.range_min(p), cellid.range_max(p)
    # first cell whose range_max >= probe.range_min
    idx = np.searchsorted(rmax, p_rmin, side="left")
    idx_c = np.clip(idx, 0, a.size - 1)
    cand_rmin = cellid.range_min(a[idx_c])
    return (idx < a.size) & (cand_rmin <= p_rmin) & \
        (cellid.range_max(a[idx_c]) >= p_rmax)


def intersects_cell(ids, probe) -> np.ndarray:
    """Vectorized: does the union intersect each probe cell."""
    a = cellid.as_u64(np.atleast_1d(ids))
    p = cellid.as_u64(np.atleast_1d(probe))
    if a.size == 0:
        return np.zeros(p.shape, dtype=bool)
    rmax = cellid.range_max(a)
    p_rmin, p_rmax = cellid.range_min(p), cellid.range_max(p)
    idx = np.searchsorted(rmax, p_rmin, side="left")
    idx_c = np.clip(idx, 0, a.size - 1)
    cand_rmin = cellid.range_min(a[idx_c])
    return (idx < a.size) & (cand_rmin <= p_rmax)


def contains_union(x, y) -> bool:
    """Does union x contain union y entirely."""
    return bool(contains_cell(x, y).all())


def difference(x, y) -> np.ndarray:
    """x minus y via divide-and-conquer (s2cell_union.cc:419-447)."""
    xa = cellid.as_u64(np.atleast_1d(x))
    ya = cellid.as_u64(np.atleast_1d(y))
    out: list[int] = []

    def rec(cid: int):
        arr = np.array([cid], dtype=np.uint64)
        if not intersects_cell(ya, arr)[0]:
            out.append(cid)
        elif not contains_cell(ya, arr)[0]:
            ch = cellid.child_begin(arr)
            for _ in range(4):
                rec(int(ch[0]))
                ch = cellid.next_cell(ch)

    for cid in xa:
        rec(int(cid))
    return np.array(out, dtype=np.uint64)


def expand_level(ids, expand_level: int) -> np.ndarray:
    """Add a rim of neighbors at expand_level (s2cell_union.cc:449-465)."""
    a = cellid.as_u64(np.atleast_1d(ids))
    level_lsb = int(cellid.lsb_for_level(expand_level))
    output: list[int] = []
    i = a.size - 1
    while i >= 0:
        cid = a[i:i + 1]
        if int(cellid.lsb(cid)[0]) < level_lsb:
            cid = cellid.parent(cid, expand_level)
            while i > 0 and cellid.contains(cid, a[i - 1:i])[0]:
                i -= 1
        output.append(int(cid[0]))
        output.extend(int(v) for v in
                      cellid.append_all_neighbors(cid, expand_level)[0])
        i -= 1
    return normalize(np.array(output, dtype=np.uint64))


def expand_radius(ids, min_radius_rad: float, max_level_diff: int) -> np.ndarray:
    """Expand by distance (s2cell_union.cc:467-479)."""
    a = cellid.as_u64(np.atleast_1d(ids))
    min_level = int(cellid.level(a).min()) if a.size else cellid.MAX_LEVEL
    radius_level = metrics.MIN_WIDTH.get_level_for_min_value(min_radius_rad)
    if radius_level == 0 and min_radius_rad > metrics.MIN_WIDTH.get_value(0):
        a = expand_level(a, 0)
    return expand_level(a, min(min_level + max_level_diff, radius_level))


def leaf_cells_covered(ids) -> int:
    """Sum of 4^(30-level) (s2cell_union.cc:481-488)."""
    a = cellid.as_u64(np.atleast_1d(ids))
    inv = (np.int64(cellid.MAX_LEVEL) - cellid.level(a)).astype(np.uint64)
    return int((_U(1) << (inv << _U(1))).sum())


def is_normalized(ids) -> bool:
    a = cellid.as_u64(np.atleast_1d(ids))
    if a.size == 0:
        return True
    if not cellid.is_valid(a).all():
        return False
    if a.size > 1:
        if not (cellid.range_max(a)[:-1] < cellid.range_min(a)[1:]).all():
            return False
    for k in range(3, a.size):
        if are_siblings(int(a[k - 3]), int(a[k - 2]), int(a[k - 1]), int(a[k])):
            return False
    return True


def from_begin_end(begin: int, end: int) -> np.ndarray:
    """S2CellUnion::InitFromBeginEnd (s2cell_union.cc:92-108): the
    normalized union covering the half-open LEAF-id range
    [begin, end) — repeatedly take the largest cell starting at the
    cursor that does not extend past `end`.  Both endpoints must be
    leaf ids (leaf ids step by 2; `end` may be the one-past-the-last
    sentinel range_max+2)."""
    return cellid.range_to_cells(int(begin), int(end))


def from_min_max(min_id: int, max_id: int) -> np.ndarray:
    """S2CellUnion::InitFromMinMax (s2cell_union.cc:87-90): inclusive
    leaf range [min_id, max_id]."""
    return from_begin_end(min_id, (int(max_id) + 2)
                          & 0xFFFF_FFFF_FFFF_FFFF)
