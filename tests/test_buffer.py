"""Buffer operation: certified interior/exterior guarantees by
sampling, monotonicity, and region containment."""

import numpy as np

from s2spark.kernels import boolean as bk
from s2spark.kernels import buffer as bu
from s2spark.kernels import cellid as ci
from s2spark.kernels.region import Cell
from s2spark.ops import pip


def _leaves(ids) -> int:
    ids = np.asarray(ids, dtype=np.int64)
    return int(ci.lsb(ids.view(np.uint64)).sum()) if len(ids) else 0


def test_buffer_guarantees_by_sampling():
    loop = pip.synth_loops(4)[1]
    r = 0.05
    interior, band = bu.classify_buffer(loop, r, max_level=7)
    assert len(interior) > 0 and len(band) > 0
    # every interior-cell center is truly within r of the region
    centers = np.array([Cell(int(np.uint64(np.int64(c)))).get_center()
                        for c in interior[:200]])
    s = bu._signed_dist(loop, centers)
    assert (s <= r + 1e-12).all()
    # centers of cells NOT covered (sample via band neighbors outside)
    # use random sphere points far from the covering
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(300, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    cells = ci.parent(
        np.array([int(v) for v in _cells_of(pts)], dtype=np.uint64),
        np.int64(7))
    cover = {int(v) for v in interior} | {int(v) for v in band}
    anc_sets = []
    for k, p in enumerate(pts):
        ancs = {int(ci.as_i64(ci.parent(
            np.array([cells[k]], dtype=np.uint64), np.int64(lv)))[0])
            for lv in range(0, 8)}
        anc_sets.append(ancs)
    sd = bu._signed_dist(loop, pts)
    for k in range(len(pts)):
        if not (anc_sets[k] & cover):
            # point in no covering cell => certified outside buffer
            assert sd[k] > r, (k, sd[k])


def _cells_of(pts: np.ndarray):
    from s2spark.kernels import coords
    f, u, v = coords.xyz_to_face_uv(pts[:, 0], pts[:, 1], pts[:, 2])
    si = coords.uv_to_st(u)
    ti = coords.uv_to_st(v)
    i = coords.st_to_ij(si)
    j = coords.st_to_ij(ti)
    return ci.from_face_ij(f, i, j)


def test_buffer_monotone_and_contains_region():
    loop = pip.synth_loops(4)[2]
    i0, _ = bk.classify_loop(loop, 7)
    i1, _ = bu.classify_buffer(loop, 0.0, 7)
    i2, _ = bu.classify_buffer(loop, 0.08, 7)
    # r=0 buffer interior is a (conservative) subset of the region
    assert _leaves(i1) <= _leaves(i0)
    # buffering grows the certified interior past the original region
    assert _leaves(i2) > _leaves(i0)
    # erosion shrinks it
    i3, _ = bu.classify_buffer(loop, -0.03, 7)
    assert _leaves(i3) < _leaves(i1) or _leaves(i1) == 0
