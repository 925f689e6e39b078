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


# ---------------------------------------------------------------------------
# buffer_geometry (output polygon, s2buffer_operation.cc layer)

import math

from s2spark.kernels.loops import Loop


def _cap_loop(axis, rho, n=64):
    axis = np.asarray(axis, dtype=np.float64)
    axis /= np.linalg.norm(axis)
    h = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0, 1.0, 0])
    e1 = np.cross(axis, h)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(axis, e1)
    t = np.arange(n) / n * 2 * math.pi
    pts = (math.cos(rho) * axis[None, :]
           + math.sin(rho) * (np.cos(t)[:, None] * e1[None, :]
                              + np.sin(t)[:, None] * e2[None, :]))
    lp = Loop(pts)
    return (lp if lp.contains_points(axis[None, :])[0]
            else Loop(pts[::-1])), axis


def test_buffer_geometry_cap_is_grown_circle():
    """The buffer of a spherical circle is EXACTLY the grown circle:
    every output vertex sits at rho+r from the center (within the
    tessellation budget) and containment probes flip at rho+r."""
    lp, axis = _cap_loop([0.3, -0.5, 0.81], 0.2)
    for r in (0.1, -0.08):
        chain = bu.buffer_geometry(lp, r)
        ang = np.arccos(np.clip(chain @ axis, -1, 1))
        assert abs(ang.min() - (0.2 + r)) < 2e-3
        assert abs(ang.max() - (0.2 + r)) < 2e-3
        blp = Loop(chain)
        e1 = np.cross(axis, [1.0, 0, 0])
        e1 /= np.linalg.norm(e1)
        inner = math.cos(0.2 + r - 0.01) * axis + math.sin(0.2 + r - 0.01) * e1
        outer = math.cos(0.2 + r + 0.01) * axis + math.sin(0.2 + r + 0.01) * e1
        assert bool(blp.contains_points(inner[None, :])[0])
        assert not bool(blp.contains_points(outer[None, :])[0])
        assert bool(blp.contains_points(axis[None, :])[0])


def test_buffer_geometry_certification_sandwich():
    """classify_loop(Loop(buffer_geometry)) must sit inside the
    certified classify_buffer envelope: interior ⊇ certified interior
    and ⊆ certified interior ∪ band (the geometry's error budget is
    far inside the level-7 band width)."""
    from s2spark.kernels import cellunion as cu
    loop = pip.synth_loops(4)[1]
    for r in (0.05, -0.02):
        cert_in, cert_band = bu.classify_buffer(loop, r, max_level=7)
        chain = bu.buffer_geometry(loop, r)
        geom_in, geom_band = bk.classify_loop(Loop(chain), 7)
        cert_in_u = np.sort(np.asarray(cert_in, dtype=np.int64)
                            .view(np.uint64))
        cover_u = cu.normalize(np.concatenate([
            np.asarray(cert_in, dtype=np.int64).view(np.uint64),
            np.asarray(cert_band, dtype=np.int64).view(np.uint64)]))
        geom_in_u = np.asarray(geom_in, dtype=np.int64).view(np.uint64)
        # certified interior ⊆ geometry interior ∪ its band closure:
        # every certified-interior cell is inside the geometry region
        got = cu.contains_cell(
            cu.normalize(np.concatenate([
                geom_in_u,
                np.asarray(geom_band, dtype=np.int64).view(np.uint64)])),
            cert_in_u)
        assert got.all()
        # geometry interior never escapes the certified covering
        assert cu.contains_cell(cover_u, geom_in_u).all()


def test_buffer_geometry_zero_radius_identity():
    loop = pip.synth_loops(2)[1]
    chain = bu.buffer_geometry(loop, 0.0)
    assert np.array_equal(chain, loop.vertices)
