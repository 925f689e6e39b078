"""S2Fractal-analogue stress suite (kernels/fractal.py; reference
s2fractal.h:16-80): the smooth synth_loops under-test skinny/self-near
boundaries, so every geometric guarantee gets re-probed over Koch
fractal loops — validity, containment consistency, coverer superset,
boolean overlay identities, and the edge-cell index PIP path."""

import math

import numpy as np
import pytest

from s2spark.kernels import boolean as bk
from s2spark.kernels import builder as bld
from s2spark.kernels import cellid as ci
from s2spark.kernels.coverer import RegionCoverer
from s2spark.kernels.fractal import Fractal, fractal_loops
from s2spark.kernels.loops import Loop
from s2spark.ops.validate import _loop_error

KOCH = math.log(4) / math.log(3)


@pytest.mark.parametrize("dim", [1.1, KOCH, 1.4])
def test_fractal_loops_valid_and_ccw(dim):
    for pid, lp in fractal_loops(6, max_level=3,
                                 dimension=dim).items():
        assert _loop_error(lp.vertices) is None, pid
        assert lp.get_curvature() > 0          # CCW shell
        assert 0 < lp.get_area() < 4 * math.pi


def test_multi_level_fractal_edge_counts():
    """Multi-level subdivision: vertex count varies per edge level in
    [min,max]; all loops stay simple."""
    loops = fractal_loops(8, max_level=4, min_level=2)
    ns = sorted({lp.n for lp in loops.values()})
    assert len(ns) > 1                         # levels actually mix
    assert all(_loop_error(lp.vertices) is None
               for lp in loops.values())
    # bounds: all edges at min level / all at max level
    assert ns[0] >= 3 * 4 ** 2 and ns[-1] <= 3 * 4 ** 4


def test_fractal_determinism():
    a = Fractal(seed=7, max_level=3).make_loop((1.0, 0.2, 0.1), 0.05)
    b = Fractal(seed=7, max_level=3).make_loop((1.0, 0.2, 0.1), 0.05)
    assert np.array_equal(a.vertices, b.vertices)
    c = Fractal(seed=8, max_level=3).make_loop((1.0, 0.2, 0.1), 0.05)
    assert not np.array_equal(a.vertices, c.vertices)


def test_center_inside_deep_concavities_outside():
    """The fractal center is interior; points beyond the circumradius
    are exterior — crossing-parity containment must agree on both."""
    f = Fractal(seed=3, max_level=4)
    c = np.array([0.3, -0.8, 0.5])
    c /= np.linalg.norm(c)
    lp = f.make_loop(c, 0.06)
    assert lp.contains_point(tuple(c))
    far = -c  # antipode
    assert not lp.contains_point(tuple(far))


def test_coverer_superset_on_fractals():
    """Every vertex of the fractal lies inside some covering cell —
    the superset guarantee re-probed on skinny geometry."""
    for pid, lp in fractal_loops(4, max_level=3).items():
        rc = RegionCoverer(max_cells=32, max_level=12)
        cover = np.array(rc.get_covering(lp), dtype=np.uint64)
        lo = ci.range_min(cover).astype(np.int64)
        hi = ci.range_max(cover).astype(np.int64)
        v = lp.vertices
        leafs = ci.as_i64(ci.from_xyz(v[:, 0], v[:, 1], v[:, 2]))
        for leaf in leafs:
            assert ((lo <= leaf) & (leaf <= hi)).any(), pid


def test_classify_loop_interior_consistency_fractal():
    """classify_loop interior cells truly sit inside: their centers
    pass the exact crossing-parity test."""
    from s2spark.kernels.region import Cell
    lp = fractal_loops(2, max_level=3)[1]
    interior, boundary = bk.classify_loop(lp, 9)
    assert len(interior) > 0
    centers = np.array([Cell(int(c)).get_center() for c in interior])
    assert lp.contains_points(centers).all()


def test_overlay_geometry_identities_on_fractals():
    """Boolean output geometry over two overlapping fractals satisfies
    area inclusion-exclusion and outputs valid loops (the round-3
    builder stressed by self-near boundaries)."""
    a = fractal_loops(3, max_level=3, nominal_radius=0.08)[0]
    f = Fractal(seed=99, max_level=3)
    # center shifted ~half a radius from loop 0's center
    from s2spark.sources import geo
    x, y, z = geo.xyz_np(np.array([0], dtype=np.int64))
    c = np.array([x[0], y[0], z[0]])
    ref = np.array([0.0, 0.0, 1.0]) if abs(c[2]) < 0.9 \
        else np.array([1.0, 0.0, 0.0])
    u = np.cross(c, ref)
    u /= np.linalg.norm(u)
    c2 = c + 0.05 * u
    c2 /= np.linalg.norm(c2)
    b = f.make_loop(c2, 0.08)

    def parity_area(chains):
        tot = 0.0
        for ch in chains:
            q = Loop(ch)
            if q.get_curvature() >= 0:
                tot += q.get_area()
            else:
                tot -= 4 * math.pi - q.get_area()
        return tot

    ar = {}
    for op in bld.OPS:
        chains = bld.overlay_geometry(a, b, op)
        for ch in chains:
            assert _loop_error(ch) is None
        ar[op] = parity_area(chains)
    assert ar["intersection"] > 0  # they do overlap
    assert abs(a.get_area() + b.get_area()
               - ar["union"] - ar["intersection"]) < 1e-10
    assert abs(ar["symmetric_difference"]
               - (ar["union"] - ar["intersection"])) < 1e-10


def test_pip_join_on_fractal_index(spark):
    """The distributed edge-cell-index PIP join agrees with brute
    crossing parity over fractal polygons."""
    from s2spark import dataset
    from s2spark.ops import pip
    from tests.conftest import SF_DIR
    loops = fractal_loops(5, max_level=3, nominal_radius=0.3)
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .where("event_id % 5 = 0") \
        .select("event_id", "cell_id", "x", "y", "z")
    got = {(r["event_id"], r["poly_id"])
           for r in pip.pip_join(ev, spark, loops,
                                 point_id="event_id").collect()}
    pts = ev.select("event_id", "x", "y", "z").toPandas()
    p = pts[["x", "y", "z"]].to_numpy(np.float64)
    want = set()
    for pid, lp in loops.items():
        inside = lp.contains_points(p)
        want |= {(int(e), pid) for e, ok in
                 zip(pts["event_id"], inside) if ok}
    assert got == want and len(want) > 0
