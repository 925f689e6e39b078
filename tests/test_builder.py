"""S2Builder snap-rounding MVP + exact boolean output geometry
(kernels/builder.py) vs the reference's published result loops
(s2loop_test.cc:186-198 diamond pair) and the boolean-op area/interior
identities.  This is the round-3 closure of SURVEY §2.10's two
headline gaps: exact output vertex chains for all four ops, and exact
∪/Δ interiors (via classification against the output geometry)."""

import numpy as np
import pytest

import s2spark.kernels.cellunion as cu
from s2spark.kernels import boolean as bk
from s2spark.kernels import builder as bld
from s2spark.kernels import cellid as ci
from s2spark.kernels.loops import Loop, parse_vertices
from s2spark.ops import pip

LOOP_A = "0:178, -1:180, 0:-179, 1:-180"
LOOP_B = "0:179, -1:180, 0:-178, 1:-180"
A_INTERSECT_B = "0:179, -1:180, 0:-179, 1:-180"
A_UNION_B = "0:178, -1:180, 0:-178, 1:-180"
A_MINUS_B = "0:178, -1:180, 0:179, 1:-180"
B_MINUS_A = "0:-179, -1:180, 0:-178, 1:-180"
MAX_LEVEL = 11


def _canon(v: np.ndarray) -> tuple:
    keys = [tuple(map(float, r)) for r in v]
    k = keys.index(min(keys))
    return tuple(keys[k:] + keys[:k])


def _ab():
    return Loop.from_text(LOOP_A), Loop.from_text(LOOP_B)


@pytest.mark.parametrize("op,fixtures", [
    ("intersection", [A_INTERSECT_B]),
    ("union", [A_UNION_B]),
    ("difference", [A_MINUS_B]),
    ("symmetric_difference", [A_MINUS_B, B_MINUS_A]),
])
def test_diamond_fixture_chains_bit_exact(op, fixtures):
    """Output vertex chains equal the reference's published result
    loops BIT-FOR-BIT (crossings at shared vertices -> outputs are
    input vertices)."""
    a, b = _ab()
    out = bld.overlay_geometry(a, b, op)
    got = sorted(_canon(c) for c in out)
    want = sorted(_canon(parse_vertices(t)) for t in fixtures)
    assert got == want


def test_overlay_geometry_deterministic():
    la = pip.synth_loops(3)
    lb = pip.synth_loops(3, shift_u=0.06)
    for pid in range(3):
        o1 = bld.overlay_geometry(la[pid], lb[pid], "union")
        o2 = bld.overlay_geometry(la[pid], lb[pid], "union")
        assert len(o1) == len(o2)
        for c1, c2 in zip(o1, o2):
            assert np.array_equal(c1, c2)


def test_area_inclusion_exclusion_on_synth_pairs():
    """|A|+|B| = |A∪B|+|A∩B|, |A−B| = |A|−|A∩B|, |AΔB| = |A∪B|−|A∩B|
    over the output geometry (parity-signed areas)."""
    la = pip.synth_loops(6)
    lb = pip.synth_loops(6, shift_u=0.06)

    def parity_area(chains):
        tot = 0.0
        for c in chains:
            lp = Loop(c)
            if lp.get_curvature() >= 0:
                tot += lp.get_area()
            else:
                tot -= 4 * np.pi - lp.get_area()
        return tot

    for pid in range(6):
        a, b = la[pid], lb[pid]
        ar = {op: parity_area(bld.overlay_geometry(a, b, op))
              for op in bld.OPS}
        assert abs(a.get_area() + b.get_area()
                   - ar["union"] - ar["intersection"]) < 1e-12
        assert abs(ar["difference"]
                   - (a.get_area() - ar["intersection"])) < 1e-12
        assert abs(ar["symmetric_difference"]
                   - (ar["union"] - ar["intersection"])) < 1e-12


def test_containment_emits_hole():
    """B strictly inside A: A−B = shell + CW hole; A∩B = B; A∪B = A."""
    big = Loop.from_latlng_degrees([[10, 10], [10, 40], [40, 40],
                                    [40, 10]])
    small = Loop.from_latlng_degrees([[20, 20], [20, 30], [30, 30],
                                      [30, 20]])
    d = bld.overlay_geometry(big, small, "difference")
    assert len(d) == 2
    curv = sorted(Loop(c).get_curvature() for c in d)
    assert curv[0] < 0 < curv[1]  # one hole (CW), one shell (CCW)
    i = bld.overlay_geometry(big, small, "intersection")
    assert len(i) == 1 and _canon(i[0]) == _canon(small.vertices)
    u = bld.overlay_geometry(big, small, "union")
    assert len(u) == 1 and _canon(u[0]) == _canon(big.vertices)


def test_disjoint():
    big = Loop.from_latlng_degrees([[10, 10], [10, 40], [40, 40],
                                    [40, 10]])
    far = Loop.from_latlng_degrees([[-20, -120], [-20, -110],
                                    [-10, -110], [-10, -120]])
    assert bld.overlay_geometry(big, far, "intersection") == []
    assert len(bld.overlay_geometry(big, far, "union")) == 2
    assert len(bld.overlay_geometry(big, far,
                                    "symmetric_difference")) == 2


@pytest.mark.parametrize("op,fixtures", [
    ("union", [A_UNION_B]),
    ("symmetric_difference", [A_MINUS_B, B_MINUS_A]),
])
def test_union_symdiff_interiors_now_exact(op, fixtures):
    """Round-2's conservative band is CLOSED: classifying cells against
    the OUTPUT geometry (ResultRegion) reproduces the reference result
    loops' interior cell set exactly — zero refinement term."""
    a, b = _ab()
    rr = bld.ResultRegion(bld.overlay_geometry(a, b, op))
    got_i, _ = bk.classify_loop(rr, MAX_LEVEL)
    want = np.concatenate([bk.classify_loop(Loop.from_text(t),
                                            MAX_LEVEL)[0]
                           for t in fixtures])
    got_n = cu.normalize(np.asarray(got_i).view(np.uint64))
    want_n = cu.normalize(np.asarray(want).view(np.uint64))
    assert np.array_equal(np.sort(got_n), np.sort(want_n))
    assert len(got_n) > 0


def test_snap_rounding_cellid_sites():
    """CellIdSnapFunction(level): every output vertex is the center of
    its level-L cell; sites are distinct; each snapped vertex is
    within the level-L cell circumradius of some input/crossing
    vertex (the snap displacement bound)."""
    from s2spark.kernels.region import Cell
    la = pip.synth_loops(4)
    lb = pip.synth_loops(4, shift_u=0.06)
    level = 14
    snap = bld.CellIdSnapFunction(level)
    for pid in range(4):
        exact = bld.overlay_geometry(la[pid], lb[pid], "intersection")
        snapped = bld.overlay_geometry(la[pid], lb[pid],
                                       "intersection", snap=snap)
        for c in snapped:
            cells = ci.parent(ci.from_xyz(c[:, 0], c[:, 1], c[:, 2]),
                              level)
            centers = np.array([Cell(int(x)).get_center()
                                for x in cells])
            assert np.array_equal(centers, c)
            assert len(set(cells.tolist())) == len(c)
        # vertex count is preserved here (snap well below vertex
        # separation for these loops)
        assert sum(len(c) for c in snapped) == sum(len(c)
                                                   for c in exact)


def test_snapped_chains_are_valid_loops():
    from s2spark.ops.validate import _loop_error
    la = pip.synth_loops(4)
    lb = pip.synth_loops(4, shift_u=0.06)
    snap = bld.CellIdSnapFunction(14)
    for pid in range(4):
        for op in bld.OPS:
            for c in bld.overlay_geometry(la[pid], lb[pid], op,
                                          snap=snap):
                assert _loop_error(c) is None
