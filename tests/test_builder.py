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


# ---------------------------------------------------------------------------
# round 3: snap-stability iteration, polyline layer, S2Builder facade


def _no_proper_crossings(chains, closed=True):
    """True iff no two edges of the output chains properly cross
    (shared-vertex touches are legal output)."""
    from s2spark.kernels import predicates
    edges = []
    for c in chains:
        k = c.shape[0] if closed else c.shape[0] - 1
        for i in range(k):
            edges.append((c[i], c[(i + 1) % c.shape[0]]))
    n = len(edges)
    if n < 2:
        return True
    p0 = np.array([e[0] for e in edges])
    p1 = np.array([e[1] for e in edges])
    a0 = np.repeat(p0, n, axis=0)
    a1 = np.repeat(p1, n, axis=0)
    b0 = np.tile(p0, (n, 1))
    b1 = np.tile(p1, (n, 1))
    cs = predicates.crossing_sign(a0, a1, b0, b1).reshape(n, n)
    iu = np.triu_indices(n, k=1)
    return not (cs[iu] > 0).any()


def test_stabilize_splits_crossing_polylines():
    """Two properly-crossing geodesics fed to the polyline layer are
    split at their (exact) intersection: the output passes through a
    shared site and is crossing-free."""
    a0 = parse_vertices("-1:-1")[0]
    a1 = parse_vertices("1:1")[0]
    b0 = parse_vertices("-1:1")[0]
    b1 = parse_vertices("1:-1")[0]
    b = bld.S2Builder()
    b.add_edge(a0, a1).add_edge(b0, b1)
    chains = b.build_polylines()
    assert len(chains) == 2
    # each input edge became two sub-edges through the crossing site
    assert all(c.shape[0] == 3 for c in chains)
    # the middle vertices are the SAME exact point on both chains
    assert np.array_equal(chains[0][1], chains[1][1])
    assert _no_proper_crossings(chains, closed=False)


def test_polygon_layer_resolves_crossing_loop_soup():
    """Two overlapping triangle boundaries fed raw to the polygon
    layer (no boolean classification): snap stabilization splits the
    boundary crossings, and the stitched faces are crossing-free."""
    t1 = Loop.from_text("0:0, 0:4, 4:2")
    t2 = Loop.from_text("1:-1, 1:5, -2:2")
    b = bld.S2Builder()
    b.add_loop(t1).add_loop(t2)
    chains = b.build_polygon()
    assert chains, "stitching produced no faces"
    assert _no_proper_crossings(chains, closed=True)
    # every input vertex survives somewhere in the arrangement
    out = {tuple(v) for c in chains for v in c}
    for v in np.vstack([t1.vertices, t2.vertices]):
        assert tuple(v) in out


def test_coarse_snap_overlay_is_crossing_free():
    """The thin-lens pair whose boundaries run ~0.005 rad apart,
    snapped at a level whose cells are comparable to that gap: round-2
    required callers to pick a fine snap level or risk snap-induced
    crossings; the stabilization loop now guarantees crossing-free
    output at ANY level."""
    from tests.test_boolean import _cap_loop
    a = _cap_loop(0.0, 30.0, 0.15, nv=64)
    lensb = _cap_loop(0.0, 30.0 + np.degrees(0.295), 0.15, nv=64)
    for level in (8, 9, 10):
        chains = bld.overlay_geometry(
            a, lensb, "union", snap=bld.CellIdSnapFunction(level))
        assert _no_proper_crossings(chains, closed=True), level


def test_build_polylines_roundtrip_and_merge():
    """Identity snap: a polyline round-trips exactly; two polylines
    sharing an interior vertex assemble deterministically with every
    edge preserved; duplicate directed edges merge."""
    pts = parse_vertices("0:0, 0:2, 2:2, 2:4")
    b = bld.S2Builder()
    b.add_polyline(pts)
    chains = b.build_polylines()
    assert len(chains) == 1
    assert np.array_equal(chains[0], pts)
    # Y-shape: a->b->c plus b->d
    y = bld.S2Builder()
    y.add_polyline(parse_vertices("0:0, 1:1, 2:2"))
    y.add_polyline(parse_vertices("1:1, 0:3"))
    got = y.build_polylines()
    assert sum(c.shape[0] - 1 for c in got) == 3
    assert len(got) == 2
    # duplicate directed edge merges to one
    d = bld.S2Builder()
    e0, e1 = parse_vertices("5:5, 5:7")
    d.add_edge(e0, e1).add_edge(e0, e1)
    got = d.build_polylines()
    assert len(got) == 1 and got[0].shape[0] == 2


def test_build_polylines_snap_collapse():
    """CellId snapping collapses consecutive vertices that share a
    snap cell and emits level-L cell centers."""
    pts = parse_vertices("10:10, 10:10.001, 10:12, 10:14")
    snap = bld.CellIdSnapFunction(6)
    chains = bld.build_polylines([(pts[i], pts[i + 1])
                                  for i in range(3)], snap=snap)
    assert len(chains) == 1
    keys = [snap.site_key(p) for p in pts]
    # first two points share the level-6 cell -> one site
    assert keys[0] == keys[1]
    want = []
    for k in keys:
        if not want or want[-1] != k:
            want.append(k)
    got_keys = [snap.site_key(p) for p in chains[0]]
    assert got_keys == want
    for p, k in zip(chains[0], got_keys):
        assert np.array_equal(p, snap.site_point(k, p))


def test_facade_polygon_roundtrip_and_cycles():
    """add_loop + build_polygon with identity snap reproduces a single
    loop exactly (canonical rotation aside) and emits two chains for
    two disjoint loops; a closed chain fed to the polyline layer comes
    back as one cycle."""
    lp = Loop.from_text("0:0, 0:4, 4:4, 4:0")
    chains = bld.S2Builder().add_loop(lp).build_polygon()
    assert len(chains) == 1
    got = {tuple(v) for v in chains[0]}
    assert got == {tuple(v) for v in lp.vertices}
    two = (bld.S2Builder()
           .add_loop(Loop.from_text("0:0, 0:2, 2:1"))
           .add_loop(Loop.from_text("10:10, 10:12, 12:11"))
           .build_polygon())
    assert len(two) == 2
    cyc = bld.S2Builder().add_loop(lp).build_polylines()
    assert len(cyc) == 1
    assert np.array_equal(cyc[0][0], cyc[0][-1])  # closed chain


def test_stabilize_prefilter_matches_dense():
    """Above DENSE_STABILIZE_LIMIT the crossing stabilizer prunes
    candidate pairs through cell co-location; the resulting edge set
    must equal the dense all-pairs path bit-for-bit."""
    import numpy as np
    import s2spark.kernels.builder as bld
    rng = np.random.default_rng(11)
    # chord soup in a small cap (lots of real crossings)
    c = np.array([1.0, 0.0, 0.0])
    pts = c + 0.05 * rng.normal(size=(80, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    kept = [(pts[i], pts[(i * 37 + 13) % 80])
            for i in range(80)
            if not np.array_equal(pts[i], pts[(i * 37 + 13) % 80])]
    snap = bld.IdentitySnapFunction()
    seen, sites = bld._snap_edges(kept, snap)
    edges = bld._cancel_siblings(seen)
    old = bld.DENSE_STABILIZE_LIMIT
    try:
        bld.DENSE_STABILIZE_LIMIT = 10**9
        dense = bld._stabilize_crossings(list(edges), dict(sites), snap)
        bld.DENSE_STABILIZE_LIMIT = 0
        pruned = bld._stabilize_crossings(list(edges), dict(sites), snap)
    finally:
        bld.DENSE_STABILIZE_LIMIT = old
    assert sorted(dense) == sorted(pruned)
    assert len(dense) > len(edges)  # crossings actually split


def test_partial_collinear_overlap_escalates():
    """ADVICE r3: partially-overlapping collinear edges (no bit-exact
    shared sub-edges) make midpoint classification ill-posed — the
    overlay must raise, not silently classify."""
    import pytest
    from s2spark.kernels.loops import Loop
    a = Loop.from_latlng_degrees(np.array(
        [(0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 0.0)]))
    # B's top edge runs along the equator from lng 3 to lng 1 —
    # collinear with A's bottom edge but with different endpoints
    b = Loop.from_latlng_degrees(np.array(
        [(0.0, 1.0), (-2.0, 1.0), (-2.0, 3.0), (0.0, 3.0)]))
    with pytest.raises(ValueError, match="collinear"):
        bld.overlay_geometry([a], [b], "union")


# -- FindPolygonDegeneracies
# (s2builderutil_find_polygon_degeneracies_test.cc:151-213) --

def _degeneracies(text):
    import math

    from s2spark.kernels.region import _latitude, _longitude
    parts = [] if not text.strip() else [t.strip()
                                         for t in text.split(";")]
    loops = []
    for t in parts:
        if t == "full":
            loops.append("full")
        else:
            from s2spark.kernels.loops import parse_vertices
            loops.append(parse_vertices(t))
    out, _ = bld.find_polygon_degeneracies(loops)

    def key(p):
        return f"{round(math.degrees(_latitude(p))):g}:" \
               f"{round(math.degrees(_longitude(p))):g}"

    return sorted((key(a) + ", " + key(b), hole) for a, b, hole in out)


def test_find_polygon_degeneracies_reference_fixtures():
    assert _degeneracies("") == []
    assert _degeneracies("0:0, 0:1, 1:0") == []
    assert _degeneracies("0:0") == [("0:0, 0:0", False)]
    assert _degeneracies("0:0, 0:1, 1:0; 1:0, 0:1, 0:0") == sorted([
        ("0:0, 0:1", False), ("0:1, 0:0", False), ("0:1, 1:0", False),
        ("1:0, 0:1", False), ("0:0, 1:0", False), ("1:0, 0:0", False)])
    assert _degeneracies("0:0, 0:1, 1:0; 1:0, 2:0") == sorted([
        ("1:0, 2:0", False), ("2:0, 1:0", False)])
    assert _degeneracies("0:0, 0:3, 3:0; 0:0, 1:1") == sorted([
        ("0:0, 1:1", True), ("1:1, 0:0", True)])
    assert _degeneracies("0:0, 0:3, 3:0; 3:0, 1:1; 3:0, 5:5") == sorted([
        ("3:0, 1:1", True), ("1:1, 3:0", True),
        ("3:0, 5:5", False), ("5:5, 3:0", False)])
    assert _degeneracies("0:0, 0:3, 3:3, 3:0; 4:4, 5:5; 6:6") == sorted([
        ("4:4, 5:5", False), ("5:5, 4:4", False), ("6:6, 6:6", False)])
    assert _degeneracies("0:0, 0:5, 5:5, 5:0; 1:1, 2:2; 3:3") == sorted([
        ("1:1, 2:2", True), ("2:2, 1:1", True), ("3:3, 3:3", True)])
    assert _degeneracies("full; 0:0") == [("0:0, 0:0", True)]
    assert _degeneracies("full; 0:0, 0:1, 1:0; 1:0, 0:1, 0:0") == sorted([
        ("0:0, 0:1", True), ("0:1, 0:0", True), ("0:1, 1:0", True),
        ("1:0, 0:1", True), ("0:0, 1:0", True), ("1:0, 0:0", True)])
