"""S2WindingOperation parity against the reference's own fixtures
(s2winding_operation_test.cc:116-286): inputs, reference points,
winding rules and expected loops quoted verbatim; compared as directed
edge multisets on the snapped grid (rotation/segmentation invariant,
orientation preserving — the region-equality the reference's own
ExpectWindingResult checks via an empty symmetric difference)."""

import math

import numpy as np
import pytest

from s2spark.kernels import builder as bld
from s2spark.kernels import winding as wd
from s2spark.kernels.loops import parse_vertices as pv
from s2spark.kernels.region import _latitude, _longitude, latlng_to_point


def _pt(text):
    la, ln = text.split(":")
    return np.asarray(latlng_to_point(math.radians(float(la)),
                                      math.radians(float(ln))))


def _edges(chains, nd=5):
    out = []
    for c in chains:
        ring = [(round(math.degrees(_latitude(p)), nd),
                 round(math.degrees(_longitude(p)), nd)) for p in c]
        out.extend((ring[i], ring[(i + 1) % len(ring)])
                   for i in range(len(ring)))
    return sorted(out)


def _check(loops, refp, refw, rule, want, snap=None):
    chains, state = wd.winding_operation(
        [pv(t) for t in loops], _pt(refp), refw, rule, snap=snap)
    if want in ("", "full"):
        assert state == ("empty" if want == "" else "full"), state
        assert chains == []
        return
    assert _edges(chains) == _edges(
        [pv(t.strip()) for t in want.split(";")]), (rule, refw)


def test_winding_empty():
    _check([], "5:5", 0, "positive", "")
    _check([], "5:5", 1, "positive", "full")


@pytest.mark.parametrize("rule,want", [
    ("positive", "0:0, 0:10, 10:10, 10:0"),
    ("negative", ""),
    ("non_zero", "0:0, 0:10, 10:10, 10:0"),
    ("odd", "0:0, 0:10, 10:10, 10:0"),
])
def test_winding_rectangle(rule, want):
    _check(["0:0, 0:10, 10:10, 10:0"], "5:5", 1, rule, want)


@pytest.mark.parametrize("rule,want", [
    ("positive", "0:0, -5:5, 5:5"),
    ("negative", "-5:-5, 0:0, 5:-5"),
    ("non_zero", "0:0, -5:5, 5:5; -5:-5, 0:0, 5:-5"),
    ("odd", "0:0, -5:5, 5:5; -5:-5, 0:0, 5:-5"),
])
def test_winding_bowtie(rule, want):
    """Self-intersecting loop: the crossing point is inserted and the
    two lobes get windings of opposite sign."""
    _check(["5:-5, -5:5, 5:5, -5:-5"], "10:0", 0, rule, want)


def test_winding_touching_triangles():
    _check(["0:0, 0:8, 8:8", "0:0, 8:8, 8:0"], "1:1", 1, "positive",
           "0:0, 0:8, 8:8, 8:0")
    # ODD also removes the net-zero diagonal bundle (the
    # include_degeneracies=False expectation)
    _check(["0:0, 0:8, 8:8", "0:0, 8:8, 8:0"], "2:2", 1, "odd",
           "0:0, 0:8, 8:8, 8:0")


def test_winding_touching_after_snapping():
    _check(["0.1:0.2, 0:7.8, 7.6:8.2", "0.3:0.2, 8.1:7.8, 7.6:0.4"],
           "6:2", 1, "positive", "0:0, 0:8, 8:8, 8:0",
           snap=bld.IntLatLngSnapFunction(0))


def test_winding_collapsing_shell():
    """Snapping collapses the loop to one site: the SNAPPED winding of
    the reference point changes when edges sweep across it (the
    GetSnappedWindingDelta semantics)."""
    v = pv("0:0, 0:3, 3:3")
    snap = bld.SelectedSitesSnap(
        bld.select_sites([v[0], v[1], v[2]], math.radians(5)))
    _check(["0:0, 0:3, 3:3"], "10:0", 0, "positive", "", snap=snap)
    _check(["0:0, 0:3, 3:3"], "1:1", 1, "positive", "", snap=snap)
    w = pv("0:0, 3:3, 0:3")
    snap2 = bld.SelectedSitesSnap(
        bld.select_sites([w[0], w[1], w[2]], math.radians(5)))
    _check(["0:0, 3:3, 0:3"], "10:0", 1, "positive", "full", snap=snap2)
    _check(["0:0, 3:3, 0:3"], "1:1", 0, "positive", "full", snap=snap2)


SQUARES = ["0:0, 0:4, 4:4, 4:0", "1:1, 1:5, 5:5, 5:1",
           "2:2, 2:6, 6:6, 6:2", "3:3, 3:7, 7:7, 7:3",
           "4:4, 4:8, 8:8, 8:4"]


@pytest.mark.parametrize("refw,rule,want", [
    (1, "positive",
     "7:4, 7:3, 6:3, 6:2, 5:2, 5:1, 4:1, 4:0, 0:0, 0:4, "
     "1:4, 1:5, 2:5, 2:6, 3:6, 3:7, 4:7, 4:8, 8:8, 8:4"),
    (0, "positive",
     "6:4, 6:3, 5:3, 5:2, 4:2, 4:1, 1:1, 1:4, 2:4, 2:5, "
     "3:5, 3:6, 4:6, 4:7, 7:7, 7:4"),
    (-1, "positive",
     "5:4, 5:3, 4:3, 4:2, 2:2, 2:4, 3:4, 3:5, 4:5, 4:6, 6:6, 6:4"),
    (-2, "positive", "3:3, 3:4, 4:4, 4:3; 4:4, 4:5, 5:5, 5:4"),
    (1, "odd",
     "4:1, 4:0, 0:0, 0:4, 1:4, 1:1; "
     "4:3, 4:2, 2:2, 2:4, 3:4, 3:3; "
     "1:4, 1:5, 2:5, 2:4; 5:4, 5:3, 4:3, 4:4; "
     "5:2, 5:1, 4:1, 4:2; 2:5, 2:6, 3:6, 3:5; "
     "6:3, 6:2, 5:2, 5:3; 3:6, 3:7, 4:7, 4:6; "
     "3:4, 3:5, 4:5, 4:4; 7:4, 7:3, 6:3, 6:4; "
     "4:7, 4:8, 8:8, 8:4, 7:4, 7:7; "
     "4:5, 4:6, 6:6, 6:4, 5:4, 5:5"),
])
def test_winding_union_of_squares(refw, rule, want):
    """N-way staircase: ref-winding offsets implement >=k overlap
    selection (s2winding_operation_test.cc:230-286)."""
    _check(SQUARES, "0.5:0.5", refw, rule, want,
           snap=bld.IntLatLngSnapFunction(1))


# -- include_degeneracies variants (ExpectDegenerateWindingResult
#    cases of s2winding_operation_test.cc) --

def _degen(loops, refp, refw, rule, snap=None):
    chains, state = wd.winding_operation(
        [pv(t) for t in loops], _pt(refp), refw, rule, snap=snap,
        include_degeneracies=True)
    return chains, state


def _degen_keys(chains, nd=5):
    out = []
    for c in chains:
        out.append(tuple(sorted(
            (round(math.degrees(_latitude(p)), nd),
             round(math.degrees(_longitude(p)), nd)) for p in c)))
    return sorted(out)


def test_winding_point_loop_degeneracy():
    chains, _ = _degen(["2:2"], "5:5", 0, "positive")
    assert _degen_keys(chains) == [((2.0, 2.0),)]
    # excluded by default
    _check(["2:2"], "5:5", 0, "positive", "")


def test_winding_sibling_pair_degeneracy():
    chains, _ = _degen(["2:2, 3:3"], "5:5", 0, "positive")
    assert _degen_keys(chains) == [((2.0, 2.0), (3.0, 3.0))]
    _check(["2:2, 3:3"], "5:5", 0, "positive", "")


def test_winding_collapsing_shell_degeneracy():
    v = pv("0:0, 0:3, 3:3")
    snap = bld.SelectedSitesSnap(
        bld.select_sites([v[0], v[1], v[2]], math.radians(5)))
    chains, _ = _degen(["0:0, 0:3, 3:3"], "10:0", 0, "positive",
                       snap=snap)
    assert _degen_keys(chains) == [((0.0, 0.0),)]


def test_winding_touching_triangles_odd_degeneracy():
    """With degeneracies the net-zero shared edge is kept in BOTH
    directions and the two triangles stay separate chains."""
    chains, _ = _degen(["0:0, 0:8, 8:8", "0:0, 8:8, 8:0"],
                       "2:2", 1, "odd")
    assert _edges(chains) == _edges(
        [pv("0:0, 0:8, 8:8"), pv("0:0, 8:8, 8:0")])


def test_winding_symmetric_difference_degeneracies():
    """N-way symmetric difference over geometry with degenerate point
    loops: shared features cancel (even multiplicity), the two
    one-sided points survive."""
    loops = ["0:0, 0:3, 3:3, 3:0", "1:1", "2:2", "4:4",
             "0:0, 0:3, 3:3, 3:0", "1:1", "4:4", "5:5"]
    snap = bld.IntLatLngSnapFunction(1)
    chains, state = _degen(loops, "10:10", 0, "odd", snap=snap)
    assert _degen_keys(chains) == [((2.0, 2.0),), ((5.0, 5.0),)]
    chains, state = wd.winding_operation(
        [pv(t) for t in loops], _pt("10:10"), 0, "odd", snap=snap)
    assert chains == [] and state == "empty"
