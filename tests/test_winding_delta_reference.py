"""GetSnappedWindingDelta battery — the deterministic fixtures of
s2builderutil_get_snapped_winding_delta_test.cc (ExpectWindingDelta
cases through ComplexExample) against winding.get_snapped_winding_delta.

ForceVertex + IdentitySnapFunction(radius) is emulated with
builder.select_sites(forced + input vertices, radius) +
SelectedSitesSnap — identical semantics (forced sites first, then
greedy min-separation selection in input order).

Not pinned: the three 64-67 degree snap-radius cases
(EnsureZaZbNotInVoronoiRegion, VoronoiExclusionBug) that exercise the
reference's edge-to-multi-site CHAIN snapping (an edge whose
perpendicular bisectors make it snap through several Voronoi sites);
the engine's snap model maps each crossing-subdivided edge to the
single snapped edge between its endpoint sites, so those extreme
configurations are outside its domain (EnsureChainDiffLoopIsClosed,
whose delta is 0 either way, does agree)."""

import numpy as np
import pytest

from s2spark.kernels import builder as bld
from s2spark.kernels import winding as wd


def pt(s):
    lat, lng = (float(x) for x in s.split(":"))
    phi, lam = np.radians(lat), np.radians(lng)
    return np.array([np.cos(phi) * np.cos(lam),
                     np.cos(phi) * np.sin(lam), np.sin(phi)])


def expect_winding_delta(loops_str, forced_str, radius_deg, expected):
    """ExpectWindingDelta (test .cc:110-128): first loop's vertex is
    the degenerate reference vertex."""
    loops = [np.array([pt(t.strip()) for t in lp.split(",")])
             for lp in loops_str.split(";")]
    ref = loops[0][0]
    body = loops[1:]
    forced = ([pt(t.strip()) for t in forced_str.split(",")]
              if forced_str else [])
    allv = forced + [ref] + [v for lp in body for v in lp]
    sites = bld.select_sites(allv, np.radians(radius_deg))
    snap = bld.SelectedSitesSnap(sites)
    got = wd.get_snapped_winding_delta(body, ref, snap)
    assert got == expected, (loops_str, got, expected)


CASES = [
    # (name, loops, forced vertices, snap radius deg, expected delta)
    ("NoOtherEdges", "0:0", "0:0", 10.0, 0),
    ("DegenerateInputLoops", "0:0; 1:1; 2:2", "0:0", 10.0, 0),
    ("DuplicateDegenerateInputLoops",
     "0:0; 0:0; 1:1; 1:1", "0:0", 10.0, 0),
    ("CollapsingShell", "0:0; 1:1, 1:-2, -2:1", "0:0", 10.0, -1),
    ("CollapsingHole", "0:0; 1:1, -2:1, 1:-2", "0:0", 10.0, +1),
    ("CollapsingDoubleShell",
     "0:0; 1:1, 1:-2, -2:1, 2:2, 2:-3, -3:2", "0:0", 10.0, -2),
    ("ExternalLoopRefVertexStaysOutside",
     "0:0; 20:0, 0:0, 0:20", "0:0", 10.0, 0),
    ("ExternalLoopRefVertexStaysInside",
     "0:0; 0:-20, 0:0, 20:0", "0:0", 10.0, 0),
    ("ExternalLoopRefVertexMovesInside",
     "1:1; 0:-20, 1:-1, 20:0", "0:0", 10.0, +1),
    ("CrossingEdgeRefVertexStaysOutside",
     "-1:-1; 20:-20, -20:20, 20:20", "0:0", 10.0, 0),
    ("CrossingEdgeRefVertexMovesOutside",
     "1:1; 20:-20, -20:20, 20:20", "0:0", 10.0, -1),
    ("ExternalLoopDoubleHoleToSingleHole",
     "4:4; 0:20, 3:3, 6:3, 2:7, 2:2, 2:20", "0:0", 10.0, +1),
    ("ExternalLoopDoubleHoleToSingleShell",
     "4:4; 0:-20, 6:2, 2:6, 2:2, 6:2, 2:6, 2:2, 20:0",
     "0:0", 10.0, +3),
    ("ExternalEdgesCrossSnapToSameVertex",
     "1:1; -5:30, 7:-3, -7:-3, 5:30", "0:0, 0:15", 10.0, -1),
    ("ExternalEdgesCrossSnapToDifferentVertices",
     "1:1; -5:40, 7:-3, -7:-3, 5:40", "0:0, 6:10, -6:10", 10.0, -1),
    ("RefPointWindingChange_Za",
     "1:1; 70:-179.99, 5:0, 0:5, -0.01:110", "0:0, 1:90", 10.0, 0),
    ("RefPointWindingChange_Zb",
     "1:1; 70:-179.99, 5:0, 0:5, -0.01:110", "0:0, 89:90", 10.0, 0),
    ("RefPointWindingChange_ZaZb",
     "1:1; 70:-179.99, 5:0, 0:5, -0.01:110",
     "0:0, 1:90, 89:90", 10.0, 0),
    ("RefPointWindingChange_ZaOpposite",
     "1:1; 70:179.99, 5:0, 0:5, 0:110", "0:0, -1:20, 1:90", 10.0, 0),
    ("ComplexExample",
     "1:1; 70:179.99, 5:0, 0:5, 0:110; "
     "70:179.99, 0:0, 0:3, 3:0, 0:-1, 0:110; "
     "10:-10, -10:10, 10:10; "
     "2:2, 1:-2, -1:2, 2:2, 1:-2, -1:2",
     "0:0, -1:90, 1:90, 45:-5", 10.0, -5),
    ("EnsureChainDiffLoopIsClosed",
     "8:26, 8:26; -36:70, -64:-35, -41:48", "", 66.0, 0),
]


@pytest.mark.parametrize(
    "loops,forced,radius,expected",
    [c[1:] for c in CASES], ids=[c[0] for c in CASES])
def test_get_snapped_winding_delta(loops, forced, radius, expected):
    expect_winding_delta(loops, forced, radius, expected)
