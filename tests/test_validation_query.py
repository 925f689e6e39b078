"""S2ValidQuery / S2LegacyValidQuery reference-fixture parity.

Every textual fixture from s2validation_query_test.cc:410-908 plus the
cell-center, quilt, antipodal, and concentric-crossing batteries.
Applicability 'both' runs under both query classes, 'valid' only under
S2ValidQuery, 'legacy' only under S2LegacyValidQuery — mirroring the
reference's AllValidationQueries / MultiDimensionalQueries /
S2ValidTest / S2LegacyValidTest suites.
"""

import math
import random

import numpy as np
import pytest

from s2spark.kernels import cellid
from s2spark.kernels import validation as V
from s2spark.kernels.region import Cell

ORIENT = "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"
OVERLAP = "OVERLAPPING_GEOMETRY"

# (geometry, applicability, expected_valid, expected_code-or-None)
TEXT_CASES = [
    # AllValidationQueries.BasicGeometryOk (test.cc:410-432)
    ("## 1:0, 0:-1, -1:0, 0:1", "both", True, "OK"),
    ("# 0:0, 1:0, 0:-1, -1:0, 0:1 #", "both", True, "OK"),
    ("0:0 | 1:0 | 0:-1 | -1:0 | 0:1 ##", "both", True, "OK"),
    ("## 2:0, 0:-2, -2:0, 0:2; 0:1, -1:0, 0:-1, 1:0", "both", True, "OK"),
    ("## 2:0, 0:-2, -2:0, 0:2; 1:0, 0:-1, -1:0, 0:1", "both", False, ORIENT),
    # EmptyGeometryOk / FullGeometryOk (test.cc:434-440)
    ("##", "both", True, "OK"),
    ("## full", "both", True, "OK"),
    # InteriorOnRightRegression (test.cc:442-448)
    ("## 0:4, 3:128, 4:2, 0:0", "both", True, "OK"),
    # TangentPolygonsOk (test.cc:450-456)
    ("## 1:0, 0:-1, -1:0, 0:1 |  0:1, -1:2,  0:3, 1:2", "both", True, "OK"),
    # DuplicatePolygonEdgesFail (test.cc:479-485)
    ("## 2:0, 0:-2, -2:0, 0:2 | 2:0, 0:-2,  0:0", "both", False, OVERLAP),
    # ChainsTouchingOk (test.cc:487-504)
    ("## 2:0, 0:-2, -2:0, 0:2; 0:2, -1:0, 0:-1, 1:0", "both", True, "OK"),
    ("## 2:0, 0:-2, -2:0, 0:2; 0:1, -2:0, 0:-1, 1:0", "both", True, "OK"),
    ("## 2:0,  0:-2, -2:0, 0:2; 1:0,  0:-2, -1:0, 0:2", "both", False, ORIENT),
    # NestedShellsFail (test.cc:506-544)
    ("## 2:0, 0:-2, -2:0, 0:2; 2:0, 0:-1, -1:0, 0:1", "both", False, ORIENT),
    ("## 2:0, 0:-2, -2:0, 0:2; 2:0, 0:-1, -2:0, 0:1", "both", False, ORIENT),
    ("## 2:0, 0:-2, -2:0, 0:2; 1:0, 0:-2, -1:0, 0:1", "both", False, ORIENT),
    ("## 2:0, 0:-2, -2:0, 0:2; 1:0, 0:-1, -2:0, 0:1", "both", False, ORIENT),
    ("## 2:0, 0:-2, -2:0, 0:2; 1:0, 0:-1, -1:0, 0:2", "both", False, ORIENT),
    # ChainsCannotCross (test.cc:546-564).  The first case's specific code
    # depends on the reference's cell decomposition (it reports the
    # orientation error its cell-local winding check happens to hit
    # first); both engines agree the geometry is invalid.
    ("## 3:0, 0:-3, -3:0, 0:+3; 3:2, 0:-1, -3:2, 0:+5", "both", False, None),
    ("## 0:3, 3:0,   0:-3, -3:0; 3:2, 0:+5, -3:2,  0:-1",
     "both", False, OVERLAP),
    ("## 0:-6, -6:0, 0:6, 6:0 ; 0:0,   3:0, 6:0, 6:3, 6:6, 3:6, 0:6, 0:3",
     "both", False, OVERLAP),
    # ShellInHoleFails (test.cc:566-570)
    ("## 0:0, 10:10, 10:0; 5:21, 8:21, 6:23", "both", False, ORIENT),
    # MultiDimensionalQueries (test.cc:696-729)
    ("3:0| 0:-3| -3:0| 0:3# 2:0, 0:-2, -2:0, 0:2# 1:0, 0:-1, -1:0, 0:1",
     "valid", True, "OK"),
    ("0:0 ## 2:0, 0:-2, -2:0, 0:2", "valid", False, OVERLAP),
    ("# 0:-1, 0:1 # 2:0, 0:-2, -2:0, 0:2", "valid", False, OVERLAP),
    ("## 2:0, 0:-2, -2:0, 0:2 | 1:0, 0:-1, -1:0, 0:1",
     "valid", False, OVERLAP),
    ("# 0:-3, 0:1 # 2:0, 0:-2, -2:0, 0:2", "valid", False, OVERLAP),
    ("# 0:-1, 0:3 # 2:0, 0:-2, -2:0, 0:2", "valid", False, OVERLAP),
    ("# 0:-1, 0:1 | 1:0, -1:0 #", "valid", True, "OK"),
    # S2ValidTest.DegenerateRingsAllowed (test.cc:742-748)
    ("## 0:0", "valid", True, "OK"),
    ("## 0:0, 1:1", "valid", True, "OK"),
    # SplitInteriorsOk (test.cc:750-756 and 878-884: both classes)
    ("## 3:0, 0:-3, -3:0, 0:+3; 3:0, 0:+1, -3:0, 0:-1", "both", True, "OK"),
    # PolylineEdgesCrossSemanticsOk (test.cc:758-792)
    ("# 0:0, 1:1, 0:2, 1:3, 0:4 | 1:0, 0:1, 1:2, 0:3, 1:4 #",
     "valid", True, "OK"),
    ("# 0:0, 1:1, 2:2, 1:3, 0:4, 1:5, 2:6, 1:7, 0:8"
     "| 2:0, 1:1, 0:2, 1:3, 2:4, 1:5, 0:6, 1:7, 2:8 #", "valid", True, "OK"),
    ("# 0:0, 1:1, 0:2, 1:3, 0:4, 1:4, 0:3, 1:2, 0:1, 1:0 #",
     "valid", True, "OK"),
    ("# 0:0, 1:1, 2:2, 1:3, 0:4, 1:5, 2:6, 1:7, 0:8,"
     "  2:0, 1:1, 0:2, 1:3, 2:4, 1:5, 0:6, 1:7, 2:8 #", "valid", True, "OK"),
    ("# 2:1, 1:0, 0:1, 1:2, 2:1 #", "valid", True, "OK"),
    ("# 0:0, 1:1, 0:2| 1:3, 0:4, 1:5 #", "valid", True, "OK"),
    # ReverseDuplicateOnCenterWorks (test.cc:794-799)
    ("## 2:0, 0:-2, -2:0, 0:2; 0:0, 1:1", "valid", True, "OK"),
    # S2LegacyValidTest (test.cc:868-908)
    ("3:0| 0:-3| -3:0| 0:3# 2:0, 0:-2, -2:0, 0:2# 1:0, 0:-1, -1:0, 0:1",
     "legacy", False, "INVALID_DIMENSION"),
    ("## 2:0, 0:-2, -2:0, -1:1, 0:-2, 1:1",
     "legacy", False, "DUPLICATE_VERTICES"),
    ("## 2:0, 2:0, 0:-2, -2:0, 0:-2", "legacy", False, "DUPLICATE_VERTICES"),
    ("# 0:0, 0:0, 1:1, 2:2 #", "legacy", False, "DUPLICATE_VERTICES"),
    ("## 0:0", "legacy", False, "LOOP_NOT_ENOUGH_VERTICES"),
    ("## 0:0, 1:1", "legacy", False, "LOOP_NOT_ENOUGH_VERTICES"),
]


def _modes(app):
    return {"both": [False, True], "valid": [False], "legacy": [True]}[app]


@pytest.mark.parametrize("geom,app,exp_ok,exp_code", TEXT_CASES)
def test_textual_fixture(geom, app, exp_ok, exp_code):
    for legacy in _modes(app):
        ok, code = V.valid_query(V.parse_index(geom), legacy=legacy)
        assert ok == exp_ok, (legacy, geom, code)
        if exp_ok:
            assert code == "OK"
        elif exp_code is not None:
            assert code == exp_code, (legacy, geom, code)


# ---------------------------------------------------------------------------
# shape-level fixtures (non-textual)

def _center(token):
    cid = int(cellid.from_token([token])[0])
    v = np.asarray(Cell(cid).get_center(), dtype=np.float64)
    return v / np.linalg.norm(v)


def test_antipodal_edge_fails():
    # AntipodalEdgeFails (test.cc:458-467): exact opposite-sign points.
    s = 1 / math.sqrt(2)
    loop = [(s, s, 0), (0, 1, 0), (-1, 0, 0), (1, 0, 0)]
    for legacy in (False, True):
        ok, code = V.valid_query([V.VShape(2, [loop])], legacy=legacy)
        assert (ok, code) == (False, "ANTIPODAL_VERTICES")


def test_bad_dimension_fails():
    # BadlyDimensionedFails (test.cc:469-472)
    for legacy in (False, True):
        ok, code = V.valid_query([V.VShape(42, [])], legacy=legacy)
        assert (ok, code) == (False, "INVALID_DIMENSION")


def test_not_unit_length_fails():
    loop = [(1, 0, 0), (0, 1.5, 0), (0, 0, 1)]
    for legacy in (False, True):
        ok, code = V.valid_query([V.VShape(2, [loop])], legacy=legacy)
        assert (ok, code) == (False, "NOT_UNIT_LENGTH")


def test_polygon_on_cell_centers():
    # PolygonOnCentersWorks (test.cc:801-820): nested diamonds whose
    # vertices are cell centers straddling the equator/prime meridian.
    loops = [
        [_center(t) for t in ("0ec", "044", "1bc", "114")],
        [_center(t) for t in ("104", "1ac", "054", "0fc")],
    ]
    ok, code = V.valid_query([V.VShape(2, loops)])
    assert (ok, code) == (True, "OK")


def test_degenerate_polygon_on_cell_centers():
    # DegeneratePolygonOnCentersworks (test.cc:822-851)
    loop1 = [_center(t) for t in ("0ec", "044", "1bc", "114", "1bc", "044")]
    ok, code = V.valid_query([V.VShape(2, [loop1])])
    assert (ok, code) == (True, "OK")

    toks = ["1004", "1014", "1044", "1054", "1104", "1114"]
    loop2 = [_center(t) for t in toks]
    loop2 += [_center(toks[i]) for i in range(4, 0, -1)]
    ok, code = V.valid_query([V.VShape(2, [loop2])])
    assert (ok, code) == (True, "OK")


def _quilt():
    # MakeQuilt (test.cc:168-203): diamond rings pole to pole, every
    # vertex shared by >= 2 chains; reverse-duplicate edges at the poles.
    def grid_point(x, y):
        x %= 24
        if y == 0:
            return np.array([0.0, 0.0, -1.0])
        if y == 12:
            return np.array([0.0, 0.0, 1.0])
        lat = math.radians(-90 + 15 * y)
        lng = math.radians(-180 + 15 * x)
        p = np.array([math.cos(lat) * math.cos(lng),
                      math.cos(lat) * math.sin(lng), math.sin(lat)])
        return p / np.linalg.norm(p)

    loops = []
    for x in range(0, 24, 2):
        for y in range(0, 12, 2):
            loops.append([grid_point(x, y + 1), grid_point(x + 1, y + 2),
                          grid_point(x + 2, y + 1), grid_point(x + 1, y)])
    return loops


def test_quilt():
    # QuiltIsValid (test.cc:740) / QuiltIsNotValid (test.cc:863-866)
    shapes = [V.VShape(2, _quilt())]
    assert V.valid_query(shapes) == (True, "OK")
    ok, code = V.valid_query(shapes, legacy=True)
    assert (ok, code) == (False, OVERLAP)


def _regular(lat_deg, lng_deg, radius_deg, n):
    lat, lng = math.radians(lat_deg), math.radians(lng_deg)
    z = np.array([math.cos(lat) * math.cos(lng),
                  math.cos(lat) * math.sin(lng), math.sin(lat)])
    x = np.cross([0.0, 0.0, 1.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    r = math.radians(radius_deg)
    pts = []
    for k in range(n):
        a = 2 * math.pi * k / n
        p = math.cos(r) * z + math.sin(r) * (math.cos(a) * x + math.sin(a) * y)
        pts.append(p / np.linalg.norm(p))
    return pts


def test_loops_crossing():
    # LoopsCrossing (test.cc:572-606), deterministic variant: concentric
    # regular loops with a vertex pair swapped must be invalid under both
    # classes; the unswapped control must be valid.
    rng = random.Random(1234)
    for it in range(20):
        lat, lng = rng.uniform(-60, 60), rng.uniform(-180, 180)
        n = 4 + rng.randrange(10)
        l0 = _regular(lat, lng, 80.0, n)
        l1 = _regular(lat, lng, 8.0, n)
        control = [V.VShape(2, [list(l0), list(reversed(l1))])]
        assert V.valid_query(control) == (True, "OK"), it
        i = rng.randrange(n)
        l0[i], l1[i] = l1[i], l0[i]
        if rng.random() < 0.5:
            # force the crossings onto vertices rather than edges
            l0[(i + 1) % n] = l1[(i + 1) % n]
            l0[(i - 1) % n] = l1[(i - 1) % n]
        shapes = [V.VShape(2, [l0, list(reversed(l1))])]
        for legacy in (False, True):
            ok, _ = V.valid_query(shapes, legacy=legacy)
            assert not ok, (it, legacy)


def test_degenerate_edges_in_polygon_chains_are_allowed():
    """ADVICE r4: {A,A} degenerate edges are allowed by S2ValidQuery
    (s2validation_query.h:212); chain prev ids must skip them so the
    wedge scan still finds the matching incoming edge at vertices with
    more than two incident edges."""
    fx = V.parse_index('## 0:0, 0:0, 0:2, 2:2; 0:0, 0:-2, -2:0')
    assert V.valid_query(fx) == (True, "OK")
    # same geometry without the degenerate edge: still valid
    fx2 = V.parse_index('## 0:0, 0:2, 2:2; 0:0, 0:-2, -2:0')
    assert V.valid_query(fx2) == (True, "OK")
    # degenerate edge at a vertex whose wedges DO interleave: invalid
    bad = V.parse_index('## 0:0, 0:0, 0:2, 2:0; 0:0, 2:2, 0:-2')
    ok, _ = V.valid_query(bad)
    assert not ok
