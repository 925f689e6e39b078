"""Projections + tessellation: round trips and dense-sampling error
bounds (s2edge_tessellator semantics)."""

import math

import numpy as np

from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.projections import (Mercator, PlateCarree,
                                         tessellate_projected,
                                         tessellate_unprojected)


def _rand_points(n, seed=3):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3))
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def test_projection_round_trips():
    pts = _rand_points(500)
    for proj in (PlateCarree(), Mercator(), PlateCarree(180.0)):
        back = proj.unproject(proj.project(pts))
        assert np.abs(back - pts).max() < 1e-12


def test_mercator_known_values():
    """y(85.05112878 deg) == pi at max_x = pi (the web-mercator square
    corner)."""
    m = Mercator()
    lat = math.radians(85.05112877980659)
    p = np.array([[math.cos(lat), 0.0, math.sin(lat)]])
    xy = m.project(p)
    assert abs(xy[0, 1] - math.pi) < 1e-9


def test_tessellation_error_bounds():
    """Dense sampling: geodesic and projected chain stay within
    tolerance of each other, both directions."""
    tol = 1e-3
    a = parse_vertices("10:-20")[0]
    b = parse_vertices("35:60")[0]
    for proj in (PlateCarree(), Mercator()):
        chain = tessellate_projected(a, b, proj, tol)
        assert len(chain) >= 3  # a long edge must subdivide
        # sample the geodesic; distance to the unprojected chain must
        # stay within ~tol
        t = np.linspace(0, 1, 500)
        ang = math.acos(np.clip(np.dot(a, b), -1, 1))
        pts = (np.sin((1 - t)[:, None] * ang) * a
               + np.sin(t[:, None] * ang) * b) / math.sin(ang)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        verts = proj.unproject(chain)
        from s2spark.kernels import edges as ek
        va = verts[:-1]
        vb = verts[1:]
        for p in pts:
            pp = np.broadcast_to(p, va.shape)
            d2 = float(ek.point_segment_chord2(pp, va, vb).min())
            d = 2 * math.asin(0.5 * math.sqrt(d2))
            assert d <= 2.5 * tol, d  # bisection guarantees ~tol at
            # midpoints; 2.5x covers off-midpoint positions


def test_unprojected_round_trip_chain():
    tol = 1e-3
    proj = Mercator()
    xa = np.array([-2.0, 0.3])
    xb = np.array([2.5, 1.1])
    chain = tessellate_unprojected(xa, xb, proj, tol)
    assert len(chain) >= 3
    assert np.abs(np.linalg.norm(chain, axis=1) - 1).max() < 1e-12
    # endpoints map back to the planar endpoints
    assert np.abs(proj.project(chain[:1])[0] - xa).max() < 1e-12
    assert np.abs(proj.project(chain[-1:])[0] - xb).max() < 1e-12


def test_project_and_tessellate_operators(spark):
    import pandas as pd
    from s2spark.ops import project as pops
    v = parse_vertices("0:0, 20:40, 10:90, -15:120")
    pdf = pd.DataFrame({"user_id": [1] * 4, "ts": range(4),
                        "x": v[:, 0], "y": v[:, 1], "z": v[:, 2]})
    df = spark.createDataFrame(pdf)
    proj = Mercator()
    got = pops.project_points(df, proj).select("px", "py").toPandas()
    want = proj.project(v)
    assert np.abs(got.to_numpy() - want).max() < 1e-15
    segs = pops.tessellate_track(df, "user_id", ["ts"], proj,
                                 1e-3).collect()
    assert len(segs) == 3
    for r in segs:
        k = r["seg"]
        chain = np.stack([np.array(r["xs"]), np.array(r["ys"])], axis=1)
        want_chain = tessellate_projected(v[k], v[k + 1], proj, 1e-3)
        assert np.abs(chain - want_chain).max() < 1e-15


class TestAlternativeSTUVProjections:
    """s2coords.h:285-320 LINEAR/TAN projection variants: endpoint
    and center fixed points, round-trip accuracy, monotonicity."""

    def test_endpoints_and_center(self):
        import numpy as np

        from s2spark.kernels import coords
        for f, g in ((coords.st_to_uv_linear, coords.uv_to_st_linear),
                     (coords.st_to_uv_tan, coords.uv_to_st_tan)):
            assert f(np.array([0.5]))[0] == 0.0
            assert abs(f(np.array([0.0]))[0] + 1.0) < 1e-15
            assert abs(f(np.array([1.0]))[0] - 1.0) < 1e-15
            assert g(np.array([0.0]))[0] == 0.5

    def test_round_trips(self):
        import numpy as np

        from s2spark.kernels import coords
        s = np.linspace(0.0, 1.0, 20001)
        for f, g, tol in (
                (coords.st_to_uv_linear, coords.uv_to_st_linear, 1e-15),
                (coords.st_to_uv_tan, coords.uv_to_st_tan, 1e-14)):
            u = f(s)
            assert np.all(np.diff(u) > 0)          # monotone
            assert np.all(np.abs(g(u) - s) <= tol)  # round-trip
            # uv in [-1, 1] with tight endpoints
            assert u[0] >= -1.0 - 1e-15 and u[-1] <= 1.0 + 1e-15

    def test_tan_one_is_exact_after_nudge(self):
        import numpy as np

        from s2spark.kernels import coords
        # the 2^-53 correction makes STtoUV(1) land on exactly 1.0
        assert coords.st_to_uv_tan(np.array([1.0]))[0] == 1.0
        assert coords.st_to_uv_tan(np.array([0.0]))[0] == -1.0
