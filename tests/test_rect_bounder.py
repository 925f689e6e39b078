"""RectBounder vs dense-sampling oracles + the reference's published
rect expectations (s2loop_test.cc:271-273, candy cane)."""

import math

import numpy as np

from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.rect_bounder import RectBounder, loop_rect_bound


def _latlng(p):
    return (math.atan2(p[2], math.hypot(p[0], p[1])),
            math.atan2(p[1], p[0]))


def test_candy_cane_bound_matches_reference_expectations():
    v = parse_vertices("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
    r = loop_rect_bound(v)
    assert r.lng.is_full()
    assert math.degrees(r.lat.lo) < -20
    assert math.degrees(r.lat.hi) > 10


def test_edge_interior_latitude_extremum():
    """An east-west edge at lat 45 bulges poleward between its
    endpoints; endpoint-only bounds miss the bulge."""
    v = parse_vertices("45:-90, 45:90")
    rb = RectBounder()
    rb.add_point(v[0])
    rb.add_point(v[1])
    r = rb.get_bound()
    # this edge passes through the north pole region? no — through
    # lat 90? the great circle through (45,-90) and (45,90) passes
    # over the pole; max latitude is 90 degrees
    assert math.degrees(r.lat.hi) >= 89.999
    assert math.degrees(r.lat.lo) <= 45.001


def test_dense_sampling_containment():
    """Every point along random edges must fall inside the bound."""
    rng = np.random.default_rng(9)
    t = np.linspace(0, 1, 400)
    for _ in range(50):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        b0 = a + rng.uniform(0.01, 1.5) * rng.normal(size=3)
        b = b0 / np.linalg.norm(b0)
        rb = RectBounder()
        rb.add_point(a)
        rb.add_point(b)
        r = rb.get_bound()
        ang = math.acos(np.clip(np.dot(a, b), -1, 1))
        if ang < 1e-9:
            continue
        pts = (np.sin((1 - t)[:, None] * ang) * a
               + np.sin(t[:, None] * ang) * b) / math.sin(ang)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        def lng_ok(lng):
            # sampled points are slerp reconstructions, not the exact
            # inputs — allow ~1e-9 of reconstruction rounding (the
            # bound itself needs no lng expansion for exact inputs,
            # per the reference's correct-rounding argument)
            if r.lng.is_full() or r.lng.contains(lng):
                return True
            for eps in (1e-9, -1e-9):
                if r.lng.contains(math.remainder(lng + eps,
                                                 2 * math.pi)):
                    return True
            return False

        for p in pts:
            lat, lng = _latlng(p)
            assert r.lat.lo - 1e-9 <= lat <= r.lat.hi + 1e-9
            assert lng_ok(lng)


def test_tighter_than_cap_bound_for_skinny_loop():
    """The rect bound of a skinny east-west loop is far tighter (in
    area proxy) than the cap-through-vertices bound."""
    from s2spark.kernels.loops import Loop
    v = parse_vertices("0:0, 0:60, 1:60, 1:0")
    r = loop_rect_bound(v)
    # rect spans ~1 degree of latitude...
    lat_span = r.lat.hi - r.lat.lo
    assert lat_span < math.radians(2.0)
    # ...while the cap bound's radius must cover the 60-degree length
    loop = Loop(v)
    centroid = v.mean(axis=0)
    centroid /= np.linalg.norm(centroid)
    cap_chord2 = ((v - centroid) ** 2).sum(axis=1).max()
    cap_radius = 2 * math.asin(0.5 * math.sqrt(cap_chord2))
    assert cap_radius > math.radians(25.0)
